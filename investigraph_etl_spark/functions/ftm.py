"""FollowTheMoney schema-name vocabulary + validation (SURVEY.md §1.1).

The reference validates every mapped entity's ``schema`` against the
FtM model (/root/reference/investigraph/model/mapping.py:32 via
``followthemoney.model``; ``investigraph/util.py:38-40``) so a typo'd
schema fails at config-parse time instead of flowing silently into the
statement store.  The ``followthemoney`` package does not ship in this
sandbox, so the public schema vocabulary (followthemoney/schema/*.yaml
upstream — stable, versioned, public) is embedded as a frozen set.

``validate_schema`` is called by ``EntityMapping`` at mapping-compile
time; pass ``extra`` for bespoke vocabularies or ``strict=False`` to
log-and-continue (matching ftmq's lenient mode).
"""

from __future__ import annotations

FTM_SCHEMATA: frozenset[str] = frozenset(
    {
        "Address",
        "Airplane",
        "Analyzable",
        "Article",
        "Assessment",
        "Asset",
        "Associate",
        "Audio",
        "BankAccount",
        "Call",
        "CallForTenders",
        "Company",
        "Contract",
        "ContractAward",
        "CourtCase",
        "CourtCaseParty",
        "CryptoWallet",
        "Debt",
        "Directorship",
        "Document",
        "Documentation",
        "EconomicActivity",
        "Email",
        "Employment",
        "Event",
        "Family",
        "Folder",
        "HyperText",
        "Identification",
        "Image",
        "Interest",
        "Interval",
        "LegalEntity",
        "License",
        "Membership",
        "Mention",
        "Message",
        "Note",
        "Occupancy",
        "Organization",
        "Ownership",
        "Package",
        "Page",
        "Pages",
        "Passport",
        "Payment",
        "Person",
        "PlainText",
        "Position",
        "Project",
        "ProjectParticipant",
        "PublicBody",
        "RealEstate",
        "Representation",
        "Sanction",
        "Security",
        "Similar",
        "Succession",
        "Table",
        "TaxRoll",
        "Thing",
        "Trip",
        "UnknownLink",
        "UserAccount",
        "Vehicle",
        "Vessel",
        "Video",
        "Workbook",
    }
)


class UnknownSchemaError(ValueError):
    pass


def validate_schema(
    name: str, *, extra: set[str] | None = None, strict: bool = True
) -> str:
    """Return ``name`` if it is a known FtM schema, else raise (or
    pass through when ``strict=False``)."""
    vocab = FTM_SCHEMATA | (extra or set())
    if name in vocab:
        return name
    if strict:
        raise UnknownSchemaError(
            f"unknown FtM schema {name!r} — known: one of "
            f"{len(vocab)} names (e.g. Person, Organization, PublicBody); "
            "pass extra={...} for custom vocabularies"
        )
    return name
