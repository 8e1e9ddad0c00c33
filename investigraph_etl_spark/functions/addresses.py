"""Address formatting (SURVEY.md §2.8 F11).

Reference parity: ``format_address`` assembles a one-line postal
address whose part ordering depends on the country, and ``make_address``
derives a deterministic Address entity from it
(/root/reference/investigraph/helpers/addresses.py:13-69, 72-175 — the
reference's only heavy scalar helper, lru_cached per call).

Spark translation: the template dispatch is compiled into the plan as
a ``CASE`` over the country column and the assembly is ``concat_ws``
over null-normalized parts — whole-stage codegen, no Python, no cache
needed (the "memoization" is that the expression is evaluated once per
row in the JVM).  Per-country templates are public-knowledge postal
conventions, not the reference's table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from investigraph_etl_spark.functions.ids import slugify


def _part(col: Column | None) -> Column:
    """strip; ''→null (concat_ws then skips it)."""
    if col is None:
        return F.lit(None).cast("string")
    return F.nullif(F.regexp_replace(col.cast("string"), r"^\s+|\s+$", ""), F.lit(""))


# countries where the locality precedes the postal code ("City 12345" /
# "street, city, ST 12345" anglophone convention); everywhere else the
# continental "12345 City" order is used.
_CITY_FIRST = ["us", "ca", "gb", "au", "nz", "ie", "in", "za"]


def format_address(
    *,
    street: Column | None = None,
    postal_code: Column | None = None,
    city: Column | None = None,
    country: Column | None = None,
    summary: Column | None = None,
) -> Column:
    """One-line address, country-templated part order, null-safe.

    ``summary`` (a free-form first line) wins the leading slot when
    present, matching the reference's summary-first behavior.  Missing
    parts drop out without separator debris (``concat_ws`` skips
    nulls — same semantics as the reference's join-non-empty).
    """
    street_p, postal_p, city_p = _part(street), _part(postal_code), _part(city)
    country_p = _part(country)
    city_first = F.concat_ws(" ", city_p, postal_p)
    postal_first = F.concat_ws(" ", postal_p, city_p)
    locality = F.nullif(
        F.when(F.lower(country_p).isin(_CITY_FIRST), city_first).otherwise(
            postal_first
        ),
        F.lit(""),
    )
    return F.nullif(
        F.concat_ws(
            ", ",
            _part(summary),
            street_p,
            locality,
            F.upper(country_p),
        ),
        F.lit(""),
    )


def make_address_row(
    *,
    street: Column | None = None,
    postal_code: Column | None = None,
    city: Column | None = None,
    country: Column | None = None,
    summary: Column | None = None,
    dataset: str = "default",
) -> Column:
    """Address entity struct ``(id, schema, full, country)`` — the
    ``make_address`` analog: deterministic id from the slugged full
    line (the reference keys Addresses on normalized full text)."""
    full = format_address(
        street=street,
        postal_code=postal_code,
        city=city,
        country=country,
        summary=summary,
    )
    addr_id = F.concat_ws(
        "-", F.lit("addr"), F.sha1(F.concat_ws("|", F.lit(dataset), slugify(full)))
    )
    return F.when(
        full.isNotNull(),
        F.struct(
            addr_id.alias("id"),
            F.lit("Address").alias("schema"),
            full.alias("full"),
            F.lower(_part(country)).alias("country"),
        ),
    )
