"""Deterministic ID functions (SURVEY.md §2.8 F1-F3, F12).

Column-expression re-expressions of the reference's ID helpers
(/root/reference/investigraph/model/context.py:193-249 — ``make_slug``,
``make_id``, ``make_fingerprint_id``; checksum at
/root/reference/investigraph/util.py).  All native Spark SQL exprs —
JVM-side, codegen'd, no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slugify(col: Column) -> Column:
    """lowercase, non-alphanumerics → '-', squashed and trimmed."""
    s = F.regexp_replace(F.lower(col.cast("string")), r"[^a-z0-9]+", "-")
    return F.nullif(F.regexp_replace(s, r"^-+|-+$", ""), F.lit(""))


def make_slug(*cols: Column, prefix: str | None = None) -> Column:
    """``join_slug`` semantics: slugify each part, join with '-',
    optional prefix; null if everything is empty."""
    parts = [slugify(c) for c in cols]
    if prefix is not None:
        parts = [F.lit(prefix)] + parts
    return F.nullif(F.concat_ws("-", *parts), F.lit(""))


def make_entity_id(*cols: Column) -> Column:
    """SHA1 over the joined args — ``followthemoney.util.make_entity_id``
    shape (reference delegates to it, context.py:224-229)."""
    return F.sha1(F.concat_ws("|", *[c.cast("string") for c in cols]))


def make_id(*cols: Column, prefix: str) -> Column:
    """prefix-slug + SHA1 content id (context.py:211-229)."""
    return F.concat_ws("-", F.lit(prefix), make_entity_id(*cols))


def fingerprint(col: Column) -> Column:
    """Name fingerprint: lowercase, strip punctuation, sorted distinct
    tokens joined by space (rigour-style; reference
    make_fingerprint_id, context.py:231-249).  Built-in approximation:
    no unicode transliteration table in this sandbox."""
    tokens = F.split(
        F.regexp_replace(F.lower(col.cast("string")), r"[^a-z0-9]+", " "), r"\s+"
    )
    cleaned = F.array_sort(
        F.array_distinct(F.filter(tokens, lambda t: t != F.lit("")))
    )
    return F.nullif(F.array_join(cleaned, " "), F.lit(""))


def make_fingerprint_id(col: Column, prefix: str | None = None) -> Column:
    fid = F.sha1(fingerprint(col))
    if prefix is None:
        return fid
    return F.concat_ws("-", F.lit(prefix), fid)


def make_data_checksum(*cols: Column) -> Column:
    """Stable content checksum of a row slice — cache keys (reference
    make_data_checksum / Source.checksum, model/source.py:42-44)."""
    return F.sha2(F.to_json(F.struct(*cols)), 256)


def slugify_string(value: str) -> str:
    """Driver-side slugify twin (same rules as :func:`slugify`)."""
    import re

    s = re.sub(r"[^a-z0-9]+", "-", str(value).lower()).strip("-")
    return s or ""


def slugified_dict(data: dict) -> dict:
    """Rename dict keys to slug form with ``_`` separators — the
    reference's header-normalization helper
    (/root/reference/investigraph/util.py:25-26: ``slugified_dict``).
    Messy source headers ("Short name ", "URL  name") become stable
    snake_case property references."""
    return {slugify_string(k).replace("-", "_"): v for k, v in data.items()}


def slugify_columns(df, *, separator: str = "_"):
    """DataFrame twin of :func:`slugified_dict`: rename every column to
    its slug (metadata-only — ``withColumnsRenamed`` touches no data).
    Collisions keep the first column's name and suffix later ones."""
    seen: dict[str, int] = {}
    renames: dict[str, str] = {}
    for c in df.columns:
        slug = slugify_string(c).replace("-", separator) or "col"
        n = seen.get(slug, 0)
        seen[slug] = n + 1
        renames[c] = slug if n == 0 else f"{slug}{separator}{n}"
    return df.withColumnsRenamed(renames)
