"""Text/scalar helpers (SURVEY.md §2.8 F5-F10, F14).

Column-expression re-expressions of the reference's per-row Python
helpers (/root/reference/investigraph/util.py:70-80 ``str_or_none`` /
``join_text``; /root/reference/tests/fixtures/ec_meetings/transform.py:41-53
``zip_things``).  Native exprs — whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def str_or_none(col: Column) -> Column:
    """strip; empty→null (util.py:72-76).  Unlike ``clean_str`` this
    does NOT lowercase."""
    return F.nullif(F.regexp_replace(col.cast("string"), r"^\s+|\s+$", ""), F.lit(""))


def clean_name(col: Column) -> Column:
    """whitespace squash + strip (ftmq ``clean_name`` re-export,
    util.py:13-19)."""
    return str_or_none(F.regexp_replace(col.cast("string"), r"\s+", " "))


def join_text(*cols: Column, sep: str = " ") -> Column:
    """clean each part, join non-empty with sep (util.py:79-80;
    ``concat_ws`` skips nulls — same semantics, tested against
    reference behavior in tests/test_functions.py)."""
    return F.nullif(F.concat_ws(sep, *[clean_name(c) for c in cols]), F.lit(""))


def clean_url(col: Column) -> Column:
    """Minimal FtM-url-type normalization (cleaning happens on
    ``entity.add``, SURVEY.md §1.2): strip whitespace, drop a dangling
    empty '?'/'#', and give bare-host URLs the canonical '/' path
    (urlsplit round-trip behavior)."""
    stripped = F.regexp_replace(str_or_none(col), r"[?#]$", "")
    return F.when(
        stripped.rlike(r"^https?://[^/?#]+$"), F.concat(stripped, F.lit("/"))
    ).otherwise(stripped)


def split_clean(col: Column, sep: str = ",") -> Column:
    """split + strip each element (the ``[t.strip() for t in
    things.split(",")]`` idiom, transform.py:42-43)."""
    return F.transform(
        F.split(col.cast("string"), sep),
        lambda t: F.regexp_replace(t, r"^\s+|\s+$", ""),
    )


def zip_things(c1: Column, c2: Column, sep: str = ",") -> Column:
    """Pairwise zip of two delimited list columns with the reference's
    arity fallback (transform.py:41-53): equal lengths → element pairs;
    right side a single value → one (whole_left, whole_right) pair;
    otherwise → empty (the reference silently drops, scream=False).

    Returns ``array<struct<left:string, right:string>>`` — explode to
    get the reference's generator-of-tuples shape.
    """
    t1, t2 = split_clean(c1, sep), split_clean(c2, sep)
    zipped = F.arrays_zip(t1.alias("left"), t2.alias("right"))
    single = F.array(
        F.struct(
            str_or_none(c1).alias("left"),
            str_or_none(c2).alias("right"),
        )
    )
    empty = F.array().cast("array<struct<left:string,right:string>>")
    return (
        F.when(F.size(t1) == F.size(t2), zipped.cast("array<struct<left:string,right:string>>"))
        .when(F.size(t2) == 1, single)
        .otherwise(empty)
    )
