"""Per-record normalization, vectorized (SURVEY.md §2.8 F5/F7, P10).

Reference semantics being preserved:
* ``str_or_none`` — strip, empty→null
  (/root/reference/investigraph/util.py:72-76)
* NaN→None at extract (/root/reference/investigraph/logic/extract.py:25)
* value cleaning happens *on ingest*, before merge
  (/root/reference/investigraph/util.py:41-43)

Two implementations with identical semantics:
* native Spark SQL expressions (JVM-side, whole-stage codegen — the
  default hot path; strictly faster than any Python crossing), and
* an Arrow-vectorized ``pandas_udf`` path (``use_arrow_udf=True``) for
  normalizations that genuinely need Python (none of the core ones do;
  it exists to host future tokenizer-adjacent logic and to prove the
  batch plumbing).  Never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType


def clean_str(col: Column) -> Column:
    """strip all leading/trailing whitespace + lower, ''→null —
    ``str_or_none`` + casefold (Spark's ``trim`` only strips U+0020,
    so use a regexp to match Python ``str.strip`` semantics)."""
    stripped = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.nullif(F.lower(stripped), F.lit(""))


@F.pandas_udf(StringType())
def clean_str_arrow(s: pd.Series) -> pd.Series:
    """Arrow-batched twin of :func:`clean_str` (Series→Series)."""
    out = s.astype("string").str.strip().str.lower()
    return out.mask(out == "", None)


@F.pandas_udf(IntegerType())
def _len_arrow(tokens: pd.Series) -> pd.Series:
    return pd.array(
        [None if t is None else len(t) for t in tokens], dtype="Int32"
    )


def normalize_events(events: DataFrame, *, use_arrow_udf: bool = False) -> DataFrame:
    """Normalize a change-event DataFrame in place:

    * ``source`` cleaned (trim/lower/null-if-empty)
    * ``n_tok`` recomputed as ``size(tokens)`` — the producer's value is
      untrusted (the generator deliberately corrupts some)
    * delete events keep null payload

    Narrow (no shuffle); stays inside whole-stage codegen on the
    default path.
    """
    if use_arrow_udf:
        src = clean_str_arrow(F.col("source"))
        ntok = _len_arrow(F.col("tokens"))
    else:
        src = clean_str(F.col("source"))
        ntok = F.when(
            F.col("tokens").isNotNull(), F.size(F.col("tokens"))
        ).cast("int")
    return events.withColumns({"source": src, "n_tok": ntok})
