"""Date normalization (SURVEY.md §2.8 F9).

The reference stores dates as strings and leans on ``dateparser`` in
custom handlers (tests/fixtures/ec_meetings/transform.py:93,104 adds a
raw date string; FtM cleans to ISO on add).  Spark translation: a
coalesce over ``try_to_timestamp`` patterns — JVM-side, null-safe, no
Python.  Extend ``_PATTERNS`` for new source formats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PATTERNS = [
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "dd.MM.yyyy",
    "dd/MM/yyyy",
    "MM/dd/yyyy",
    "yyyyMMdd",
    "dd MMMM yyyy",
    "MMMM dd, yyyy",
]


def clean_date(col: Column) -> Column:
    """Best-effort parse → ISO ``yyyy-MM-dd`` string; unparseable → null."""
    s = F.regexp_replace(col.cast("string"), r"^\s+|\s+$", "")
    ts = F.coalesce(*[F.try_to_timestamp(s, F.lit(p)) for p in _PATTERNS])
    return F.date_format(ts, "yyyy-MM-dd")


def clean_datetime(col: Column) -> Column:
    """Best-effort parse → ISO ``yyyy-MM-dd HH:mm:ss``; null if unparseable."""
    s = F.regexp_replace(col.cast("string"), r"^\s+|\s+$", "")
    ts = F.coalesce(*[F.try_to_timestamp(s, F.lit(p)) for p in _PATTERNS])
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
