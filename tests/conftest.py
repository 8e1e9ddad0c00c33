from __future__ import annotations

import pandas as pd
import pytest

from investigraph_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small core count for test latency; correctness is core-count-invariant
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


def _norm(v):
    if v is None or v is pd.NA:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return [int(x) for x in v]
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def assert_pdf_equal(left: pd.DataFrame, right: pd.DataFrame, key: str = "doc_id"):
    """Order-insensitive frame equality tolerant of NA/NaN/list dtypes."""
    assert sorted(left.columns) == sorted(right.columns), (
        f"columns differ: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    l = left[cols].sort_values(key).reset_index(drop=True)
    r = right[cols].sort_values(key).reset_index(drop=True)
    assert len(l) == len(r), f"row counts differ: {len(l)} vs {len(r)}"
    for c in cols:
        lv = [_norm(v) for v in l[c]]
        rv = [_norm(v) for v in r[c]]
        assert lv == rv, f"column {c} differs; first diff: " + str(
            next(((a, b) for a, b in zip(lv, rv) if a != b), None)
        )
