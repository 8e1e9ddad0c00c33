"""As-of (point-in-time) join — an operator Spark lacks natively.

Training-data and event-enrichment pipelines constantly need "attach
the most recent dimension/state row at or before each event's
timestamp" (feature snapshots, slowly-changing dims, market data).
Spark has no ASOF JOIN; the naive theta-join (``l.ts >= r.ts`` +
window-rank) explodes into a BroadcastNestedLoop or an O(n·m)
range join.

This is the canonical distributed formulation instead — the
**union-and-carry-forward** trick:

1. tag and union both sides on the shared key/time axis,
2. one window per key ordered by ``(ts, side)`` where right rows sort
   BEFORE left rows at equal timestamps (inclusive semantics),
3. ``last(right_payload, ignorenulls=True)`` carries the most recent
   right row forward onto every left row,
4. filter back to left rows.

Cost: ONE shuffle of (left ∪ right) by key + an in-partition sort —
the same price as a sort-merge join, with no pair blowup regardless
of how many right rows precede a left row.  Skewed keys are handled
by the same salting/AQE story as any single window (the window is
per-key sequential by nature; a key's history must be ordered
*somewhere*).

Semantics = DuckDB ``ASOF JOIN`` with ``l.ts >= r.ts`` (inclusive;
ties take the right row at the same instant), which is exactly what
the driver gate uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (or ``<`` when ``inclusive=False``) within
    the same ``by`` key group.  Left rows with no prior right row keep
    nulls (left-outer as-of).

    ``right_cols`` — right payload columns to carry (default: all
    except ``on``/``by``); carried columns are renamed with
    ``suffix`` unless already unique.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        skip = set(by_cols) | {on}
        right_cols = [c for c in right.columns if c not in skip]

    carried = {
        c: (c if c not in left.columns else f"{c}{suffix}") for c in right_cols
    }

    left_payload = [c for c in left.columns if c not in set(by_cols)]
    # side: right rows order before left rows at equal ts → inclusive;
    # flip the order for strict "<" semantics
    l_side, r_side = (1, 0) if inclusive else (0, 1)

    # The right payload is carried as ONE struct (non-null per right
    # row) so a single last(ignorenulls=True) picks the whole latest
    # right ROW atomically.  Carrying each column separately would
    # back-fill a null field of the latest right row from an OLDER
    # right row — fabricating a row that never existed (diverges from
    # DuckDB ASOF semantics when right payloads contain nulls).
    l_tagged = left.select(
        *by_cols,
        F.col(on).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.struct(*left_payload).alias("_l"),
        F.lit(None)
        .cast(right.select(F.struct(*right_cols).alias("_r")).schema["_r"].dataType)
        .alias("_r"),
    )
    r_tagged = right.select(
        *by_cols,
        F.col(on).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.select(
        *by_cols,
        "_side",
        "_l",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
    ).filter(F.col("_side") == l_side)
    return out.select(
        *by_cols,
        *[F.col(f"_l.{c}").alias(c) for c in left_payload],
        *[F.col(f"_r.{c}").alias(carried[c]) for c in right_cols],
    )
