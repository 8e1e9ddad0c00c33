"""Incremental materialized-aggregate maintenance from the lake's
change feed (SURVEY.md §2.4 A3 taken incremental — the Delta CDF
consumer pattern).

A derived table of additive aggregates (counts / sums per group) over
the lake's live state can be kept current WITHOUT rescanning the table:
read the preimage change feed between two snapshots
(``HashLakeTable.read_changes(v, include_preimage=True)``), subtract
every preimage/delete row's contribution, add every
insert/postimage row's, and fold the signed deltas into the old state.
Cost ∝ changes in range + |state|, never table size — at the 10^10-event
design point a per-commit refresh touches thousands of rows where a
recompute scans terabytes.

Group migrations fall out for free: an update whose group column
changed contributes −1 to the old group (preimage row) and +1 to the
new one (postimage row).

Physical shape: ONE hash aggregate over the feed (map-side combine,
fixed-width buffers) + ONE hash aggregate over state ∪ delta — no
joins, no sorts, and null group keys survive because the merge is a
union-then-groupBy, not an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


def aggregate_state(
    df: DataFrame,
    group_cols: list[str],
    *,
    count_col: str = "n_rows",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Bootstrap the derived table from a full snapshot: per group,
    a live-row count plus ``sum_cols`` (alias → source column) sums."""
    sum_cols = sum_cols or {}
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(src).alias(dst) for dst, src in sum_cols.items()],
    )


def apply_feed(
    state: DataFrame | None,
    feed: DataFrame,
    group_cols: list[str],
    *,
    count_col: str = "n_rows",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Fold a PREIMAGE change feed into an aggregate state produced by
    :func:`aggregate_state` (or ``None`` to build from an empty state).
    Groups whose live-row count reaches zero drop out of the result.

    The feed must carry preimages (``read_changes(...,
    include_preimage=True)``): a net feed's plain 'update' rows are not
    invertible — hitting one raises at execution time rather than
    silently double-counting.
    """
    sum_cols = sum_cols or {}
    sign = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_feed needs a preimage feed; got row type "),
                    F.col("_change_type"),
                )
            )
        )
    )
    delta = (
        feed.withColumn("_sign", sign)
        .groupBy(*group_cols)
        .agg(
            F.sum("_sign").alias(count_col),
            *[
                F.sum(F.col(src) * F.col("_sign")).alias(dst)
                for dst, src in sum_cols.items()
            ],
        )
    )
    measures = [count_col, *sum_cols.keys()]
    if state is None:
        merged = delta
    else:
        merged = (
            state.select(*group_cols, *measures)
            .unionByName(delta.select(*group_cols, *measures))
            .groupBy(*group_cols)
            .agg(*[F.sum(m).alias(m) for m in measures])
        )
    return merged.filter(F.col(count_col) > 0)
