"""Range (point-in-interval) join — an operator Spark lacks natively.

``left.ts ∈ [right.start, right.end)`` joins (attribution windows,
validity intervals, maintenance windows) compile to a
BroadcastNestedLoopJoin or a full cartesian-per-key sort-merge under
plain Catalyst — O(n·m) comparisons regardless of how selective the
interval containment is.

The distributed formulation here is **bucketized equi-join**: pick a
bucket width ``W`` (seconds); each interval is exploded into the
coarse buckets it covers (``⌈len/W⌉ + 1`` rows — bounded when
interval lengths are bounded), each point is tagged with its single
bucket, and the join becomes an equi-join on ``(keys…, bucket)``
followed by the exact containment filter.  Cost: ONE shuffle on the
bucketed key, pair blowup limited to per-bucket density — the same
strategy Databricks' range-join optimization ("bin join") and
PostGIS-style grid joins use.

Choosing ``W``: near the typical interval length is optimal (each
interval explodes to ~2 rows, each bucket sees only locally relevant
intervals).  Too small → interval explosion rows; too big → bucket
join degenerates toward per-key cartesian.  The knob is explicit
because the right value is a data property; auto-estimation would
cost a stats pass over the intervals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _axis(df: DataFrame, col: str) -> Column:
    """Column as a double join axis: epoch seconds for time types
    (NTZ goes via timestamp — ANSI forbids the direct double cast;
    session TZ is pinned UTC so the value is stable), pass-through
    cast for numerics."""
    t = df.schema[col].dataType
    if isinstance(t, (TimestampType, TimestampNTZType, DateType)):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    start: str,
    end: str,
    by: str | list[str] = (),
    bucket_width: float,
    how: str = "inner",
    point_id: str | None = None,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``start <= on < end`` (and equal ``by`` keys, if given).

    ``on``/``start``/``end`` may be timestamps or numerics — both are
    compared on a double axis.  ``how`` is ``"inner"`` or
    ``"left"`` (points with no containing interval keep nulls;
    requires ``point_id`` naming a unique point key so the unmatched
    set can be recovered with a narrow anti-join — joining back on
    every column would break on unjoinable types like maps).
    Column-name collisions on the interval side are suffixed
    ``_right``.  The exploded bucket count per interval is
    ``⌈(end-start)/W⌉ + 1``; a degenerate ``end <= start`` interval
    yields nothing.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if how == "left" and not point_id:
        raise ValueError("how='left' requires point_id (a unique point key)")
    by_cols = [by] if isinstance(by, str) else list(by)

    p_ts = _axis(points, on)
    i_start = _axis(intervals, start)
    i_end = _axis(intervals, end)
    W = float(bucket_width)
    if W <= 0:
        raise ValueError("bucket_width must be positive")

    carried = {
        c: (c if c not in points.columns else f"{c}_right")
        for c in intervals.columns
        if c not in by_cols
    }
    p = points.withColumn("_bucket", F.floor(p_ts / W))
    i = intervals.filter(i_end > i_start).select(
        *by_cols,
        *[F.col(c).alias(carried[c]) for c in carried],
        i_start.alias("_start_ax"),
        i_end.alias("_end_ax"),
        F.explode(
            F.sequence(
                F.floor(i_start / W),
                # end is exclusive: a bucket is covered only if the
                # interval extends past the bucket's start
                F.floor((i_end - F.lit(1e-9)) / W),
            )
        ).alias("_bucket"),
    )
    cond = (F.col("_start_ax") <= p_ts) & (p_ts < F.col("_end_ax"))
    joined = p.join(i, on=[*by_cols, "_bucket"], how="inner").filter(cond)
    out = joined.drop("_bucket", "_start_ax", "_end_ax")
    if how == "inner":
        return out
    # left: recover unmatched points by id and append with null
    # interval columns (the matched-id set is ≤ points and narrow —
    # broadcast-able in the common case, AQE decides)
    matched_ids = out.select(point_id).distinct()
    unmatched = points.join(matched_ids, on=point_id, how="left_anti")
    for c in carried.values():
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(out.schema[c].dataType)
        )
    return out.unionByName(unmatched.select(out.columns))
