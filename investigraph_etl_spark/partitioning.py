"""Partitioning helpers shared by operators.

The one scale trap local testing hides: a small parquet file arrives as
ONE scan split, so a per-row-heavy operator (shingling, simhash folds,
embedding matmuls) runs on one core of 32.  At 100 TB the scan has ~1e6
splits and none of this matters — so the helper is a conditional: widen
only when the input is narrower than the session's parallelism.

The reference has no analog (single-process by design; its answer to
parallelism is GNU parallel over unix pipes,
/root/reference/docs/run/parallelization.md:13-26).  Here the exchange
is a real shuffle, so it is only worth paying when downstream per-row
compute dominates — which is exactly the operators that call this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff it currently has fewer partitions.

    Call this on *scan outputs* (or other shuffle-free plans) feeding
    compute-heavy narrow operators.  ``df.rdd`` on a scan-only plan
    just builds lineage — no job runs (avoid calling this on post-AQE
    shuffle plans, where materializing the RDD can trigger stages).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
