"""Top-k per group — the §2.6 sort/limit/top-k shape as one operator.

Reference analog: the reference exposes sorted/limited exports rather
than a grouped top-k (SURVEY.md §2.6: limit via CLI ``-l``,
deterministic ID ordering); grouped top-k is the engine-native
generalization a corpus pipeline actually uses (longest docs per
source, best-scored candidates per query, newest version per key).

Spark shape: ONE shuffle on the group keys, then an in-partition sort
feeding ``row_number`` — no global sort, no driver collect.  For very
hot groups (one group ≫ one executor's partition), compose with a
pre-aggregation instead: per-partition local top-k (groupBy spark
partition id + keys, sort_array(slice(...))) then the same window over
the ~k × parts survivors — that is exactly the two-phase pattern
``operators/similarity.brute_force_knn`` uses for its global rank; it
is not duplicated here because grouped cardinalities in this engine
(sources, languages, buckets) are bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    *,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the first ``k`` rows of each group under ``order_cols``.

    ``order_cols`` must yield a TOTAL order within each group (include
    a unique tiebreak column) or the selected rows are nondeterministic
    across runs/partitionings — the same discipline the deterministic-ID
    functions enforce (SURVEY.md O2).  ``rank_col`` (1-based) is kept
    in the output so callers can distinguish rank-1 picks.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
