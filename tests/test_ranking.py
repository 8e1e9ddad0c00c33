"""Grouped top-k: correctness vs a pandas oracle, partition
invariance (total-order tiebreak), and plan shape (no global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.ranking import top_k_per_group


@pytest.fixture(scope="module")
def scored(spark):
    # value collides across rows on purpose — the tiebreak column must
    # decide, not partition luck
    return spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") % 13).alias("value"),
        F.col("id").alias("row_id"),
    )


def _oracle(df, k):
    pdf = df.toPandas().sort_values(
        ["grp", "value", "row_id"], ascending=[True, False, True]
    )
    return {
        (r.grp, r.row_id)
        for r in pdf.groupby("grp").head(k).itertuples(index=False)
    }


def test_top_k_matches_pandas_oracle(spark, scored):
    got = top_k_per_group(
        scored, ["grp"], [F.col("value").desc(), F.col("row_id").asc()], 3
    )
    assert {(r["grp"], r["row_id"]) for r in got.collect()} == _oracle(scored, 3)
    assert set(got.columns) == {"grp", "value", "row_id", "rk"}


def test_top_k_partition_invariant(spark, scored):
    order = [F.col("value").desc(), F.col("row_id").asc()]
    a = top_k_per_group(scored, ["grp"], order, 2)
    b = top_k_per_group(scored.repartition(17), ["grp"], order, 2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_top_k_rank_is_dense_from_one(spark, scored):
    got = top_k_per_group(
        scored, ["grp"], [F.col("value").desc(), F.col("row_id").asc()], 4
    ).toPandas()
    for _, g in got.groupby("grp"):
        assert sorted(g["rk"]) == list(range(1, len(g) + 1))


def test_top_k_plan_has_no_global_sort(spark, scored):
    plan = top_k_per_group(
        scored, ["grp"], [F.col("value").desc(), F.col("row_id").asc()], 3
    )._jdf.queryExecution().executedPlan().toString()
    # window sort must be intra-partition (Sort [..], false) — a global
    # sort (Sort [..], true) would mean a range-exchange over the data
    assert "Sort" in plan and ", true," not in plan
