"""Deterministic hash sampling: reproducibility, subset stability,
stratum fractions, split completeness, salt independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def pop(spark):
    return spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_sample_reproducible_and_partition_invariant(spark, pop):
    a = {r["k"] for r in deterministic_sample(pop, 0.3, key_col="k").collect()}
    b = {
        r["k"]
        for r in deterministic_sample(pop.repartition(13), 0.3, key_col="k").collect()
    }
    assert a == b and 0.25 < len(a) / 4000 < 0.35


def test_lower_fraction_is_subset(spark, pop):
    big = {r["k"] for r in deterministic_sample(pop, 0.5, key_col="k").collect()}
    small = {r["k"] for r in deterministic_sample(pop, 0.2, key_col="k").collect()}
    assert small < big


def test_stratified_fractions_respected(spark, pop):
    got = stratified_sample(
        pop, {"0": 1.0, "1": 0.5, "2": 0.0}, key_col="k", stratum_col="grp",
        default=0.1,
    )
    counts = {r["grp"]: r["n"] for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["0"] == 1000
    assert 400 < counts.get("1", 0) < 600
    assert "2" not in counts
    assert 50 < counts.get("3", 0) < 160


def test_split_partitions_everything_once(spark, pop):
    out = hash_split(pop, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="k")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 4000
    assert counts["train"] > 3000 and counts["val"] > 200 and counts["test"] > 200
    # same key → same split on a re-run over different partitioning
    out2 = hash_split(pop.repartition(9), {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="k")
    m1 = {r["k"]: r["split"] for r in out.collect()}
    m2 = {r["k"]: r["split"] for r in out2.collect()}
    assert m1 == m2


def test_salts_give_independent_draws(spark, pop):
    a = {r["k"] for r in deterministic_sample(pop, 0.5, key_col="k", salt="x").collect()}
    b = {r["k"] for r in deterministic_sample(pop, 0.5, key_col="k", salt="y").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.35 < overlap < 0.65  # ~independent, not identical


def test_bad_inputs_rejected(spark, pop):
    with pytest.raises(ValueError):
        deterministic_sample(pop, 1.5, key_col="k")
    with pytest.raises(ValueError):
        stratified_sample(pop, {"0": -0.1}, key_col="k", stratum_col="grp")
    with pytest.raises(ValueError):
        hash_split(pop, {"a": 0.5, "b": 0.2}, key_col="k")


def test_shuffle_shards_deterministic_and_partition_invariant(spark, pop):
    from investigraph_etl_spark.operators.sampling import shuffle_shards

    a = shuffle_shards(pop, key_col="k", n_shards=8, salt="e1")
    b = shuffle_shards(
        pop.repartition(17), key_col="k", n_shards=8, salt="e1"
    )
    ka = [(r["shard"], r["pos"], r["k"]) for r in a.collect()]
    kb = [(r["shard"], r["pos"], r["k"]) for r in b.collect()]
    assert sorted(ka) == sorted(kb)
    # per shard: pos is exactly 1..count (a total order, no gaps/ties)
    from collections import defaultdict

    by_shard = defaultdict(list)
    for s, p, _ in ka:
        by_shard[s].append(p)
    assert set(by_shard) == set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # hash-uniform shards: no shard more than 2x the mean
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * (sum(sizes) / len(sizes))


def test_shuffle_shards_new_salt_new_order(spark, pop):
    from investigraph_etl_spark.operators.sampling import shuffle_shards

    e1 = {
        r["k"]: (r["shard"], r["pos"])
        for r in shuffle_shards(pop, key_col="k", n_shards=8, salt="e1").collect()
    }
    e2 = {
        r["k"]: (r["shard"], r["pos"])
        for r in shuffle_shards(pop, key_col="k", n_shards=8, salt="e2").collect()
    }
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > 0.9 * len(e1)  # a new epoch is a genuinely new order


def test_shuffle_shards_plan_has_no_global_sort(spark, pop):
    """The scale property: shard-local ranking, never a range exchange
    (a global ORDER BY hash would show rangepartitioning in the plan)."""
    from investigraph_etl_spark.operators.sampling import shuffle_shards

    plan = (
        shuffle_shards(pop, key_col="k", n_shards=8, salt="e1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning" in plan.lower()


def test_mixture_resample_temperature_math(spark):
    from investigraph_etl_spark.operators.sampling import mixture_resample

    rows = [(f"a{i}", "big") for i in range(3200)] + [
        (f"b{i}", "small") for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["k", "dom"])
    out = mixture_resample(
        df, key_col="k", domain_col="dom", temperature=2.0
    )
    got = {
        (r["dom"], r["keep_frac"]) for r in out.select("dom", "keep_frac").distinct().collect()
    }
    # keep_d = n_d^(1/T-1) / max  with T=2: big -> (3200^-.5)/(200^-.5) = 1/4
    assert got == {("small", 1.0), ("big", 0.25)}
    kept = {r["dom"]: r["cnt"] for r in out.groupBy("dom").agg(F.count("*").alias("cnt")).collect()}
    assert kept["small"] == 200  # most-boosted domain keeps everything
    assert abs(kept["big"] - 800) < 120  # ~n*keep, hash-uniform tolerance


def test_mixture_resample_t1_is_identity(spark, pop):
    from investigraph_etl_spark.operators.sampling import mixture_resample

    out = mixture_resample(pop, key_col="k", domain_col="grp", temperature=1.0)
    assert out.count() == pop.count()
    assert {r["keep_frac"] for r in out.select("keep_frac").distinct().collect()} == {1.0}


def test_mixture_resample_deterministic_and_partition_invariant(spark, pop):
    from investigraph_etl_spark.operators.sampling import mixture_resample

    a = {r["k"] for r in mixture_resample(pop, key_col="k", domain_col="grp", temperature=3.0).collect()}
    b = {r["k"] for r in mixture_resample(pop.repartition(11), key_col="k", domain_col="grp", temperature=3.0).collect()}
    assert a == b and len(a) > 0


def test_mixture_resample_bad_temperature(spark, pop):
    from investigraph_etl_spark.operators.sampling import mixture_resample

    with pytest.raises(ValueError):
        mixture_resample(pop, key_col="k", domain_col="grp", temperature=0.0)
