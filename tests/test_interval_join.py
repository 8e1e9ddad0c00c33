"""Range join: parity vs the naive theta join, boundary semantics,
left mode, bucket-width invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.interval import range_join


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(5)
    points = spark.createDataFrame(
        [(i, rng.randrange(4), float(rng.randrange(0, 1000))) for i in range(300)],
        "pid long, k long, t double",
    )
    intervals = spark.createDataFrame(
        [
            (j, rng.randrange(4), float(s), float(s + rng.randrange(1, 120)))
            for j in range(80)
            for s in [rng.randrange(0, 950)]
        ],
        "iid long, k long, lo double, hi double",
    )
    return points, intervals


def _naive(points, intervals):
    return (
        points.alias("p")
        .join(intervals.alias("i"), on="k")
        .filter((F.col("lo") <= F.col("t")) & (F.col("t") < F.col("hi")))
        .select("pid", "iid")
    )


@pytest.mark.parametrize("width", [10.0, 64.0, 500.0])
def test_matches_naive_theta_join_any_width(spark, data, width):
    points, intervals = data
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, on="t", start="lo", end="hi", by="k",
            bucket_width=width,
        ).collect()
    }
    expected = {(r["pid"], r["iid"]) for r in _naive(points, intervals).collect()}
    assert got == expected


def test_boundaries_half_open(spark):
    points = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 9.999)], "pid long, t double"
    )
    intervals = spark.createDataFrame([(7, 10.0, 20.0)], "iid long, lo double, hi double")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, on="t", start="lo", end="hi", bucket_width=5.0
        ).collect()
    }
    assert got == {(1, 7)}  # start inclusive, end exclusive


def test_left_mode_keeps_unmatched_points(spark, data):
    points, intervals = data
    out = range_join(
        points, intervals, on="t", start="lo", end="hi", by="k",
        bucket_width=50.0, how="left", point_id="pid",
    )
    assert out.select("pid").distinct().count() == points.count()
    matched = {r["pid"] for r in _naive(points, intervals).collect()}
    nulls = {r["pid"] for r in out.filter(F.col("iid").isNull()).collect()}
    assert nulls == {r["pid"] for r in points.collect()} - matched


def test_degenerate_and_bad_inputs(spark, data):
    points, intervals = data
    empty = range_join(
        points,
        intervals.withColumn("hi", F.col("lo")),  # zero-length intervals
        on="t", start="lo", end="hi", by="k", bucket_width=10.0,
    )
    assert empty.count() == 0
    with pytest.raises(ValueError):
        range_join(points, intervals, on="t", start="lo", end="hi",
                   bucket_width=0.0)
    with pytest.raises(ValueError):
        range_join(points, intervals, on="t", start="lo", end="hi",
                   bucket_width=1.0, how="left")
