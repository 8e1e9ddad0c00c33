"""Decontamination: exact n-gram overlap detection, short-doc rule,
drop pass, no self-flagging on disjoint sets."""

from __future__ import annotations

import pytest

from investigraph_etl_spark.operators.decontaminate import (
    contamination_report,
    drop_contaminated,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark plans"),
            (3, "brown fox jumps over something else entirely here"),
            (4, "tiny doc"),
            (5, "quick brown fox jumps over the lazy dog again and again"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [
            (100, "a benchmark question: the quick brown fox jumps over what"),
            (101, "tiny doc"),  # shorter than n → whole-text shingle
        ],
        "doc_id long, text string",
    )


def test_report_counts_distinct_shared_shingles(spark, corpus, bench):
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_report(corpus, bench, n=4).collect()
    }
    # doc 1 shares "the quick brown fox", "quick brown fox jumps",
    # "brown fox jumps over" (4-grams of the bench text); doc 3 shares
    # "brown fox jumps over"; doc 5 shares "quick brown fox jumps",
    # "brown fox jumps over"; doc 4 matches bench 101's whole-text
    # shingle "tiny doc"; doc 2 is clean
    assert got == {1: 3, 3: 1, 5: 2, 4: 1}


def test_drop_contaminated_min_hits(spark, corpus, bench):
    kept1 = {r["doc_id"] for r in drop_contaminated(corpus, bench, n=4).collect()}
    assert kept1 == {2}
    kept2 = {
        r["doc_id"]
        for r in drop_contaminated(corpus, bench, n=4, min_hits=2).collect()
    }
    assert kept2 == {2, 3, 4}


def test_disjoint_sets_flag_nothing(spark, corpus):
    other = corpus.sparkSession.createDataFrame(
        [(9, "zx qv wk jj pp qq rr ss")], "doc_id long, text string"
    )
    assert contamination_report(corpus, other, n=4).count() == 0


def test_case_insensitive_matching(spark):
    spark_docs = spark.createDataFrame(
        [(1, "The Quick BROWN Fox Jumps")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "the quick brown fox jumps")], "doc_id long, text string"
    )
    got = contamination_report(spark_docs, b, n=4).collect()
    assert len(got) == 1 and got[0]["n_hits"] == 2
