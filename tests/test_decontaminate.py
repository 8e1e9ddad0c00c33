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


# ------------------------------------------------------- tokens domain


def _tokenize(spark, docs):
    """Word→token-id derivation (md5 recipe) shared by the gate query."""
    from pyspark.sql import functions as F

    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    tokens = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast("long")
    )
    return docs.select("doc_id", tokens.alias("tokens"))


def test_token_report_equals_text_report(spark, corpus, bench):
    """The 48-bit md5 word→id map is collision-free far past realistic
    vocabulary sizes (birthday bound ~2^24 ≈ 16M distinct words for a
    50% collision chance — ADVICE r4 widened it from 32 bits, where
    ~77k words already made collisions likely), so token-gram overlap
    must reproduce word-gram overlap exactly."""
    from investigraph_etl_spark.operators.decontaminate import (
        token_contamination_report,
    )

    text_rep = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_report(corpus, bench, n=4).collect()
    }
    tok_rep = {
        r["doc_id"]: r["n_hits"]
        for r in token_contamination_report(
            _tokenize(spark, corpus), _tokenize(spark, bench), n=4
        ).collect()
    }
    assert tok_rep == text_rep


def test_token_short_doc_whole_array_gram(spark):
    from investigraph_etl_spark.operators.decontaminate import (
        token_contamination_report,
    )

    docs = spark.createDataFrame(
        [(1, [7, 8]), (2, [7, 8, 9])], "doc_id long, tokens array<long>"
    )
    bench = spark.createDataFrame([(9, [7, 8])], "doc_id long, tokens array<long>")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in token_contamination_report(docs, bench, n=4).collect()
    }
    # doc 1's whole-array gram "7-8" matches bench's whole-array gram;
    # doc 2's whole-array gram "7-8-9" does not
    assert got == {1: 1}


def test_token_null_and_empty_emit_nothing(spark):
    from investigraph_etl_spark.operators.decontaminate import (
        token_contamination_report,
        token_shingle_rows,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, []), (3, [5])], "doc_id long, tokens array<long>"
    )
    assert token_shingle_rows(docs, n=4).count() == 1  # only doc 3
    bench = spark.createDataFrame([(9, [5])], "doc_id long, tokens array<long>")
    got = {
        r["doc_id"] for r in token_contamination_report(docs, bench, n=4).collect()
    }
    assert got == {3}


def test_drop_token_contaminated(spark):
    from investigraph_etl_spark.operators.decontaminate import (
        drop_token_contaminated,
    )

    docs = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 9]), (2, [5, 6, 7, 8])],
        "doc_id long, tokens array<long>",
    )
    bench = spark.createDataFrame(
        [(9, [1, 2, 3, 4])], "doc_id long, tokens array<long>"
    )
    kept = {r["doc_id"] for r in drop_token_contaminated(docs, bench, n=4).collect()}
    assert kept == {2}
