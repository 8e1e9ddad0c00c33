"""Empty/degenerate-input hardening for the similarity + dedup family
(round-5, VERDICT r4 task 9): every public operator over 0 rows, 1 row,
and an all-identical corpus must return a well-formed frame — never
crash in a numpy kernel on an empty batch, never emit self-pairs.  The
ADVICE-r3 empty-query KNN crash is the class of bug this pins down."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)
DIM = 8


def _docs(spark, kind: str):
    rows = {
        "empty": [],
        "one": [(1, "alpha beta gamma delta epsilon")],
        "identical": [(i, "alpha beta gamma delta epsilon") for i in range(5)],
    }[kind]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _embs(spark, kind: str):
    v = (np.arange(DIM) + 1.0).astype("float32")
    rows = {
        "empty": [],
        "one": [(1, v.tolist())],
        "identical": [(i, v.tolist()) for i in range(5)],
    }[kind]
    return spark.createDataFrame(rows, EMB_SCHEMA)


KINDS = ["empty", "one", "identical"]


# ------------------------------------------------------------- dedup


@pytest.mark.parametrize("kind", KINDS)
def test_exact_dedup(spark, kind):
    from investigraph_etl_spark.operators.dedup import exact_dedup

    got = exact_dedup(_docs(spark, kind)).collect()
    expected = {"empty": 0, "one": 1, "identical": 1}[kind]
    assert len(got) == expected
    if kind == "identical":
        assert got[0]["n_dups"] == 5 and got[0]["canonical_id"] == 0


@pytest.mark.parametrize("kind", KINDS)
def test_ngram_jaccard_pairs(spark, kind):
    from investigraph_etl_spark.operators.dedup import ngram_jaccard_pairs

    got = ngram_jaccard_pairs(_docs(spark, kind), n=3, threshold=0.2).collect()
    if kind == "identical":
        assert len(got) == 10  # all C(5,2) pairs at jaccard 1.0
        assert all(r["jaccard"] == 1.0 for r in got)
    else:
        assert got == []


@pytest.mark.parametrize("kind", KINDS)
def test_minhash_lsh_candidates(spark, kind):
    from investigraph_etl_spark.operators.dedup import minhash_lsh_candidates

    got = minhash_lsh_candidates(_docs(spark, kind)).collect()
    if kind == "identical":
        assert len(got) == 10
        assert all(r["n_bands"] == 8 for r in got)  # identical signatures
    else:
        assert got == []


@pytest.mark.parametrize("kind", KINDS)
def test_simhash_near_dup_pairs(spark, kind):
    from investigraph_etl_spark.operators.dedup import simhash_near_dup_pairs

    got = simhash_near_dup_pairs(_docs(spark, kind), max_hamming=3).collect()
    if kind == "identical":
        assert len(got) == 10 and all(r["hamming"] == 0 for r in got)
    else:
        assert got == []


@pytest.mark.parametrize("kind", KINDS)
def test_winnow_span_pairs(spark, kind):
    from investigraph_etl_spark.operators.dedup import winnow_span_pairs

    got = winnow_span_pairs(_docs(spark, kind), k=4, window=4).collect()
    assert len(got) == (10 if kind == "identical" else 0)


@pytest.mark.parametrize("kind", KINDS)
def test_dedup_keep_canonical(spark, kind):
    from investigraph_etl_spark.operators.dedup import (
        dedup_keep_canonical,
        minhash_lsh_candidates,
    )

    docs = _docs(spark, kind)
    pairs = minhash_lsh_candidates(docs).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )
    kept = dedup_keep_canonical(docs, pairs, id_col="doc_id").collect()
    expected = {"empty": 0, "one": 1, "identical": 1}[kind]
    assert len(kept) == expected
    if kind == "identical":
        assert kept[0]["doc_id"] == 0  # component min id survives


@pytest.mark.parametrize("kind", KINDS)
def test_dup_clusters(spark, kind):
    from investigraph_etl_spark.operators.dedup import (
        dup_clusters,
        minhash_lsh_candidates,
    )

    pairs = minhash_lsh_candidates(_docs(spark, kind))
    got = dup_clusters(pairs).collect()
    if kind == "identical":
        assert {r["canonical_id"] for r in got} == {0}
        assert {r["id"] for r in got} == {0, 1, 2, 3, 4}
    else:
        assert got == []


# -------------------------------------------------------- similarity


@pytest.mark.parametrize("kind", KINDS)
def test_brute_force_knn(spark, kind):
    from investigraph_etl_spark.operators.similarity import brute_force_knn

    emb = _embs(spark, kind)
    got = brute_force_knn(emb, emb, k=3).collect()
    if kind == "identical":
        # self excluded by contract; every remaining neighbor is exact
        assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in got)
        assert len(got) == 5 * 3
    else:
        # one row: the only candidate is self, which is excluded
        assert got == []


@pytest.mark.parametrize("kind", KINDS)
def test_lsh_knn(spark, kind):
    from investigraph_etl_spark.operators.similarity import lsh_knn

    emb = _embs(spark, kind)
    got = lsh_knn(emb, emb, dim=DIM, k=3).collect()
    if kind == "identical":
        assert len(got) == 15 and all(abs(r["cosine"] - 1.0) < 1e-6 for r in got)
    else:
        assert got == []  # self excluded


@pytest.mark.parametrize("kind", KINDS)
def test_ivf_knn(spark, kind):
    from investigraph_etl_spark.operators.similarity import ivf_knn

    emb = _embs(spark, kind)
    got = ivf_knn(emb, emb, k=3, n_centroids=2, nprobe=2).collect()
    if kind == "identical":
        assert len(got) == 15 and all(abs(r["cosine"] - 1.0) < 1e-6 for r in got)
    else:
        assert got == []  # self excluded


@pytest.mark.parametrize("kind", KINDS)
def test_exact_cosine_pairs(spark, kind):
    from investigraph_etl_spark.operators.similarity import exact_cosine_pairs

    got = exact_cosine_pairs(_embs(spark, kind), threshold=0.9).collect()
    if kind == "identical":
        assert len(got) == 10 and all(r["cosine"] == 1.0 for r in got)
    else:
        assert got == []


@pytest.mark.parametrize("kind", KINDS)
def test_lsh_near_dup_pairs(spark, kind):
    from investigraph_etl_spark.operators.similarity import lsh_near_dup_pairs

    got = lsh_near_dup_pairs(_embs(spark, kind), threshold=0.9, dim=DIM).collect()
    if kind == "identical":
        # identical vectors land in the same bucket in every table
        assert len(got) == 10 and all(r["cosine"] == 1.0 for r in got)
    else:
        assert got == []


@pytest.mark.parametrize("kind", KINDS)
def test_semantic_dedup(spark, kind):
    from investigraph_etl_spark.operators.similarity import semantic_dedup

    kept = semantic_dedup(_embs(spark, kind), threshold=0.9).collect()
    expected = {"empty": 0, "one": 1, "identical": 1}[kind]
    assert len(kept) == expected
    if kind == "identical":
        assert kept[0]["vec_id"] == 0
