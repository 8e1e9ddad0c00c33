"""SemDeDup (Abbas et al. 2023): k-means-cell semantic near-dup
pairs — precision vs the exact all-pairs baseline (must be 1.0: the
in-cell verify is exact), recall on clustered data, tiled-kernel
equivalence, nprobe cross-cell dedup, end-to-end canonical keep."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.similarity import (
    semantic_dedup,
    semantic_dedup_pairs,
)


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors (same shape as the KNN fixtures: iid gaussians
    # have no neighbor structure for a quantizer to find)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((6, 16)) * 3
    rows = [
        (i, (centers[i % 6] + rng.standard_normal(16) * 0.4).astype("float32").tolist())
        for i in range(60)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), {
        i: np.array(v) for i, v in rows
    }


def _np_cosine_pairs(vecs: dict[int, np.ndarray], threshold: float):
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids]).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    return {
        (ids[a], ids[b]): sims[a, b]
        for a in range(len(ids))
        for b in range(a + 1, len(ids))
        if sims[a, b] >= threshold
    }


def test_precision_and_values_vs_exact(spark, emb):
    df, vecs = emb
    exact = _np_cosine_pairs(vecs, 0.9 - 1e-9)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_pairs(
            df, threshold=0.9, n_clusters=6, seed=3
        ).collect()
    }
    assert got, "clustered fixture must yield semantic pairs"
    # exact in-cell verify ⇒ every emitted pair is a true pair
    assert set(got) <= set(exact)
    for pair, cos in got.items():
        assert abs(cos - exact[pair]) < 1e-3


def test_recall_on_clustered_data(spark, emb):
    df, vecs = emb
    exact = set(_np_cosine_pairs(vecs, 0.9))
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df, threshold=0.9, n_clusters=6, nprobe=2, seed=3
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    # 6 cells on 6-center data, 2 probes → near-exact expected
    assert recall >= 0.8, f"SemDeDup recall too low: {recall}"


def test_tiled_kernel_matches_single_tile(spark, emb):
    df, _ = emb
    kw = dict(threshold=0.9, n_clusters=4, nprobe=2, seed=3)
    big = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_dedup_pairs(df, tile=4096, **kw).collect()
    }
    # tile=7 forces the multi-block path incl. off-diagonal blocks and
    # the global-row-order triangle mask
    small = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_dedup_pairs(df, tile=7, **kw).collect()
    }
    assert big == small


def test_nprobe_pairs_are_unique(spark, emb):
    df, _ = emb
    rows = semantic_dedup_pairs(
        df, threshold=0.9, n_clusters=6, nprobe=3, seed=3
    ).collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_semantic_dedup_keeps_component_min_ids(spark, emb):
    df, _ = emb
    pairs = semantic_dedup_pairs(
        df, threshold=0.9, n_clusters=6, nprobe=2, seed=3
    ).collect()

    # driver-side union-find oracle over the SAME pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    # canonical = component min ⇒ drop every node whose root ≠ itself
    drop = {x for x in parent if find(x) != x}
    all_ids = {r["vec_id"] for r in df.select("vec_id").collect()}
    kept = {
        r["vec_id"]
        for r in semantic_dedup(
            df, threshold=0.9, n_clusters=6, nprobe=2, seed=3
        ).collect()
    }
    assert kept == all_ids - drop


def test_empty_corpus_yields_empty_pairs(spark):
    df = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )
    assert semantic_dedup_pairs(df, threshold=0.9).count() == 0
    assert semantic_dedup(df, threshold=0.9).count() == 0


def test_deterministic_across_runs(spark, emb):
    df, _ = emb
    kw = dict(threshold=0.9, n_clusters=6, nprobe=2, seed=3)
    a = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_dedup_pairs(df, **kw).collect()
    )
    b = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_dedup_pairs(df, **kw).collect()
    )
    assert a == b


def test_auto_clusters_heuristic():
    """AUTO n_clusters (round-5, VERDICT r4 task 7): one cell per 50k
    vectors, floor 8; quantizer sample floor 16 points per cell."""
    from investigraph_etl_spark.operators.similarity import (
        semantic_dedup_auto_clusters,
    )

    assert semantic_dedup_auto_clusters(0) == (8, 128)
    assert semantic_dedup_auto_clusters(60) == (8, 128)
    assert semantic_dedup_auto_clusters(50_000) == (8, 128)
    assert semantic_dedup_auto_clusters(1_000_000) == (20, 320)
    # the paper's LAION-440M point lands in the same decade as its 11k
    assert semantic_dedup_auto_clusters(440_000_000) == (8800, 140_800)


def test_auto_n_clusters_end_to_end_matches_pinned(spark, emb):
    """n_clusters=None resolves to the heuristic (8 for a 60-row
    corpus) and must reproduce the pinned-8 output exactly."""
    df, _ = emb
    auto = semantic_dedup_pairs(df, threshold=0.8, nprobe=2).toPandas()
    pinned = semantic_dedup_pairs(
        df, threshold=0.8, n_clusters=8, nprobe=2
    ).toPandas()
    key = lambda p: sorted(map(tuple, p[["id_a", "id_b"]].values.tolist()))
    assert key(auto) == key(pinned) and len(auto) > 0
