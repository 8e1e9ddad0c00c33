"""Dedup & similarity operator semantics: exact groups, Jaccard math,
MinHash-LSH recall vs the exact baseline, SimHash hamming, KNN
correctness vs a numpy oracle, LSH-KNN recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
    word_shingles,
)
from investigraph_etl_spark.operators.similarity import (
    brute_force_knn,
    exact_cosine_pairs,
    ivf_knn,
    lsh_knn,
    lsh_near_dup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different text about spark engines"),
        (4, "spark engines process completely different text layouts"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(spark, docs):
    out = {r["canonical_id"]: r["n_dups"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 2 identical, canonical = min id
    assert out[1] == 1 and out[3] == 1


def test_word_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    row = df.select(word_shingles(F.col("text"), 3).alias("s")).first()
    assert row["s"] == ["only two"]


def test_ngram_jaccard_math(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.1).collect()
    }
    # identical docs → jaccard 1.0
    assert pairs[(0, 2)] == 1.0
    # docs 0/1 share 6 of 7+7 distinct trigrams: J = 6/8
    assert abs(pairs[(0, 1)] - 0.75) < 1e-9
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dups(spark, docs):
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, n=3, num_hashes=32, bands=16).collect()
    }
    assert (0, 2) in cand  # exact dup always collides in every band
    assert (0, 1) in cand  # 0.75-jaccard pair should collide at r=2


def test_minhash_recall_on_synthetic(spark):
    # recall vs exact jaccard on a bigger synthetic set
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(200)]
    base = [rng.choices(vocab, k=30) for _ in range(40)]
    rows, rid = [], 0
    for b in base:
        rows.append((rid, " ".join(b))); rid += 1
        mut = list(b); mut[rng.randrange(30)] = rng.choice(vocab)
        rows.append((rid, " ".join(mut))); rid += 1  # high-jaccard partner
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.6).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df, n=3, num_hashes=64, bands=32).collect()
    }
    assert exact, "synthetic set must contain near-dup pairs"
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_simhash_properties(spark, docs):
    out = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out[0] == out[2]  # identical text → identical simhash
    ham01 = bin((out[0] ^ out[1]) & (2**64 - 1)).count("1")
    ham03 = bin((out[0] ^ out[3]) & (2**64 - 1)).count("1")
    assert ham01 < ham03  # near-dup closer than unrelated


def test_simhash_tokenizes_like_words(spark):
    """The UDF must tokenize with textstats.words()'s rule (ASCII
    whitespace only): NBSP does NOT split, so "A\\u00a0b" is ONE token
    whose fingerprint equals its raw token-hash bits.  Also pins the
    engine-portable md5-64 token hash (round 5): the same value DuckDB
    derives via ('0x'||substr(md5(w),1,16))::UBIGINT."""
    from hashlib import md5

    df = spark.createDataFrame([(1, "A b")], "doc_id int, text string")
    fp = simhash(df).collect()[0]["simhash"]
    raw = int(md5("a b".encode("utf-8")).hexdigest()[:16], 16)
    exp = raw - (1 << 64) if raw >= (1 << 63) else raw
    assert fp == exp


def test_simhash_near_dup_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=10).collect()
    }
    assert pairs[(0, 2)] == 0


def test_simhash_stream_stitching_across_arrow_batches(spark, docs):
    """The sort-merge verify stitches a bucket that spans Arrow batch
    boundaries; at default batch size (10k rows) test corpora never
    exercise that path, so force tiny batches and pin equality — both
    against the default-batch run and with the cap effectively off."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    want = sorted(
        tuple(r) for r in simhash_near_dup_pairs(docs, max_hamming=8).collect()
    )
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        got = sorted(
            tuple(r) for r in simhash_near_dup_pairs(docs, max_hamming=8).collect()
        )
        got_nocap = sorted(
            tuple(r)
            for r in simhash_near_dup_pairs(
                docs, max_hamming=8, max_block_df=10**9
            ).collect()
        )
    finally:
        spark.conf.set(key, old)
    assert got == want
    assert got_nocap == want  # auto cap is exact on this corpus


def test_simhash_uncapped_opt_out_and_memoized_count(spark, docs):
    """Round-4 (ADVICE r3): max_block_df=0 or math.inf disables the
    hot-bucket cap entirely; the AUTO path derives n from a count
    memoized on the plan's semantic hash (one job per distinct input
    per session, not one per call)."""
    import math

    from investigraph_etl_spark.operators import dedup as dd

    want = sorted(
        tuple(r)
        for r in simhash_near_dup_pairs(
            docs, max_hamming=8, max_block_df=10**9
        ).collect()
    )
    for opt_out in (0, math.inf):
        got = sorted(
            tuple(r)
            for r in simhash_near_dup_pairs(
                docs, max_hamming=8, max_block_df=opt_out
            ).collect()
        )
        assert got == want
    # memoization: two AUTO calls on the same frame hit the cache entry
    dd._COUNT_CACHE.clear()
    simhash_near_dup_pairs(docs, max_hamming=8).collect()
    assert len(dd._COUNT_CACHE) == 1
    n_before = dict(dd._COUNT_CACHE)
    simhash_near_dup_pairs(docs, max_hamming=8).collect()
    assert dd._COUNT_CACHE == n_before


def _np_knn(vecs: dict[int, np.ndarray], qids: list[int], k: int):
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids]).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = mat @ (vecs[q] / np.linalg.norm(vecs[q]))
        order = sorted(
            (i for i in ids if i != q), key=lambda i: (-sims[ids.index(i)], i)
        )
        out[q] = order[:k]
    return out


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors: 6 centers + noise — realistic near-dup shape
    # (iid gaussians have no neighbor structure for LSH to find)
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 16)) * 3
    rows = [
        (i, (centers[i % 6] + rng.standard_normal(16) * 0.4).astype("float32").tolist())
        for i in range(60)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), {
        i: np.array(v) for i, v in rows
    }


def test_brute_force_knn_matches_numpy(spark, emb):
    df, vecs = emb
    got = brute_force_knn(df, df.filter(F.col("vec_id") < 5), k=3).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    expected = _np_knn(vecs, list(range(5)), 3)
    assert by_q == expected


def test_lsh_knn_recall(spark, emb):
    df, vecs = emb
    exact = _np_knn(vecs, list(range(10)), 3)
    got = lsh_knn(
        df, df.filter(F.col("vec_id") < 10), dim=16, k=3, n_bits=6, n_tables=8
    ).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(set(exact[q]) & by_q.get(q, set())) for q in exact)
    recall = hits / (len(exact) * 3)
    assert recall >= 0.7, f"LSH-KNN recall too low: {recall}"


def test_ivf_knn_recall(spark, emb):
    df, vecs = emb
    exact = _np_knn(vecs, list(range(10)), 3)
    got = ivf_knn(
        df, df.filter(F.col("vec_id") < 10), k=3, n_centroids=6, nprobe=3
    ).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(set(exact[q]) & by_q.get(q, set())) for q in exact)
    recall = hits / (len(exact) * 3)
    # clustered data, 3-of-6 cells probed → near-exact expected
    assert recall >= 0.8, f"IVF-KNN recall too low: {recall}"


def _np_cosine_pairs(vecs: dict[int, np.ndarray], threshold: float):
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids]).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    out = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if sims[a, b] >= threshold:
                out[(ids[a], ids[b])] = sims[a, b]
    return out


def test_exact_cosine_pairs_matches_numpy(spark, emb):
    df, vecs = emb
    expected = _np_cosine_pairs(vecs, 0.9)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in exact_cosine_pairs(df, threshold=0.9).collect()
    }
    assert expected, "clustered fixture must contain near-dup pairs"
    assert set(got) == set(expected)
    for pair, cos in got.items():
        assert abs(cos - expected[pair]) < 1e-3


def test_lsh_near_dup_recall_and_precision(spark, emb):
    df, vecs = emb
    expected = set(_np_cosine_pairs(vecs, 0.9))
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            df, threshold=0.9, dim=16, n_bits=6, n_tables=10
        ).collect()
    }
    # exact verify step ⇒ precision is always 1.0
    assert got <= set(_np_cosine_pairs(vecs, 0.9 - 1e-9))
    recall = len(got & expected) / len(expected)
    assert recall >= 0.8, f"LSH near-dup recall too low: {recall}"


def test_dup_clusters_random_graph_vs_union_find(spark):
    """CC over random edge sets must match a driver-side union-find:
    same components, canonical = component min."""
    import random

    from investigraph_etl_spark.operators.dedup import dup_clusters

    rng = random.Random(7)
    n, m = 200, 150
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for e in edges for x in e}
    expected = {x: find(x) for x in touched}

    df = spark.createDataFrame(edges, "id_a int, id_b int")
    # both physical paths: single-task vectorized union-find (default
    # at this size) and the distributed star loop (threshold 0)
    for thr in (2_000_000, 0):
        got = {
            r["id"]: r["canonical_id"]
            for r in dup_clusters(df, local_threshold=thr).collect()
        }
        assert got == expected, f"local_threshold={thr}"


def test_dup_clusters_star_loop_at_scale(spark):
    """The distributed star-loop path at a size where many
    large/small-star rounds genuinely run (80k edges: dense random
    components + a 1k-deep path): must agree exactly with the
    single-task vectorized union-find path on the same edge set.
    This is the unbounded-scale path the toy tests barely enter."""
    import numpy as np
    import pandas as pd

    from investigraph_etl_spark.operators.dedup import dup_clusters

    rng = np.random.default_rng(11)
    n = 30_000
    rand = rng.integers(0, n, size=(80_000, 2), dtype=np.int64)
    path = np.arange(1_024, dtype=np.int64) + n
    chain = np.stack([path, path + 1], axis=1)
    edges = np.concatenate([rand, chain])
    df = spark.createDataFrame(
        pd.DataFrame({"id_a": edges[:, 0], "id_b": edges[:, 1]})
    )
    fast = {
        r["id"]: r["canonical_id"]
        for r in dup_clusters(df).collect()  # local union-find path
    }
    star = {
        r["id"]: r["canonical_id"]
        for r in dup_clusters(df, local_threshold=0).collect()
    }
    assert len(fast) > 25_000
    # the chain collapsed into one component rooted at its min node
    assert all(fast[i] == n for i in range(n, n + 1_025))
    assert star == fast


def test_dup_clusters_long_chain(spark):
    """A single path graph is the worst case for label propagation —
    large-star/small-star must still converge to one component."""
    from investigraph_etl_spark.operators.dedup import dup_clusters

    chain = [(i, i + 1) for i in range(100)]
    df = spark.createDataFrame(chain, "id_a int, id_b int")
    for thr in (2_000_000, 0):
        got = {
            r["id"]: r["canonical_id"]
            for r in dup_clusters(df, local_threshold=thr).collect()
        }
        assert got == {i: 0 for i in range(101)}, f"local_threshold={thr}"


def test_dedup_keep_canonical(spark, docs):
    from investigraph_etl_spark.operators.dedup import dedup_keep_canonical

    pairs = spark.createDataFrame([(0, 2), (2, 4)], "id_a int, id_b int")
    kept = dedup_keep_canonical(docs, pairs, id_col="doc_id")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # cluster {0,2,4} → canonical 0; everything else untouched
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids == (all_ids - {2, 4})


def test_asof_join_semantics(spark):
    from investigraph_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 11, 200)],
        "k int, ts int, p int",
    )
    inc = {
        (r["k"], r["ts"]): r["p"]
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    # inclusive: left ts=10 sees right ts=10
    assert inc == {(1, 10): 100, (1, 20): 150, (1, 5): None, (2, 10): None}
    strict = {
        (r["k"], r["ts"]): r["p"]
        for r in asof_join(left, right, on="ts", by="k", inclusive=False).collect()
    }
    # strict: left ts=10 must NOT see right ts=10
    assert strict == {(1, 10): None, (1, 20): 150, (1, 5): None, (2, 10): None}


def test_asof_join_null_right_payload_not_backfilled(spark):
    """The latest right row must be carried ATOMICALLY: a null field in
    it stays null, never back-filled from an older right row (ADVICE r2
    repro: {ts=10,px=100,qty=5},{ts=20,px=200,qty=null} → px=200 must
    pair with qty=null, not qty=5)."""
    from investigraph_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 25)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 10, 100, 5), (1, 20, 200, None)],
        "k int, ts int, px int, qty int",
    )
    out = asof_join(left, right, on="ts", by="k").collect()[0]
    assert out["px"] == 200 and out["qty"] is None


def test_asof_join_column_collision_suffix(spark):
    from investigraph_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 1.0)], "k int, ts int, value double")
    right = spark.createDataFrame([(1, 9, 2.0)], "k int, ts int, value double")
    out = asof_join(left, right, on="ts", by="k").collect()[0]
    assert out["value"] == 1.0 and out["value_right"] == 2.0


# ------------------------------------------------------------ winnowing


def _winnow_oracle(texts: dict[int, str], k: int, window: int) -> dict[int, set]:
    """Python reference of the selection rule: per trailing window of
    `window` gram positions (partial heads included), fingerprint the
    window's min gram value."""
    out: dict[int, set] = {}
    for did, text in texts.items():
        ws = [w.lower() for w in text.split()]
        if len(ws) >= k:
            grams = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
        else:
            grams = [" ".join(ws)]
        sel = {
            min(grams[max(0, i - window + 1) : i + 1])
            for i in range(len(grams))
        }
        out[did] = sel
    return out


def test_winnow_fingerprints_match_python_oracle(spark):
    from investigraph_etl_spark.operators.dedup import winnow_fingerprints

    texts = {
        0: "the quick brown fox jumps over the lazy dog today",
        1: "a completely different sentence with many many words inside it",
        2: "short one",
        3: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=4, window=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["gram"])
    assert got == _winnow_oracle(texts, 4, 4)


def test_winnow_guarantee_shared_span_is_detected(spark):
    """The winnowing guarantee: two docs sharing a verbatim run of
    ≥ window+k-1 words share ≥1 fingerprint, so the pair surfaces at
    min_common=1 — even when the span is a small fraction of each doc
    (the case Jaccard-style set similarity misses)."""
    from investigraph_etl_spark.operators.dedup import winnow_span_pairs

    span = "one two three four five six seven"  # 7 = window+k-1 words
    a = "alpha bravo charlie delta " + span + " echo foxtrot golf hotel"
    b = "india juliet kilo lima mike " + span + " november oscar papa"
    c = "quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], ["doc_id", "text"]
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in winnow_span_pairs(df, k=4, window=4, min_common=1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_winnow_exact_dup_shares_all_fingerprints(spark):
    from investigraph_etl_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_span_pairs,
    )

    t = "spark engines process token arrays at considerable scale daily"
    df = spark.createDataFrame([(0, t), (1, t)], ["doc_id", "text"])
    n_fp = (
        winnow_fingerprints(df, k=4, window=4)
        .filter(F.col("doc_id") == 0)
        .count()
    )
    row = winnow_span_pairs(df, k=4, window=4).collect()[0]
    assert (row["id_a"], row["id_b"]) == (0, 1)
    assert row["n_common"] == n_fp


def test_winnow_max_gram_df_drops_boilerplate(spark):
    """A fingerprint present in every doc (boilerplate) is dropped by
    the df cap; genuinely rare shared spans survive."""
    from investigraph_etl_spark.operators.dedup import winnow_span_pairs

    boiler = "subscribe to our newsletter for updates"
    rare = "unique shared passage of exactly seven words"
    rows = [
        (0, boiler + " " + rare),
        (1, boiler + " " + rare),
        (2, boiler + " something else entirely different here now"),
        (3, boiler + " yet another unrelated trailing text body"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r["id_a"], r["id_b"])
        for r in winnow_span_pairs(
            df, k=4, window=4, min_common=1, max_gram_df=2
        ).collect()
    }
    assert (0, 1) in capped
    # pairs held together ONLY by the everywhere-boilerplate are gone
    assert (2, 3) not in capped


def test_knn_empty_query_set_returns_empty_frame(spark, emb):
    """Round-4 (ADVICE r3): an empty query frame must return an empty
    result with the standard (query_id, neighbor_id, cosine, rank)
    schema instead of crashing driver-side on a 1-D empty numpy
    matrix, for all three KNN paths."""
    df, _ = emb
    none = df.filter(F.col("vec_id") < 0)  # empty query set
    for fn in (
        lambda: brute_force_knn(df, none, k=3),
        lambda: lsh_knn(df, none, dim=16, k=3),
        lambda: ivf_knn(df, none, k=3, n_centroids=6),
    ):
        out = fn()
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
        assert out.count() == 0


def test_exact_cosine_pairs_size_guard(spark, emb):
    """Round-4 (VERDICT r3 task 6): exact all-pairs refuses corpora
    above max_rows with a message routing to lsh_near_dup_pairs;
    max_rows=None waives the guard."""
    df, _ = emb
    with pytest.raises(ValueError, match="lsh_near_dup_pairs"):
        exact_cosine_pairs(df, threshold=0.9, max_rows=10)
    # waived / above-threshold settings still work
    assert exact_cosine_pairs(df, threshold=0.99, max_rows=None).count() >= 0
    assert exact_cosine_pairs(df, threshold=0.99, max_rows=10**6).count() >= 0
