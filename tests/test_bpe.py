"""BPE training/encoding (operators/bpe.py): merge-sequence parity with
an independent naive implementation of Sennrich et al.'s algorithm,
determinism, encode invariants."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.bpe import (
    bpe_encode,
    bpe_merges,
    train_bpe,
    word_counts,
)

CORPUS = [
    ("d1", "low lower lowest low low"),
    ("d2", "new newer newest new"),
    ("d3", "the newer the lower the better"),
    ("d4", "low low LOW Low"),  # case folds
    ("d5", ""),
    ("d6", "ab ab ba ba"),  # count ties -> lexicographic tiebreak
]


def ref_bpe(word_count_pairs, num_merges, min_pair_count=2):
    """The paper's algorithm, naive full-recount per iteration —
    deliberately a different structure than the indexed trainer."""
    vocab = {}
    for w, n in word_count_pairs:
        k = tuple(w) + ("</w>",)
        vocab[k] = vocab.get(k, 0) + n
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append((best[0], best[1], pairs[best]))
        new = {}
        for syms, n in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        vocab = new
    return merges


def py_word_counts(rows):
    c = Counter()
    for _, t in rows:
        c.update(t.lower().split())
    return sorted(c.items())


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_merge_loop_matches_reference():
    wc = py_word_counts(CORPUS)
    assert bpe_merges(wc, 50) == ref_bpe(wc, 50)
    assert bpe_merges(wc, 5) == ref_bpe(wc, 5)
    assert bpe_merges(wc, 50, min_pair_count=4) == ref_bpe(wc, 50, 4)


def test_train_end_to_end_and_partition_invariant(spark, docs):
    want = ref_bpe(py_word_counts(CORPUS), 30)
    got = [
        (r["left"], r["right"], r["n"])
        for r in train_bpe(docs, num_merges=30).orderBy("rank").collect()
    ]
    assert got == want
    again = [
        (r["left"], r["right"], r["n"])
        for r in train_bpe(docs.repartition(7), num_merges=30)
        .orderBy("rank")
        .collect()
    ]
    assert again == want


def test_word_counts_cutoff(spark, docs):
    all_words = dict(
        (r["word"], r["n"]) for r in word_counts(docs).collect()
    )
    assert all_words["low"] == 7  # case-folded: 4 in d1 + 3 in d4...
    kept = {
        r["word"] for r in word_counts(docs, min_word_count=3).collect()
    }
    assert "low" in kept and "better" not in kept


def test_encode_roundtrip_and_frequent_word_fuses(spark, docs):
    merges = train_bpe(docs, num_merges=60, min_pair_count=1)
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    # lossless: concatenated tokens reproduce the word stream
    for i, t in CORPUS:
        want = "".join(w + "</w>" for w in t.lower().split())
        assert "".join(enc[i]) == want
    # the most frequent word ends up a single token
    assert "low</w>" in enc["d1"]
    # n_bpe matches token count
    for r in bpe_encode(docs, merges).collect():
        assert r["n_bpe"] == len(r["bpe_tokens"])


def test_encode_with_no_merges_is_chars(spark, docs):
    empty = train_bpe(docs, num_merges=0)
    enc = {
        r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, empty).collect()
    }
    assert enc["d6"][:3] == ["a", "b", "</w>"]


def test_min_pair_count_stops_early():
    wc = [("ab", 2), ("cd", 1)]
    m = bpe_merges(wc, 100, min_pair_count=2)
    # only pairs with count >= 2 merge: ("a","b") then ("ab","</w>")
    assert [(left, right) for left, right, _ in m] == [
        ("a", "b"),
        ("ab", "</w>"),
    ]


def test_null_text_encodes_null(spark):
    docs = spark.createDataFrame(
        [("x", None)], "doc_id string, text string"
    )
    merges = train_bpe(
        spark.createDataFrame([("y", "aa aa")], ["doc_id", "text"]),
        num_merges=2,
    )
    assert bpe_encode(docs, merges).collect()[0]["bpe_tokens"] is None
