"""Bigram-LM perplexity scoring (operators/lm.py): exact parity with a
pure-Python reference, foreign-LM smoothing, partition invariance,
short-doc exclusion, and the no-UDF plan shape."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.lm import lm_perplexity, train_bigram_lm

CORPUS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat on the log"),
    ("d3", "THE cat  sat\ton the mat"),  # case/whitespace-folds onto d1
    ("d4", "a completely different sentence about spark engines"),
    ("d5", "single"),  # < 2 words: excluded
    ("d6", ""),  # empty: excluded
    ("d7", "loop loop loop loop loop loop loop loop"),
]


def py_lm(texts):
    """Reference implementation: returns (cb, cu, V)."""
    cb: Counter = Counter()
    vocab = set()
    for t in texts:
        ws = [w.lower() for w in t.split()]
        vocab.update(ws)
        cb.update(zip(ws, ws[1:]))
    cu: Counter = Counter()
    for (w1, _), n in cb.items():
        cu[w1] += n
    return cb, cu, len(vocab)


def py_scores(texts, ids, alpha=0.5, lm_texts=None):
    cb, cu, V = py_lm(lm_texts if lm_texts is not None else texts)
    out = {}
    for i, t in zip(ids, texts):
        ws = [w.lower() for w in t.split()]
        if len(ws) < 2:
            continue
        lps = [
            math.log((cb.get((a, b), 0) + alpha) / (cu.get(a, 0) + alpha * V))
            for a, b in zip(ws, ws[1:])
        ]
        avg = sum(lps) / len(lps)
        out[i] = (len(lps), round(avg, 4), round(math.exp(-avg), 3))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_matches_pure_python_reference(spark, docs):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in lm_perplexity(docs).collect()
    }
    want = py_scores([t for _, t in CORPUS], [i for i, _ in CORPUS])
    assert got == want
    assert "d5" not in got and "d6" not in got


def test_repetitive_doc_scores_low_perplexity(spark, docs):
    ppl = {r["doc_id"]: r["ppl"] for r in lm_perplexity(docs).collect()}
    # "loop loop ..." is maximally predictable under its own LM;
    # the one-off sentence d4 is the least predictable
    assert ppl["d7"] < ppl["d1"] < ppl["d4"]


def test_foreign_lm_smoothing(spark, docs):
    """Scoring against a DIFFERENT training corpus: unseen bigrams and
    contexts take the α floor, matching the reference math."""
    lm_rows = CORPUS[:3]
    lm_docs = spark.createDataFrame(lm_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in lm_perplexity(docs, lm_docs=lm_docs).collect()
    }
    want = py_scores(
        [t for _, t in CORPUS],
        [i for i, _ in CORPUS],
        lm_texts=[t for _, t in lm_rows],
    )
    assert got == want
    # d4 shares no vocabulary with the LM corpus: every bigram at the
    # smoothed floor ln(α / (0 + α·V)) = -ln(V)
    _, _, V = py_lm([t for _, t in lm_rows])
    assert got["d4"][1] == round(-math.log(V), 4)


def test_partition_invariant(spark, docs):
    a = sorted(map(tuple, lm_perplexity(docs).collect()))
    b = sorted(map(tuple, lm_perplexity(docs.repartition(7)).collect()))
    assert a == b


def test_keep_flag_on_rounded_value(spark, docs):
    rows = lm_perplexity(docs, max_ppl=4.5).collect()
    for r in rows:
        assert r["ppl_keep"] == (r["ppl"] <= 4.5)
    assert any(r["ppl_keep"] for r in rows)
    assert not all(r["ppl_keep"] for r in rows)


def test_no_python_udf_in_plan(spark, docs):
    plan = (
        lm_perplexity(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_train_tables_consistent(spark, docs):
    cb, cu, vocab = train_bigram_lm(docs)
    total_bigrams = cb.agg(F.sum("cb")).collect()[0][0]
    total_contexts = cu.agg(F.sum("cu")).collect()[0][0]
    assert total_bigrams == total_contexts
    ref_cb, _, ref_v = py_lm([t for _, t in CORPUS])
    assert total_bigrams == sum(ref_cb.values())
    assert vocab.collect()[0][0] == ref_v


def test_self_scoring_single_corpus_scan(spark, tmp_path):
    """Round-4 plan-shape guard (VERDICT r3 'What's wrong' #3): the
    self-scoring path must tokenize/scan the corpus ONCE.  The word
    arrays are persisted; counts, vocabulary and scoring all read the
    cache.  In the executed-plan string every FileScan occurrence is
    the cached relation's child plan reprinted under an
    InMemoryRelation — i.e. no branch scans the parquet directly."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(CORPUS, ["doc_id", "text"]).write.parquet(p)
    df = lm_perplexity(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans >= 1
    # every parquet-scan print sits inside a cached relation: a direct
    # (uncached) corpus scan would make Scan-parquet > InMemoryRelation
    assert n_scans == plan.count("InMemoryRelation")
    # the three consumers (bigram counts, vocab, scoring) read the cache
    assert plan.count("InMemoryTableScan") >= 3
    # values still correct through the cache
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in df.collect()
    }
    want = py_scores([t for _, t in CORPUS], [i for i, _ in CORPUS])
    assert got == want
