"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020): score every document by the
perplexity of a (here: bigram) LM and keep the low-perplexity tail.
The reference pipeline has no LM stage; this is a §2.11 engine-new
operator mandated by the training-data-pipeline brief.

Semantics (deterministic, engine-portable — the DuckDB oracle runs the
identical math):

* words = lowercase whitespace tokens (the same rule as every other
  text operator, ``textstats.words``);
* LM: bigram occurrence counts ``cb(w1, w2)`` over the training
  corpus, context counts ``cu(w1) = Σ_w2 cb(w1, w2)``, vocabulary size
  ``V`` = distinct words;
* per scored doc with words ``w_0..w_{n-1}`` (n ≥ 2):
  ``logp_i = ln((cb(w_{i-1}, w_i) + α) / (cu(w_{i-1}) + α·V))``
  (add-α a.k.a. Lidstone smoothing — unseen bigrams/contexts get mass,
  so scoring a corpus against a *different* training corpus is
  well-defined), ``avg_logp`` = mean, ``ppl = exp(−avg_logp)``.

Scale shape (100 TB):

* training = ONE bigram explode → ONE hash agg with map-side combine
  (cost ∝ tokens); context counts fold from the bigram table (cost ∝
  distinct bigrams), never a second corpus pass;
* self-scoring (``lm_docs=None``) tokenizes the corpus ONCE: the
  per-doc word-array frame is persisted (MEMORY_AND_DISK) and the
  bigram-count, vocabulary, and scoring branches all explode from that
  cache — the physical plan contains a single scan of ``documents``
  (asserted in tests/test_lm.py).  The cache holds one array row per
  doc (≈ the tokenized corpus); at sizes where that doesn't fit the
  cluster's storage memory+disk, self-scoring is the wrong shape
  anyway — use ``lm_docs=`` (below);
* scoring = the doc-bigram stream joined against the two count tables.
  Self-scoring a 100 TB corpus against a 100 TB-trained LM would
  shuffle-join on the bigram key; the production pattern (CCNet
  trains on a Wikipedia-sized sample, not the crawl) is
  ``lm_docs=`` a deterministic hash-sample
  (:func:`..sampling.deterministic_sample`) — the count tables then
  collapse to sample-vocabulary size and AQE broadcasts them, so the
  corpus being scored never crosses a shuffle at all (only its
  per-doc agg does, keyed by doc — no hot keys by construction);
* Zipf skew on the join key (stop-word contexts like "the") is
  candidate-side only — counts are one row per gram, so the broadcast
  path has no skewed build side and the shuffle path's probe skew is
  AQE-split.

No UDFs anywhere — the whole operator is codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.textstats import words


def _word_arrays(docs: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """One row per doc: (id, _ws) — the lowercase word array.  The one
    frame self-scoring persists so tokenization runs once."""
    return docs.select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("_ws")
    )


def _bigrams_from_arrays(arr: DataFrame, id_col: str) -> DataFrame:
    """One row per bigram OCCURRENCE: (id, w1, w2).  Docs with < 2
    words contribute nothing (and are excluded from scoring)."""
    return (
        arr.where(F.size("_ws") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_ws) - 1),"
                    " i -> struct(_ws[i-1] AS w1, _ws[i] AS w2))"
                )
            ).alias("_g"),
        )
        .select(id_col, F.col("_g.w1").alias("w1"), F.col("_g.w2").alias("w2"))
    )


def _doc_bigrams(docs: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    return _bigrams_from_arrays(
        _word_arrays(docs, text_col=text_col, id_col=id_col), id_col
    )


def train_bigram_lm(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    _arr: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of a bigram LM over ``docs``: returns
    ``(bigram_counts(w1, w2, cb), context_counts(w1, cu), vocab(_v))``
    — ``vocab`` is a 1-row frame so the scalar stays a lazy plan (no
    driver action) and broadcast-joins into the scoring expression.
    ``_arr`` (internal) supplies a pre-built — typically persisted —
    word-array frame so self-scoring never re-tokenizes the corpus."""
    arr = _arr if _arr is not None else _word_arrays(
        docs, text_col=text_col, id_col=id_col
    )
    occ = _bigrams_from_arrays(arr, id_col)
    cb = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    # context count = Σ over the (already tiny vs the corpus) bigram
    # table — NOT a second corpus scan
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    vocab = arr.select(F.explode("_ws").alias("w")).agg(
        F.count_distinct("w").alias("_v")
    )
    return cb, cu, vocab


def lm_perplexity(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    max_ppl: float = 2000.0,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram-LM perplexity + keep flag.

    ``lm_docs`` is the training corpus (default: score ``docs`` against
    themselves — every scored bigram is then in the count tables by
    construction; with a foreign/sampled LM, unseen bigrams fall back
    to the α-smoothed floor via the left joins).  Docs with < 2 words
    are excluded (a bigram LM assigns them no probability).

    Self-scoring persists the tokenized word-array frame
    (MEMORY_AND_DISK) so the corpus is scanned and tokenized exactly
    once; the counts, vocabulary, and scoring branches each explode
    from the cache.  The cache is left to Spark's LRU eviction — it is
    an input of the returned lazy plan.

    Output: ``(doc_id, n_bigrams, avg_logp, ppl, ppl_keep)`` — floats
    rounded (4 / 3 dp) and the keep flag computed ON the rounded value,
    so the DuckDB oracle's libm cannot flake a boundary.
    """
    if lm_docs is None:
        arr = _word_arrays(docs, text_col=text_col, id_col=id_col).persist()
        cb, cu, vocab = train_bigram_lm(
            docs, text_col=text_col, id_col=id_col, _arr=arr
        )
        score_occ = _bigrams_from_arrays(arr, id_col)
    else:
        cb, cu, vocab = train_bigram_lm(
            lm_docs, text_col=text_col, id_col=id_col
        )
        score_occ = _doc_bigrams(docs, text_col=text_col, id_col=id_col)
    scored = (
        score_occ
        .join(cb, ["w1", "w2"], "left")
        .join(cu, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(alpha) * F.col("_v"))
            ).alias("_logp"),
        )
    )
    avg = F.sum("_logp") / F.count(F.lit(1))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(avg, 4).alias("avg_logp"),
            F.round(F.exp(-avg), 3).alias("ppl"),
        )
        .withColumn("ppl_keep", F.col("ppl") <= F.lit(max_ppl))
    )
