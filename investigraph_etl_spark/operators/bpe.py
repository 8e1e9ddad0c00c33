"""BPE tokenizer training and encoding over a document corpus —
byte-pair-encoding subword units (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016).
Engine-new (§2.11): the reference pipeline ships no tokenizer; a
training-data engine over pre-tokenized sequences needs the stage that
PRODUCES those tokens.

Scale shape (100 TB) — the classic two-phase split:

1. **Corpus phase (distributed, the only corpus-scale pass)**:
   ``word → occurrence count`` is ONE explode + ONE hash agg with
   map-side combine; 100 TB of text collapses to a vocabulary-bounded
   table.  ``min_word_count`` applies the standard frequency cutoff —
   by Zipf's law the surviving table covers ~all occurrences while
   staying ~10⁶ rows at web scale (exactly what GPT-2's and
   SentencePiece's trainers operate on).
2. **Merge loop (vocabulary-bounded, NOT corpus-scale)**: greedy
   argmax-pair merging runs over the collected word table with a
   pair → affected-words index, so each iteration touches only words
   containing the merged pair.  Same dispatch philosophy as the hybrid
   connected-components operator (dedup.py C3): when the reduced
   problem is provably small, one vectorized local pass beats a
   V-iteration chain of distributed jobs (V jobs of driver-side
   argmax + join per merge — measured pattern, not a guess: each
   Spark job carries ~0.1-0.3 s fixed cost, so 10⁴ merges would spend
   an hour on scheduling alone).

Determinism: ties on pair count break lexicographically on
``(left, right)`` — the merge sequence is a pure function of the word
counts, hence of the corpus, independent of partitioning.  Training is
therefore pytest-checked against an independent pure-Python
implementation of the paper's algorithm (iterative ⇒ no SQL oracle;
the driver gate records the rows-only check, SURVEY §2.11).

Encoding applies merges in rank order (lowest rank first — the exact
inverse of training) via an Arrow-batched pandas UDF with a per-batch
word memo: web text repeats words heavily, so the per-row cost decays
to a dict hit.  ``</w>`` is an explicit end-of-word symbol.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from investigraph_etl_spark.operators.textstats import words

_EOW = "</w>"


def word_counts(
    docs: DataFrame, *, text_col: str = "text", min_word_count: int = 1
) -> DataFrame:
    """``(word, n)`` occurrence counts — the corpus-scale pass."""
    wc = (
        docs.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_word_count > 1:
        wc = wc.where(F.col("n") >= min_word_count)
    return wc


def bpe_merges(
    word_count_pairs: list[tuple[str, int]],
    num_merges: int,
    *,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """The greedy merge loop over a word-count table (local,
    vocabulary-bounded).  Returns ``[(left, right, pair_count), …]`` in
    merge-rank order; stops early when no pair reaches
    ``min_pair_count``."""
    seqs: list[list[str]] = [list(w) + [_EOW] for w, _ in word_count_pairs]
    counts = [int(n) for _, n in word_count_pairs]

    pair_n: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> word indexes
    for i, s in enumerate(seqs):
        for p in zip(s, s[1:]):
            pair_n[p] += counts[i]
            where[p].add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        if not pair_n:
            break
        # argmax with the deterministic tiebreak: max count, then
        # lexicographically smallest pair
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        n_best = pair_n[best]
        if n_best < min_pair_count:
            break
        merges.append((best[0], best[1], n_best))
        joined = best[0] + best[1]
        for i in sorted(where[best]):
            s, c = seqs[i], counts[i]
            # un-count this word's pairs, rewrite, re-count
            for p in zip(s, s[1:]):
                pair_n[p] -= c
                if pair_n[p] <= 0:
                    del pair_n[p]
                where[p].discard(i)
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and (s[j], s[j + 1]) == best:
                    out.append(joined)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = out
            for p in zip(out, out[1:]):
                pair_n[p] += c
                where[p].add(i)
    return merges


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    min_pair_count: int = 2,
    min_word_count: int = 1,
) -> DataFrame:
    """Train BPE merges on ``docs``; returns a DataFrame
    ``(rank, left, right, n)`` in merge order (deterministic — see
    module docstring)."""
    wc = [
        (r["word"], r["n"])
        for r in word_counts(
            docs, text_col=text_col, min_word_count=min_word_count
        ).collect()
    ]
    wc.sort()  # collect order is partition-dependent; the loop is not,
    # but sorted input makes that self-evident
    merges = bpe_merges(wc, num_merges, min_pair_count=min_pair_count)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i, left, right, n) for i, (left, right, n) in enumerate(merges)],
        "rank int, left string, right string, n long",
    )


def _encode_word(word: str, ranks: dict, memo: dict) -> list[str]:
    got = memo.get(word)
    if got is not None:
        return got
    s = list(word) + [_EOW]
    while len(s) > 1:
        best_rank, best_j = None, -1
        for j in range(len(s) - 1):
            r = ranks.get((s[j], s[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        # merge EVERY occurrence of the chosen pair in this pass —
        # mirrors training, which rewrites whole words per merge
        pair = (s[best_j], s[best_j + 1])
        out, j = [], 0
        while j < len(s):
            if j + 1 < len(s) and (s[j], s[j + 1]) == pair:
                out.append(s[j] + s[j + 1])
                j += 2
            else:
                out.append(s[j])
                j += 1
        s = out
    memo[word] = s
    return s


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``docs`` with a trained merge table.  The merge ranks
    broadcast inside the UDF closure (the table is ``num_merges`` rows
    — trivially broadcastable); encoding is an Arrow-batched pandas UDF
    with a word memo per batch (Zipf ⇒ mostly dict hits)."""
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        import re as _re

        # ASCII whitespace only, matching the JVM \s+ of words() (the
        # same rule the simhash UDF pins — Python str.split() would
        # also split on NBSP etc. and diverge from training)
        _ws = _re.compile(r"[ \t\n\x0b\f\r]+")
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in _ws.split(t.lower()):
                if w:
                    toks.extend(_encode_word(w, ranks, memo))
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        id_col, enc(F.col(text_col)).alias(out_col)
    ).withColumn("n_bpe", F.size(out_col))
