"""Benchmark decontamination — flag training docs that overlap an
eval/test set by word n-grams.

The standard pretraining hygiene pass (GPT-3 §C, PaLM, Llama all
report it): any training document sharing an ``n``-gram with a
benchmark document is suspect and gets dropped or audited.  Exact
semantics: lowercase whitespace words → distinct word ``n``-grams
(documents shorter than ``n`` words contribute their whole text as
one shingle — same rule as the near-dup shinglers in dedup.py, shared
helper), flag a doc when ≥ ``min_hits`` distinct shingles also occur
anywhere in the benchmark.

Scale shape: benchmark sets are tiny next to a 100 TB corpus, so the
benchmark shingle vocabulary is deduped and **broadcast**; corpus
shingles stream through a broadcast semi-ish inner join (no corpus
shuffle before the match) and only MATCHED (doc, shingle) pairs —
a vanishingly small set — reach the per-doc count agg.  The corpus
is never shuffled by shingle; the only wide op is the final hash-agg
on matched doc ids with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.dedup import shingle_rows


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per contaminated doc: ``(id_col, n_hits)`` — the number of
    distinct ``n``-gram shingles it shares with the benchmark.  Clean
    docs do not appear (join them back for a full report)."""
    bcol = bench_text_col or text_col
    bench_shingles = (
        shingle_rows(benchmark, n=n, text_col=bcol, id_col=bcol, out_col="_shingle")
        .select("_shingle")
        .distinct()
    )
    doc_shingles = shingle_rows(
        docs, n=n, text_col=text_col, id_col=id_col, out_col="_shingle"
    )
    return (
        doc_shingles.join(F.broadcast(bench_shingles), "_shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("_shingle").alias("n_hits"))
    )


def drop_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """The enforcement pass: remove every doc with ≥ ``min_hits``
    shared shingles.  The drop set is only the contaminated ids —
    broadcastable for the anti-join in the common case (AQE decides)."""
    hits = contamination_report(
        docs, benchmark, n=n, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col,
    ).filter(F.col("n_hits") >= min_hits)
    return docs.join(hits.select(id_col), id_col, "left_anti")


# ------------------------------------------------------- tokens domain


def token_shingle_rows(
    df: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    out_col: str = "_tshingle",
) -> DataFrame:
    """``(id, gram-key)`` rows from a pre-tokenized ``array<int>``
    column — the tokens-domain twin of the word shinglers (the north
    rule's table stores ``tokens``, not text; contamination checks on
    a tokenized corpus must run on token ids directly or pay a full
    detokenize pass).  A gram is ``n`` consecutive token ids; docs
    shorter than ``n`` tokens contribute the whole array as one gram
    (the word-shingle short-doc rule); null/empty token arrays emit
    nothing.  The key is the '-'-joined decimal string — portable
    across engines (DuckDB: ``array_to_string``) and a plain string
    join key for the broadcast match."""
    t = F.col(tokens_col)
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.slice(t, i, n),
        ),
    ).otherwise(F.array(t))
    keys = F.transform(
        grams, lambda g: F.array_join(g.cast("array<string>"), "-")
    )
    return (
        df.filter(t.isNotNull() & (F.size(t) > 0))
        .select(F.col(id_col), F.explode(keys).alias(out_col))
    )


def token_contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    bench_tokens_col: str | None = None,
) -> DataFrame:
    """Per contaminated doc: ``(id_col, n_hits)`` distinct token
    ``n``-grams shared with the benchmark — same broadcast shape as
    :func:`contamination_report` (tiny benchmark gram vocab deduped
    and broadcast; the corpus is never shuffled by gram, only matched
    pairs reach the per-doc agg)."""
    bcol = bench_tokens_col or tokens_col
    bench = (
        token_shingle_rows(
            benchmark, n=n, id_col=bcol, tokens_col=bcol, out_col="_tshingle"
        )
        .select("_tshingle")
        .distinct()
    )
    doc_grams = token_shingle_rows(
        docs, n=n, id_col=id_col, tokens_col=tokens_col, out_col="_tshingle"
    )
    return (
        doc_grams.join(F.broadcast(bench), "_tshingle")
        .groupBy(id_col)
        .agg(F.count_distinct("_tshingle").alias("n_hits"))
    )


def drop_token_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    bench_tokens_col: str | None = None,
) -> DataFrame:
    """Enforcement twin of :func:`drop_contaminated` for the tokens
    domain."""
    hits = token_contamination_report(
        docs, benchmark, n=n, id_col=id_col, tokens_col=tokens_col,
        bench_tokens_col=bench_tokens_col,
    ).filter(F.col("n_hits") >= min_hits)
    return docs.join(hits.select(id_col), id_col, "left_anti")
