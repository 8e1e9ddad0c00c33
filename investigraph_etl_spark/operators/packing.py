"""Training-sequence packing — concat-then-chop over tokenized docs.

The canonical LLM-data-pipeline step the tokens payload exists for:
documents of varying ``n_tok`` are concatenated in a deterministic
order and chopped into fixed-length training sequences of ``max_len``
tokens.  A document may straddle a sequence boundary; each (doc,
sequence) overlap is emitted as a SPAN with the doc-relative token
range and the sliced token piece, so downstream can either train on
pieces directly or assemble full sequences.

This is the "concat and chunk" packing used by large pretraining
pipelines (no bin-packing heuristics, zero padding waste except the
final partial sequence per shard) — and unlike first-fit bin packing
it is closed-form: with ``off`` = the tokens preceding a doc in its
shard, the doc covers bins ``floor(off/C) .. floor((off+n-1)/C)`` and
pure arithmetic yields every span.  That makes it fully expressible
in window + explode DataFrame ops (and in ANSI SQL for the oracle) —
no UDF, no iteration.

Scale: the running-token-count window is sequential **per shard**
(``shard_col``), never global — matching how real pipelines pack each
data shard independently.  Shards process in parallel; skewed shards
can be re-sharded upstream (e.g. ``pmod(xxhash64(doc_id), k)``) since
packing semantics are per-shard by definition.  Spark plan: one
shuffle on ``shard_col`` + an in-partition sort for the window, then
narrow explode/slice projections.

Reference scope note: the reference has no packing op (it ships
entity fragments, not token sequences) — this operator comes from the
training-data mandate (tokens payload, SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    *,
    max_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_col: str = "n_tok",
    shard_col: str = "source",
    assemble: bool = False,
) -> DataFrame:
    """Chop each shard's doc stream into ``max_len``-token sequences.

    Returns spans ``(shard, seq_id, doc_id, tok_start, tok_end,
    piece)`` where ``seq_id`` numbers sequences within the shard,
    ``[tok_start, tok_end)`` is the doc-relative half-open token range
    (0-based) and ``piece`` the sliced tokens.  Docs with ``n_col <= 0``
    are dropped (nothing to pack).  Order within a shard is by
    ``id_col`` — deterministic across runs and engines.

    ``assemble=True`` instead groups the spans back into whole
    sequences ``(shard, seq_id, seq_tokens, seq_len, n_docs)`` —
    every sequence except a shard's last has exactly ``max_len``
    tokens (asserted in tests).
    """
    C = int(max_len)
    if C <= 0:
        raise ValueError("max_len must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (
        df.filter(F.col(n_col) > 0)
        .withColumn("_off", F.coalesce(F.sum(n_col).over(w), F.lit(0)).cast("long"))
    )
    d = d.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.floor(F.col("_off") / C),
                F.floor((F.col("_off") + F.col(n_col) - 1) / C),
            )
        ),
    )
    tok_start = F.greatest(
        F.col("seq_id") * C - F.col("_off"), F.lit(0).cast("long")
    )
    tok_end = F.least(
        (F.col("seq_id") + 1) * C - F.col("_off"), F.col(n_col).cast("long")
    )
    spans = d.select(
        F.col(shard_col).alias("shard"),
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col(id_col).alias("doc_id"),
        tok_start.cast("int").alias("tok_start"),
        tok_end.cast("int").alias("tok_end"),
        F.slice(
            F.col(tokens_col), tok_start.cast("int") + 1, (tok_end - tok_start).cast("int")
        ).alias("piece"),
    )
    if not assemble:
        return spans
    # assemble: pieces of a sequence concatenated in doc order.
    # array_sort on struct(doc_id, piece) orders by the first field —
    # same doc order the spans were cut in; at most ~C/1 pieces per
    # group, so the agg buffer is bounded by max_len tokens.
    return (
        spans.groupBy("shard", "seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "piece"))),
                    lambda s: s["piece"],
                )
            ).alias("seq_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn("seq_len", F.size("seq_tokens"))
        .select("shard", "seq_id", "seq_tokens", "seq_len", "n_docs")
    )
