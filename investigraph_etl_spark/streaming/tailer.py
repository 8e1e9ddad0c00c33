"""Changelog tailer: binlog/WAL directory → lake MERGE (north rule).

Replaces the reference's pull-generator pipeline + unix-pipe
parallelism (/root/reference/investigraph/pipeline.py:43-47,
docs/run/parallelization.md) with Structured Streaming:

    readStream(parquet, maxFilesPerTrigger)
      → foreachBatch( normalize → LWW dedup → lake.merge )

Exactly-once = Structured Streaming checkpoint (at-least-once
redelivery) + the lake's idempotent commit log keyed by batch id
(SURVEY.md §2.9 T4).  A killed query resumed from the same checkpoint
re-delivers the in-flight batch with the same ``batchId``; the lake
skips already-committed ids, so the final state is replay-invariant.

Late / out-of-order events need no watermark: LWW on
``event_sequence`` is order-insensitive within a batch, and across
batches the merge's ``_seq``-max guard ignores stale arrivals
(SURVEY.md §2.9 T5).
"""

from __future__ import annotations

import json
import pathlib
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from investigraph_etl_spark.operators.normalize import normalize_events


def change_schema(with_lang: bool = False) -> StructType:
    fields = [
        StructField("event_sequence", LongType(), False),
        StructField("op", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("event_time", TimestampType(), True),
    ]
    if with_lang:
        fields.append(StructField("lang", StringType(), True))
    return StructType(fields)


def target_schema(with_lang: bool = False) -> StructType:
    fields = [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
    if with_lang:
        fields.append(StructField("lang", StringType(), True))
    return StructType(fields)


def prepare_batch(events: DataFrame, *, salt_buckets: int = 0) -> DataFrame:
    """Normalize one (micro)batch for merge (narrow, no shuffle).

    In-batch LWW dedup happens inside ``lake.merge`` — folded with the
    target-vs-batch merge into a single winner-agg pass
    (``LWW(LWW(batch) ∪ target) ≡ LWW(batch ∪ target)``).  Call
    :func:`investigraph_etl_spark.operators.lww.lww_dedup` directly if a
    standalone reduced batch is needed (e.g. feeding a real Iceberg
    MERGE, whose cardinality check requires ≤1 source row per key).
    ``event_time`` is stream metadata (lag metrics), not table payload.
    ``salt_buckets`` is accepted for signature stability and forwarded
    by :func:`replay_batch`.
    """
    return normalize_events(events).drop("event_time")


def replay_batch(events: DataFrame, lake, *, salt_buckets: int = 0, batch_id: int = 0) -> dict:
    """Batch-mode full replay: the whole changelog as one merge."""
    return lake.merge(
        prepare_batch(events), batch_id, salt_buckets=salt_buckets
    )


class MetricsLog:
    """Per-microbatch JSON-lines metrics (throughput, lag, lineage) —
    the reference analog is progress logging + Collector stats
    (/root/reference/investigraph/model/context.py:126-133,
    /root/reference/investigraph/logic/export.py:64-79)."""

    def __init__(self, path: str | None):
        self.path = pathlib.Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, record: dict) -> None:
        if self.path:
            with self.path.open("a") as fh:
                fh.write(json.dumps(record) + "\n")


def tune_ingest_scan(
    spark: SparkSession,
    *,
    max_partition_bytes: str = "8m",
    open_cost: str = "1m",
) -> None:
    """Size parquet scan splits for micro-batch ingest.

    A micro-batch is a handful of small binlog chunk files; at the
    default 128 MB ``maxPartitionBytes`` + 4 MB open cost the whole
    batch packs into 1-2 scan tasks, so scan + normalization run on a
    sliver of the cluster while the bucket-exchange reduce side waits.
    8 MB splits (with row-group-bounded chunk files — see
    ``changelog.write_changelog``) fan the map side out to ~2 row
    groups per task.  NOT applied by default: an interleaved A/B on
    this host (8M events, 16 commits) measured the tuned config ~8%
    SLOWER — when the batch fits the page cache, split scheduling
    costs more than map-side parallelism buys.  The knob exists for
    deployments where per-row map-side work dominates (remote object
    storage, heavier normalization).  Runtime-settable conf — safe to
    flip on a live session before starting the tailer.
    """
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    spark.conf.set("spark.sql.files.openCostInBytes", open_cost)


def tail_changelog(
    spark: SparkSession,
    changelog_dir: str,
    lake,
    checkpoint_dir: str,
    *,
    with_lang: bool = False,
    max_files_per_trigger: int = 4,
    salt_buckets: int = 0,
    metrics_path: str | None = None,
    available_now: bool = True,
    reduce_batch: bool = True,
    compact_mode: str = "sync",
    derived: list | None = None,
    stream: DataFrame | None = None,
    dead_letter_dir: str | None = None,
):
    """Start the tailer; returns the StreamingQuery.

    ``stream`` — a pre-built streaming DataFrame to tail instead of
    the default parquet changelog source (e.g. a decoded Debezium
    envelope stream from :func:`tail_debezium`).  If it carries the
    ``_dead`` marker column (sources/debezium.py), dead-lettered rows
    are quarantined to ``dead_letter_dir`` (append-parquet, keyed by
    batch id for idempotent retries) instead of poisoning the merge.

    ``available_now=True`` drains everything currently in the directory
    and stops (the replay/bench mode); ``False`` keeps tailing.
    ``reduce_batch`` / ``compact_mode`` forward to ``lake.merge`` —
    for sustained micro-batch tailing, ``reduce_batch=False`` +
    ``compact_mode="async"`` is the measured-fastest policy (the
    in-batch LWW reduce costs more than the duplicate bytes it saves
    on low-dup micro-batches, and async compaction overlaps the next
    commits; see sources/lake.py).  Defaults stay conservative.
    ``derived`` — change-feed consumers refreshed after every batch's
    merge: anything with ``refresh(lake)`` keyed to the lake version —
    ``DerivedAggTable`` materialized views (operators/incremental.py)
    and ``MinHashIndex`` dedup indexes (operators/minhash_index.py).
    Each keeps its own lake-version pointer, so replayed batches are
    no-ops and a consumer that missed batches catches up over the
    widened feed.
    With ``compact_mode="async"``, call ``lake.wait_for_compaction()``
    after the query terminates to land any inflight fold (state is
    correct either way; the unharvested output is merely orphaned and
    vacuum-collected).
    The declared schema may be a superset of early files — parquet
    fills missing columns with null, and the lake promotes genuinely
    new columns on first sight (additive evolution, SURVEY.md T6).
    """
    metrics = MetricsLog(metrics_path)

    if stream is None:
        stream = (
            spark.readStream.schema(change_schema(with_lang))
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(changelog_dir)
        )

    def apply(batch: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        persisted = None
        if "_dead" in batch.columns:
            # quarantine, then merge only the valid side.  Two actions
            # over the decoded batch — persist so the envelope parse
            # runs once; dead letters keyed by batch id so a replayed
            # batch overwrites (not duplicates) its own quarantine.
            from investigraph_etl_spark.sources.debezium import (
                split_dead_letters,
            )

            persisted = batch.persist()
            good, dead = split_dead_letters(batch)
            if dead_letter_dir is not None:
                (
                    dead.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .parquet(f"{dead_letter_dir}/batch_id={batch_id}")
                )
            batch = good
        # metrics ride the merge's own actions via observe() — no extra
        # scan of the batch (batch.count() would re-read every file, a
        # full second pass at 100 TB)
        obs = Observation()
        observed = batch.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.min("event_sequence").alias("min_seq"),
            F.max("event_sequence").alias("max_seq"),
            F.max("event_time").alias("max_event_time"),
        )
        reduced = prepare_batch(observed)
        result = lake.merge(
            reduced,
            batch_id,
            salt_buckets=salt_buckets,
            reduce_batch=reduce_batch,
            compact_mode=compact_mode,
        )
        # materialized views ride the same batch cadence; their own
        # version pointer makes a replayed batch a no-op and lets a
        # missed refresh catch up over the widened feed
        # (operators/incremental.py DerivedAggTable)
        for d in derived or []:
            d.refresh(lake)
        dt = time.monotonic() - t0
        o = obs.get if not result.get("skipped") else {}
        max_et = o.get("max_event_time")
        metrics.write(
            {
                "batch_id": batch_id,
                "rows_in": o.get("rows_in"),
                "min_seq": o.get("min_seq"),
                "max_seq": o.get("max_seq"),
                # ingest lag: wall clock vs newest event in the batch
                "lag_sec": round(time.time() - max_et.timestamp(), 3)
                if max_et is not None
                else None,
                "events_per_sec": round(o["rows_in"] / dt, 2)
                if dt > 0 and o.get("rows_in")
                else None,
                "seconds": round(dt, 3),
                "lake_version": result.get("version"),
                "skipped": result.get("skipped", False),
                "touched_buckets": result.get("touched_buckets"),
                "wall_time": time.time(),
            }
        )
        if persisted is not None:
            persisted.unpersist()

    writer = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tail_debezium(
    spark: SparkSession,
    envelope_dir: str,
    lake,
    checkpoint_dir: str,
    *,
    with_lang: bool = False,
    max_files_per_trigger: int = 4,
    dead_letter_dir: str | None = None,
    **kwargs,
):
    """Tail a directory of Debezium JSON-lines envelope files (the
    file-based stand-in for a Kafka topic) into the lake: decode →
    dead-letter quarantine → normalize → LWW → MERGE, with the same
    exactly-once checkpoint semantics as :func:`tail_changelog`.

    On a real cluster swap the file source for ``format("kafka")`` and
    pass ``key_col="key"``/``seq_col="offset"`` through to
    :func:`investigraph_etl_spark.sources.debezium.decode_debezium` —
    the decode projection is source-agnostic.
    """
    from investigraph_etl_spark.sources.debezium import debezium_stream

    stream = debezium_stream(
        spark,
        envelope_dir,
        with_lang=with_lang,
        max_files_per_trigger=max_files_per_trigger,
    )
    return tail_changelog(
        spark,
        envelope_dir,
        lake,
        checkpoint_dir,
        with_lang=with_lang,
        stream=stream,
        dead_letter_dir=dead_letter_dir,
        **kwargs,
    )
