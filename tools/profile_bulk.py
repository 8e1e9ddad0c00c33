"""Decompose the BULK replay (the north-rule scaling pair's workload)
into cumulative pipeline stages at a given core count — run at 1 and 4
cores in separate invocations (fresh JVMs, never concurrently) and
diff the per-stage times to find where scaling efficiency is lost.

Workload matches bench.py's pair exactly: 8M events, 800k docs,
64 chunks, one bulk merge (winners broadcast semi-join) into a
32-bucket lake.

Stages (cumulative; each min-of-reps warm):
  scan_noop         read the changelog, noop sink
  prep_noop         + normalize_events (prepare_batch)
  winners_noop      the narrow winners agg alone (groupBy.max)
  lww_noop          + in-batch LWW (winners agg + broadcast semi join)
  repart_noop       + repartition(128, _bucket)
  full_merge        lake.merge() end-to-end (write + manifest)

Usage: python tools/profile_bulk.py <cores> [n_events] [reps]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from investigraph_etl_spark.changelog import write_changelog  # noqa: E402
from investigraph_etl_spark.operators.lww import lww_dedup  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402
from investigraph_etl_spark.sources.lake import HashLakeTable  # noqa: E402
from investigraph_etl_spark.streaming.tailer import (  # noqa: E402
    change_schema,
    prepare_batch,
    target_schema,
)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(
        f"profb{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": (
                "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC "
                f"-XX:ParallelGCThreads={max(cores, 2)}"
            ),
        },
    )
    work = tempfile.mkdtemp(prefix="profbulk_")
    log_dir = f"{work}/log"
    write_changelog(
        log_dir, n_events, chunk_size=max(n_events // 64, 1), seed=42,
        n_docs=max(n_events // 10, 100), skew_frac=0.05, max_tok=64,
    )
    files = sorted(str(p) for p in pathlib.Path(log_dir).glob("*.parquet"))
    ev = spark.read.schema(change_schema()).parquet(*files)

    def timed(label, thunk):
        samples = []
        for _ in range(reps + 1):  # rep 0 is the cold warmup, dropped
            t0 = time.monotonic()
            thunk()
            samples.append(round(time.monotonic() - t0, 3))
        print(json.dumps(
            {"stage": label, "cores": cores,
             "min": min(samples[1:]), "all": samples}), flush=True)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    timed("scan_noop", lambda: noop(ev))
    prep = prepare_batch(ev)
    timed("prep_noop", lambda: noop(prep))
    winners = prep.select("doc_id", "event_sequence").groupBy("doc_id").agg(
        F.max("event_sequence").alias("event_sequence")
    )
    timed("winners_noop", lambda: noop(winners))
    lww = lww_dedup(prep, "doc_id", "event_sequence", winners_strategy="broadcast")
    timed("lww_noop", lambda: noop(lww))
    bucketed = lww.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(32))
    )
    repart = bucketed.repartition(128, "_bucket")
    timed("repart_noop", lambda: noop(repart))

    def full():
        d = f"{work}/lake"
        shutil.rmtree(d, ignore_errors=True)
        lake = HashLakeTable.create(spark, d, target_schema(), num_buckets=32)
        lake.merge(prepare_batch(ev), 0)

    timed("full_merge", full)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
