"""Compare physical strategies for the bulk in-batch LWW reduce at a
given core count (the scaling pair's dominant, worst-scaling stage —
the broadcast build of an 800k-key winner set is serial driver work).

Variants (each min-of-reps warm, noop sink):
  bcast      winners agg + broadcast semi-join   (current merge default)
  shuffle    winners agg + shuffle_hash semi-join (payload shuffled once)
  copart     bucket-first: repartition payload by _bucket, winners agg
             per (_bucket, key) with NO extra shuffle (HashPartitioning
             on a subset satisfies ClusteredDistribution), co-partitioned
             shuffle_hash semi-join with NO exchange — then the write's
             bucket clustering is already in place
  copart_w   copart + parquet partitionBy write (the real sink)
  bcast_w    bcast + repartition + partitionBy write (current real path)

Usage: python tools/profile_lww_variants.py <cores> [n_events] [reps]
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
from investigraph_etl_spark.streaming.tailer import (  # noqa: E402
    change_schema,
    prepare_batch,
)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(
        f"profv{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.driver.extraJavaOptions": (
                "-Djava.net.preferIPv4Stack=true -XX:+UseParallelGC "
                f"-XX:ParallelGCThreads={max(cores, 2)}"
            ),
        },
    )
    work = tempfile.mkdtemp(prefix="profv_")
    log_dir = f"{work}/log"
    write_changelog(
        log_dir, n_events, chunk_size=max(n_events // 64, 1), seed=42,
        n_docs=max(n_events // 10, 100), skew_frac=0.05, max_tok=64,
    )
    files = sorted(str(p) for p in pathlib.Path(log_dir).glob("*.parquet"))
    prep = prepare_batch(spark.read.schema(change_schema()).parquet(*files))

    def timed(label, thunk):
        samples = []
        for _ in range(reps + 1):
            t0 = time.monotonic()
            thunk()
            samples.append(round(time.monotonic() - t0, 3))
        print(json.dumps(
            {"stage": label, "cores": cores,
             "min": min(samples[1:]), "all": samples}), flush=True)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    bcast = lww_dedup(prep, "doc_id", "event_sequence",
                      winners_strategy="broadcast")
    timed("bcast", lambda: noop(bcast))

    shuf = lww_dedup(prep, "doc_id", "event_sequence",
                     winners_strategy="shuffle_hash")
    timed("shuffle", lambda: noop(shuf))

    bucketed = prep.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(32))
    )
    rep = bucketed.repartition(128, "_bucket")
    winners = rep.groupBy("_bucket", "doc_id").agg(
        F.max("event_sequence").alias("event_sequence")
    )
    copart = rep.join(
        winners.hint("shuffle_hash"),
        on=["_bucket", "doc_id", "event_sequence"],
        how="left_semi",
    )
    timed("copart", lambda: noop(copart))

    timed(
        "copart_w",
        lambda: copart.write.mode("overwrite").partitionBy("_bucket").parquet(
            f"{work}/cw"
        ),
    )
    bw = bcast.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(32))
    ).repartition(128, "_bucket")
    timed(
        "bcast_w",
        lambda: bw.write.mode("overwrite").partitionBy("_bucket").parquet(
            f"{work}/bw"
        ),
    )
    if cores == 4:
        print("--- copart plan ---", flush=True)
        copart.explain("formatted")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
