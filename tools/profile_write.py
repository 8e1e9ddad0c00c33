"""Decompose the per-commit delta-write job: where do the ~2.5s go?

Stages (cumulative pipeline, each timed warm as min of 2):
  scan_noop         scan 1/16th of the changelog, noop sink
  prep_noop         + normalize_events (prepare_batch)
  lww_noop          + in-batch LWW (winners agg + broadcast semi join)
  repart_noop       + repartition(32, _bucket)
  parquet_flat      + parquet write WITHOUT partitionBy
  parquet_partby    + parquet write WITH partitionBy (the real path)

Usage: python tools/profile_write.py [cores] [n_events]
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
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark(
        f"profw{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )
    work = tempfile.mkdtemp(prefix="profwrite_")
    log_dir = f"{work}/log"
    write_changelog(
        log_dir, n_events, chunk_size=max(n_events // 4, 1), seed=42,
        n_docs=max(n_events * 16 // 10, 100),  # 16-batch doc space: keys mostly distinct
        skew_frac=0.05, max_tok=64,
    )
    files = sorted(str(p) for p in pathlib.Path(log_dir).glob("*.parquet"))
    ev = spark.read.schema(change_schema()).parquet(*files)

    def timed(label, thunk):
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            thunk()
            samples.append(round(time.monotonic() - t0, 3))
        print(json.dumps({"stage": label, "min": min(samples), "all": samples}))

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    timed("scan_noop", lambda: noop(ev))
    prep = prepare_batch(ev)
    timed("prep_noop", lambda: noop(prep))
    lww = lww_dedup(prep, "doc_id", "event_sequence", winners_strategy="broadcast")
    timed("lww_noop", lambda: noop(lww))
    bucketed = lww.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(32))
    )
    repart = bucketed.repartition(32, "_bucket")
    timed("repart_noop", lambda: noop(repart))
    timed(
        "parquet_flat",
        lambda: repart.write.mode("overwrite").parquet(f"{work}/flat"),
    )
    timed(
        "parquet_partby",
        lambda: repart.write.mode("overwrite").partitionBy("_bucket").parquet(
            f"{work}/partby"
        ),
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
