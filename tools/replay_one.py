"""Measure CDC replay throughput at a given core count, isolated in a
fresh process (fresh JVM — JIT state cannot leak between core counts).

Usage: python tools/replay_one.py <cores> <log_dir> <work_dir> <n_events> [reps]
Prints one JSON line with all rep times and the min (the sandbox host
shows multi-second scheduling stalls at random moments — min-of-N is
the sustained-capability estimate; all samples are reported).

A warmup replay (100k events) runs first so JIT compilation does not
contaminate rep 1.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from investigraph_etl_spark.changelog import write_changelog  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402
from investigraph_etl_spark.sources.lake import HashLakeTable  # noqa: E402
from investigraph_etl_spark.streaming.tailer import (  # noqa: E402
    change_schema,
    prepare_batch,
    target_schema,
)


def main() -> None:
    cores, log_dir, work, n_events = (
        int(sys.argv[1]),
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    spark = get_spark(
        f"replay{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )

    # --- warmup: full code path, small log
    warm_log = f"{work}/warm_log"
    write_changelog(warm_log, 100_000, chunk_size=25_000, seed=7, n_docs=10_000)
    warm_dir = f"{work}/warm_lake_{cores}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    warm_lake = HashLakeTable.create(spark, warm_dir, target_schema(), num_buckets=32)
    warm_lake.merge(
        prepare_batch(spark.read.schema(change_schema()).parquet(warm_log)), 0
    )

    events = spark.read.schema(change_schema()).parquet(log_dir)
    times, final_rows = [], None
    for i in range(reps):
        d = f"{work}/lake_{cores}_{i}"
        shutil.rmtree(d, ignore_errors=True)
        lake = HashLakeTable.create(spark, d, target_schema(), num_buckets=32)
        t0 = time.monotonic()
        lake.merge(prepare_batch(events), 0)
        times.append(round(time.monotonic() - t0, 2))
        if final_rows is None:
            final_rows = lake.read().count()
    best = min(times)
    print(
        json.dumps(
            {
                "cores": cores,
                "times": times,
                "seconds": best,
                "events_per_sec": round(n_events / best, 1),
                "final_rows": final_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
