"""Measure one CDC replay at a given core count in a fresh process.

Usage: python tools/replay_one.py <cores> <log_dir> <work_dir> <n_events>
Prints one JSON line.  A warmup replay (5% of events) runs first so JIT
compilation doesn't contaminate the measurement.
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
    replay_batch,
    target_schema,
)


def main() -> None:
    cores, log_dir, work, n_events = (
        int(sys.argv[1]),
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    spark = get_spark(
        f"replay{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )

    # --- warmup: exercise the full code path on a small log
    warm_log = f"{work}/warm_log"
    write_changelog(warm_log, 100_000, chunk_size=25_000, seed=7, n_docs=10_000)
    warm_lake_dir = f"{work}/warm_lake_{cores}"
    shutil.rmtree(warm_lake_dir, ignore_errors=True)
    warm_lake = HashLakeTable.create(
        spark, warm_lake_dir, target_schema(), num_buckets=32
    )
    replay_batch(spark.read.schema(change_schema()).parquet(warm_log), warm_lake)

    # --- measured replay
    lake_dir = f"{work}/lake_{cores}"
    shutil.rmtree(lake_dir, ignore_errors=True)
    lake = HashLakeTable.create(spark, lake_dir, target_schema(), num_buckets=32)
    events = spark.read.schema(change_schema()).parquet(log_dir)
    t0 = time.monotonic()
    replay_batch(events, lake)
    dt = time.monotonic() - t0
    n_final = lake.read().count()
    print(
        json.dumps(
            {
                "cores": cores,
                "seconds": round(dt, 2),
                "events_per_sec": round(n_events / dt, 1),
                "final_rows": n_final,
            }
        )
    )


if __name__ == "__main__":
    main()
