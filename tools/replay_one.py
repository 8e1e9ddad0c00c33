"""Measure CDC replay throughput at a given core count, isolated in a
fresh process (fresh JVM — JIT state cannot leak between core counts).

Usage: python tools/replay_one.py <cores> <log_dir> <work_dir> <n_events> \
           [reps] [batches]
Prints one JSON line with all rep times and the min (the sandbox host
shows multi-second scheduling stalls at random moments — min-of-N is
the sustained-capability estimate; all samples are reported).

``batches`` > 1 replays the log as that many sequential merge commits
into ONE lake (the sustained incremental-ingest shape; exercises the
merge-on-read delta path + auto-compaction) instead of one bulk merge.

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
    batches = int(sys.argv[6]) if len(sys.argv) > 6 else 1
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

    import pathlib

    chunk_files = sorted(str(p) for p in pathlib.Path(log_dir).glob("*.parquet"))
    groups: list[list[str]]
    if batches <= 1 or len(chunk_files) < batches:
        groups = [chunk_files]
    else:
        per = (len(chunk_files) + batches - 1) // batches
        groups = [chunk_files[i : i + per] for i in range(0, len(chunk_files), per)]

    times, final_rows = [], None
    for i in range(reps):
        d = f"{work}/lake_{cores}_b{batches}_{i}"
        shutil.rmtree(d, ignore_errors=True)
        lake = HashLakeTable.create(spark, d, target_schema(), num_buckets=32)
        t0 = time.monotonic()
        if len(groups) == 1:
            # bulk replay: events/doc ≫ 1 → the in-batch reduce pays
            # for itself in write volume; keep it
            batch = spark.read.schema(change_schema()).parquet(*groups[0])
            lake.merge(prepare_batch(batch), 0)
        else:
            # sustained micro-batch ingest: low in-batch dup ratio →
            # skip the reduce (read-time LWW subsumes it) and fold
            # deltas on the background thread, overlapped with the
            # next commits' write jobs.  The final wait is inside the
            # timed region: steady state must include compaction.
            for bid, group in enumerate(groups):
                batch = spark.read.schema(change_schema()).parquet(*group)
                lake.merge(
                    prepare_batch(batch), bid,
                    reduce_batch=False, compact_mode="async",
                )
            lake.wait_for_compaction()
        times.append(round(time.monotonic() - t0, 2))
        if final_rows is None:
            final_rows = lake.read().count()
    best = min(times)
    print(
        json.dumps(
            {
                "cores": cores,
                "batches": len(groups),
                "times": times,
                "seconds": best,
                "events_per_sec": round(n_events / best, 1),
                "final_rows": final_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
