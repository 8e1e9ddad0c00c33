"""Per-commit phase breakdown of the sustained incremental-ingest path.

Replays a changelog as N sequential merge commits into one lake at a
given core count and prints each commit's phase timings (plan / write /
compact) from merge()'s stats — finds where the per-commit floor lives.

Usage: python tools/profile_commit.py <cores> <n_events> <batches>
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
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
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    batches = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark(
        f"profc{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )
    work = tempfile.mkdtemp(prefix="profcommit_")
    log_dir = f"{work}/log"
    write_changelog(
        log_dir, n_events, chunk_size=max(n_events // 64, 1), seed=42,
        n_docs=max(n_events // 10, 100), skew_frac=0.05, max_tok=64,
    )
    chunk_files = sorted(str(p) for p in pathlib.Path(log_dir).glob("*.parquet"))
    per = (len(chunk_files) + batches - 1) // batches
    groups = [chunk_files[i : i + per] for i in range(0, len(chunk_files), per)]

    # warmup commit in a scratch lake (JIT/codegen)
    warm = HashLakeTable.create(spark, f"{work}/warm", target_schema(), num_buckets=32)
    warm.merge(prepare_batch(
        spark.read.schema(change_schema()).parquet(*groups[0])), 0)

    import os

    reduce_batch = os.environ.get("PROF_REDUCE", "0") == "1"
    compact_mode = os.environ.get("PROF_COMPACT", "async")
    lake = HashLakeTable.create(spark, f"{work}/lake", target_schema(), num_buckets=32)
    total0 = time.monotonic()
    for bid, group in enumerate(groups):
        t0 = time.monotonic()
        batch = spark.read.schema(change_schema()).parquet(*group)
        stats = lake.merge(
            prepare_batch(batch), bid,
            reduce_batch=reduce_batch, compact_mode=compact_mode,
        )
        wall = round(time.monotonic() - t0, 3)
        t = stats.get("timings", {})
        other = round(wall - sum(t.values()), 3)
        print(json.dumps({"commit": bid, "wall": wall, **t, "other": other,
                          "compacted": stats.get("compacted_buckets", 0)}))
    lake.wait_for_compaction()
    total = round(time.monotonic() - total0, 2)
    print(json.dumps({"total_sec": total, "batches": len(groups),
                      "events_per_sec": round(n_events / total, 1)}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
