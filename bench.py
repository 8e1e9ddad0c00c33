#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Phase 1 — headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Phase 2 — CDC merge-apply throughput: a deterministic synthetic
changelog replayed through normalize → LWW → lake MERGE at TWO
parallelism levels (local[8] vs local[32]) on identical input — the
sandbox proxy for the north rule's N vs 4N cluster-size criterion.
Reports events/sec at both + scaling efficiency, and refreshes
``BENCH.md``.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "cdc": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "filter_project",
    "groupby_count",
    "lww_latest_event",
    "cdc_replay_final_state",
    "dedup_exact",
    "revenue_by_nation",
    "wordcount",
    "json_extract",
    "window_running_total",
    "sessionize",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "token_counts",
    "knn_bruteforce",
    "minhash_lsh",
    "simhash_near_dups",
    "lsh_knn",
]

N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
CHUNKS = 64  # ≥2 scan tasks per core at local[32]


def _fresh_session(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        # Spark leaves the stopped context cached briefly
        time.sleep(1)
    from investigraph_etl_spark.session import get_spark

    return get_spark(
        f"bench_local_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.driver.memory": "48g"},
    )


def run_headline(sf_dir: str, cores: int) -> dict[str, float]:
    import __spark_entry__ as entrymod

    spark = _fresh_session(cores)
    spark.range(10_000).selectExpr("sum(id)").collect()  # JVM/codegen warmup
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        # noop sink: full plan executes, nothing is kept — measures the
        # query, not result serialization
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def gen_changelog(path: str) -> None:
    from investigraph_etl_spark.changelog import write_changelog

    write_changelog(
        path,
        N_EVENTS,
        chunk_size=N_EVENTS // CHUNKS,
        seed=42,
        n_docs=max(N_EVENTS // 10, 100),
        skew_frac=0.05,
        max_tok=64,
    )


def run_replay(cores: int, log_dir: str, work: str) -> dict:
    """Batch-mode full replay (the merge-apply stage under test)."""
    from investigraph_etl_spark.sources.lake import HashLakeTable
    from investigraph_etl_spark.streaming.tailer import (
        change_schema,
        replay_batch,
        target_schema,
    )

    spark = _fresh_session(cores)
    lake_dir = f"{work}/lake_{cores}"
    shutil.rmtree(lake_dir, ignore_errors=True)
    lake = HashLakeTable.create(spark, lake_dir, target_schema(), num_buckets=32)
    events = spark.read.schema(change_schema()).parquet(log_dir)
    t0 = time.monotonic()
    replay_batch(events, lake)
    dt = time.monotonic() - t0
    n_final = lake.read().count()
    return {
        "cores": cores,
        "seconds": round(dt, 2),
        "events_per_sec": round(N_EVENTS / dt, 1),
        "final_rows": n_final,
    }


def write_bench_md(result: dict) -> None:
    cdc = result["cdc"]
    lo, hi = cdc["runs"][0], cdc["runs"][1]
    lines = [
        "# BENCH — measured numbers (refreshed by bench.py)",
        "",
        f"- data: sf={result['sf']} headline tables; CDC replay of "
        f"{N_EVENTS:,} synthetic change events (seed 42, 5% hot-key skew)",
        "",
        "## CDC merge-apply throughput & scaling (north rule)",
        "",
        "Same job, same input, two parallelism levels (sandbox proxy for",
        "N vs 4N executor clusters):",
        "",
        "| parallelism | seconds | events/sec |",
        "|---|---|---|",
        f"| local[{lo['cores']}] | {lo['seconds']} | {lo['events_per_sec']:,} |",
        f"| local[{hi['cores']}] | {hi['seconds']} | {hi['events_per_sec']:,} |",
        "",
        f"**speedup {lo['cores']}→{hi['cores']} cores: "
        f"{cdc['speedup']}× · scaling efficiency: {cdc['efficiency']}** "
        f"(target ≥ 0.8)",
        "",
        "## Headline queries (seconds, local[%s], sf=%s)" % (result["cores"], result["sf"]),
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in result["queries"].items()]
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as fh:
        fh.write("\n".join(lines))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    timings = run_headline(sf_dir, cores)

    work = tempfile.mkdtemp(prefix="bench_cdc_")
    log_dir = f"{work}/changelog"
    gen_changelog(log_dir)
    runs = [run_replay(8, log_dir, work), run_replay(32, log_dir, work)]
    assert runs[0]["final_rows"] == runs[1]["final_rows"], "replay differs by cores!"
    speedup = runs[0]["seconds"] / runs[1]["seconds"]
    efficiency = speedup / (runs[1]["cores"] / runs[0]["cores"])
    cdc = {
        "n_events": N_EVENTS,
        "runs": runs,
        "speedup": round(speedup, 2),
        "efficiency": round(efficiency, 3),
    }
    shutil.rmtree(work, ignore_errors=True)

    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
        "cdc": cdc,
    }
    write_bench_md(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
