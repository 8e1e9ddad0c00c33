"""Stage-decomposed replay profile in a fresh process.
Usage: python tools/profile_replay.py <cores> <log_dir>"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from investigraph_etl_spark.operators.normalize import normalize_events  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402
from investigraph_etl_spark.streaming.tailer import change_schema  # noqa: E402


def main() -> None:
    cores, log_dir = int(sys.argv[1]), sys.argv[2]
    spark = get_spark(
        f"prof{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )
    ev = spark.read.schema(change_schema()).parquet(log_dir)

    def timed(label, thunk, warm=True):
        if warm:
            thunk()
        t0 = time.monotonic()
        thunk()
        print(json.dumps({"cores": cores, "stage": label,
                          "sec": round(time.monotonic() - t0, 2)}))

    # 1 scan only
    timed("scan_count", lambda: ev.count())
    # 2 scan + materialize payload (noop)
    timed("scan_noop", lambda: ev.write.format("noop").mode("overwrite").save())
    # 3 + normalize
    norm = normalize_events(ev).drop("event_time")
    timed("normalize_noop", lambda: norm.write.format("noop").mode("overwrite").save())
    # 4 narrow winners agg
    winners = norm.select("doc_id", "event_sequence").groupBy("doc_id").agg(
        F.max("event_sequence").alias("event_sequence")
    )
    timed("winners_count", lambda: winners.count())
    # 5 semi join (full LWW)
    lww = norm.join(winners, ["doc_id", "event_sequence"], "left_semi")
    timed("lww_noop", lambda: lww.write.format("noop").mode("overwrite").save())
    # 6 + bucket shuffle + parquet write
    out = tempfile.mkdtemp(prefix=f"profout{cores}_")
    lww2 = lww.withColumn("_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(32)))

    def write():
        lww2.repartition(32, "_bucket").write.mode("overwrite").partitionBy(
            "_bucket"
        ).parquet(f"{out}/w")

    timed("merge_write", write)


if __name__ == "__main__":
    main()
