"""Compare semi-join strategies for the LWW at a core count.
Usage: python tools/profile_join.py <cores> <log_dir>"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from investigraph_etl_spark.operators.normalize import normalize_events  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402
from investigraph_etl_spark.streaming.tailer import change_schema  # noqa: E402


def main() -> None:
    cores, log_dir = int(sys.argv[1]), sys.argv[2]
    spark = get_spark(
        f"pj{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": "48g"},
    )
    ev = spark.read.schema(change_schema()).parquet(log_dir)
    norm = normalize_events(ev).drop("event_time")
    winners = norm.select("doc_id", "event_sequence").groupBy("doc_id").agg(
        F.max("event_sequence").alias("event_sequence")
    )

    def timed(label, df):
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        print(json.dumps({"cores": cores, "variant": label,
                          "sec": round(time.monotonic() - t0, 2)}))

    timed("aqe_default", norm.join(winners, ["doc_id", "event_sequence"], "left_semi"))
    timed("broadcast", norm.join(F.broadcast(winners), ["doc_id", "event_sequence"], "left_semi"))
    timed("shuffle_hash", norm.join(winners.hint("shuffle_hash"), ["doc_id", "event_sequence"], "left_semi"))
    timed("merge_join", norm.join(winners.hint("merge"), ["doc_id", "event_sequence"], "left_semi"))
    # single-key long join: doc hashed to long first (cheaper hashing)
    nk = norm.withColumn("_k", F.xxhash64("doc_id", "event_sequence"))
    wk = winners.select(F.xxhash64("doc_id", "event_sequence").alias("_k"))
    timed("bcast_longkey", nk.join(F.broadcast(wk), "_k", "left_semi").drop("_k"))


if __name__ == "__main__":
    main()
