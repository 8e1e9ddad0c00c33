"""Stateful streaming sessionization (applyInPandasWithState): closed
sessions match the batch-window oracle, state survives micro-batch
boundaries, idle sessions close by event-time timeout."""

from __future__ import annotations

import pandas as pd
import pytest

from investigraph_etl_spark.streaming.sessions import sessionize_stream

GAP = 1000.0


def _oracle_sessions(rows):
    """Driver-side reference: batch sessionize per user over epoch-sec
    rows [(user, t), ...] → [(user, start, end, n), ...]."""
    out = []
    by_user: dict[int, list[float]] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        cur = [ts[0], ts[0], 1]
        for t in ts[1:]:
            if t - cur[1] <= GAP:
                cur = [cur[0], t, cur[2] + 1]
            else:
                out.append((u, cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
        out.append((u, cur[0], cur[1], cur[2]))
    return out


def test_stream_sessions_match_batch_oracle(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    # per-user event streams: two gap-separated sessions each, spread
    # across files so sessions straddle micro-batch boundaries
    # start at t>=1: rows at or below the INITIAL watermark (epoch 0)
    # are dropped by the stateful operator's late-row filter
    data_rows = [
        (1, 1.0), (1, 100.0), (2, 50.0),
        (1, 150.0), (2, 900.0),            # still the same sessions
        (1, 5000.0), (2, 7000.0),          # gap > 1000 → new sessions
        (1, 5400.0),
    ]
    flush1 = [(9, 1_000_000.0)]  # advances watermark past all real data
    flush2 = [(9, 2_000_000.0)]  # lets flush1's watermark take effect
    files = [data_rows[:3], data_rows[3:5], data_rows[5:], flush1, flush2]
    for i, chunk in enumerate(files):
        pd.DataFrame(
            {
                "user_id": [u for u, _ in chunk],
                "ts": [pd.Timestamp(t, unit="s") for _, t in chunk],
            }
        ).to_parquet(
            src / f"part-{i:03d}.parquet",
            coerce_timestamps="us",  # Spark timestamp is µs, pandas ns
            allow_truncated_timestamps=True,
        )

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sessions = sessionize_stream(
        stream, gap_sec=GAP, watermark_delay="10 seconds"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (
            r["user_id"],
            r["session_start"].timestamp(),
            r["session_end"].timestamp(),
            r["n_events"],
        )
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # expectation: every oracle session over the real data closes —
    # earlier ones inline by gap-split, the final per-user ones by
    # event-time timeout once flush1's watermark lands.  availableNow
    # runs a final timeout pass after the last batch, so flush1's own
    # session closes too; only flush2's (nothing ever passes its gap
    # horizon) stays open in state.
    expected = set(_oracle_sessions(data_rows + flush1))
    assert got == expected


def test_session_state_survives_query_restart(spark, tmp_path):
    """Open-session state lives in the checkpoint, not the query: a
    second query over the same checkpoint must close sessions the
    first query left open."""
    src = tmp_path / "src2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")

    def write(i, rows):
        pd.DataFrame(
            {
                "user_id": [u for u, _ in rows],
                "ts": [pd.Timestamp(t, unit="s") for _, t in rows],
            }
        ).to_parquet(
            src / f"part-{i:03d}.parquet",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    out = str(tmp_path / "sessions_out")

    def drain(name):
        # file sink (memory sink cannot recover from a checkpoint)
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            sessionize_stream(stream, gap_sec=GAP, watermark_delay="10 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["user_id"], r["session_start"].timestamp(), r["n_events"])
            for r in spark.read.parquet(out).collect()
        }

    write(0, [(5, 10.0), (5, 500.0)])
    first = drain("restart_a")
    assert first == set()  # session still open — nothing emitted

    write(1, [(9, 1_000_000.0)])
    write(2, [(9, 2_000_000.0)])
    second = drain("restart_b")
    # the session opened before the restart closes afterwards, intact
    assert second == {(5, 10.0, 2), (9, 1_000_000.0, 1)}
