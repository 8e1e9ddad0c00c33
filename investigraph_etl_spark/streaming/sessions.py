"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 — the one streaming shape
``foreachBatch`` cannot express: per-key state that must OUTLIVE a
micro-batch).

Batch sessionization (the ``sessionize`` gate query) is a window over
the whole history; a stream cannot window history it hasn't seen, so
the operator keeps per-key state ``(session_start, last_ts,
n_events)`` and:

* folds each micro-batch's rows (sorted by event time, vectorized
  pandas inside the state function) into the open session, emitting a
  CLOSED session row whenever a gap > ``gap_sec`` splits the stream;
* closes idle sessions by **event-time timeout**: when the watermark
  passes ``last_ts + gap``, no earlier event can arrive (late rows
  beyond the watermark are dropped by Spark), so the open session is
  final — emitted and the state removed.

Emitted rows are therefore exactly the sessions the equivalent batch
window query would produce, delivered incrementally.  State size is
O(active keys), not O(events): the 100 TB design point — history
never accumulates, only one open session per key.

Scale notes: state rows shuffle by key (same partitioning story as
any keyed agg; salt upstream for pathological single-key streams);
the state function is Arrow-batched pandas, no per-row Python in the
hot path beyond the per-key fold.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events int"
)
_STATE_SCHEMA = "session_start double, last_ts double, n_events int"


def _fold_sessions(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    *,
    gap_sec: float,
) -> Iterator[pd.DataFrame]:
    """Per-key state fold.  Timestamps are carried in state as epoch
    seconds (GroupState tuples cannot hold pandas Timestamps)."""
    (user_id,) = key
    closed: list[tuple[float, float, int]] = []

    if state.hasTimedOut:
        # watermark passed last_ts + gap: the open session is final
        s0, s1, n = state.get
        closed.append((s0, s1, n))
        state.remove()
    else:
        cur = state.get if state.exists else None
        ts = (
            pd.concat([p["ts"] for p in pdfs])
            .sort_values()
            .astype("int64")
            .to_numpy()
            / 1e9
        )
        for t in ts:
            if cur is None:
                cur = (float(t), float(t), 1)
            elif t - cur[1] <= gap_sec:
                cur = (cur[0], float(t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (float(t), float(t), 1)
        if cur is not None:
            state.update(cur)
            # close when the watermark passes the gap horizon
            state.setTimeoutTimestamp(int((cur[1] + gap_sec) * 1000) + 1)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_sec: float = 1800.0,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: input stream → stream of CLOSED
    sessions ``(user_id, session_start, session_end, n_events)``.

    ``events`` must be a streaming DataFrame; rows later than
    ``watermark_delay`` behind the max event time are dropped (the
    standard event-time contract), everything else lands in exactly
    the session the batch window query would assign."""

    def fold(key, pdfs, state):
        return _fold_sessions(key, pdfs, state, gap_sec=gap_sec)

    prepared = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark_delay)
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
