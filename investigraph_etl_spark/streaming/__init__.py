"""Streaming layer (SURVEY.md §2.9): changelog tailer, exactly-once
foreachBatch merge-apply, per-microbatch metrics."""

from investigraph_etl_spark.streaming.tailer import (
    change_schema,
    prepare_batch,
    replay_batch,
    tail_changelog,
)

__all__ = ["change_schema", "prepare_batch", "replay_batch", "tail_changelog"]
