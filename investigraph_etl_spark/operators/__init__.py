"""Engine operators (SURVEY.md §2): LWW dedup, merge-apply, dedup
families, similarity search, text analysis, multimodal plumbing."""

from investigraph_etl_spark.operators.lww import lww_dedup
from investigraph_etl_spark.operators.normalize import normalize_events

__all__ = ["lww_dedup", "normalize_events"]
