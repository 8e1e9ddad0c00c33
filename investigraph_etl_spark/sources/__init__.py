"""Sources & sinks (SURVEY.md §2.1): the lake table (MERGE target),
tabular readers, and the changelog stream source."""

from investigraph_etl_spark.sources.lake import LakeTable

__all__ = ["LakeTable"]
