"""investigraph_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine with the query & data-processing capabilities of
``dataresearchcenter/investigraph-etl`` (the reference), re-based on
Spark DataFrames / Structured Streaming / Arrow-vectorized UDFs.

The reference is a single-process generator-pipelined ETL that turns
tabular sources into keyed, merged entity fragments
(see ``/root/reference/investigraph/pipeline.py``).  This engine keeps
its semantics — per-record normalization, keyed fragment merge
(last-writer-wins), incremental skip, deterministic IDs, statistics,
idempotent commits — and re-expresses execution as:

* batch replay:   ``read → normalize (vectorized) → LWW dedup → MERGE``
* streaming tail: ``readStream → foreachBatch(normalize → LWW → MERGE)``

over an Iceberg-style lake table of pre-tokenized training sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``.
"""

from investigraph_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
