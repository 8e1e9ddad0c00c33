"""Custom (bring-your-own-code) transform surface (SURVEY.md §2.10).

The reference's plug-in system lets a user write
``handle(ctx, record, ix) -> Generator[StatementEntity]`` — one record
fans out to N entities (the ec_meetings fixture emits PublicBody,
Persons, Organizations, Address, Event, Memberships per row —
/root/reference/tests/fixtures/ec_meetings/transform.py:163-168;
dispatch /root/reference/investigraph/model/stage.py:76-83).

Spark translation: the UDTF pattern — an Arrow-batched ``mapInPandas``
where the user function maps ONE record dict to a list of statement
dicts.  The engine handles batching, schema, and the fan-out explode;
user code stays record-at-a-time *in interface* but executes batched.
Handler resolution keeps the reference's ``module:function`` /
``path/to/file.py:function`` string convention (util.py:47-69).
"""

from __future__ import annotations

import importlib
import importlib.util
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

STATEMENT_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("schema", StringType(), False),
        StructField("prop", StringType(), False),
        StructField("value", StringType(), True),
        StructField("dataset", StringType(), False),
    ]
)

TransformFn = Callable[[dict[str, Any]], list[dict[str, Any]]]


def resolve_handler(spec: str) -> Callable:
    """``pkg.module:func`` or ``/path/file.py:func`` → callable
    (reference util.py:47-69 convention)."""
    path, _, func = spec.rpartition(":")
    if path.endswith(".py"):
        mod_spec = importlib.util.spec_from_file_location("_custom_handler", path)
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
    else:
        mod = importlib.import_module(path)
    return getattr(mod, func)


def entity_statements(
    entity_id: str, schema: str, props: dict[str, Any], dataset: str
) -> list[dict[str, Any]]:
    """Helper for user transforms: one entity dict → statement rows,
    with the reference's add-time cleaning (strip, drop empty —
    util.py:41-43, 72-76)."""
    rows = []
    for prop, values in props.items():
        if not isinstance(values, (list, tuple)):
            values = [values]
        for v in values:
            if v is None:
                continue
            v = str(v).strip()
            if not v:
                continue
            rows.append(
                {
                    "id": entity_id,
                    "schema": schema,
                    "prop": prop,
                    "value": v,
                    "dataset": dataset,
                }
            )
    return rows


def apply_custom_extract(
    spark,
    fn: Callable | str,
    sources: list | None = None,
    *,
    schema: StructType | str | None = None,
    sample_source_ix: int = 0,
) -> DataFrame:
    """Custom *extract* plug-point (reference ``ExtractStage.handle(ctx)
    -> RecordGenerator``, model/stage.py:61-73; fixture
    tests/fixtures/custom.py:16-19): a registered handler *produces*
    records instead of the built-in readers.

    Spark translation: one task per source — the source descriptors
    (uri, name, options) are parallelized, and each executor runs
    ``handler(source_dict)`` inside ``mapInPandas``, yielding record
    dicts that become rows.  Handlers therefore run cluster-side and in
    parallel across sources; a single-source extract degrades to one
    task (exactly the reference's single-process behavior).

    ``schema``: output schema; if None, the handler runs once
    driver-side against ``sources[sample_source_ix]`` to discover the
    column set (all strings — the reference's extract yields CSV-style
    dicts).  Pass an explicit schema for typed or non-uniform output.
    """
    handler = resolve_handler(fn) if isinstance(fn, str) else fn
    descs = [
        {
            "uri": getattr(s, "uri", None) or s.get("uri"),
            "name": getattr(s, "name", None)
            or (s.get("name") if isinstance(s, dict) else None),
        }
        for s in (sources or [{}])
    ]
    if schema is None:
        first = next(iter(handler(descs[sample_source_ix])), None)
        if first is None:
            raise ValueError(
                "custom extract produced no records for schema discovery; "
                "pass schema= explicitly"
            )
        schema = StructType(
            [StructField(k, StringType(), True) for k in first]
        )
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    out_cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for desc in pdf.to_dict("records"):
                recs = [
                    {c: r.get(c) for c in out_cols} for r in handler(desc)
                ]
                yield (
                    pd.DataFrame(recs, columns=out_cols)
                    if recs
                    else pd.DataFrame(columns=out_cols)
                )

    src = spark.createDataFrame(
        pd.DataFrame(descs), schema="uri string, name string"
    ).repartition(len(descs))
    return src.mapInPandas(run, schema)


def apply_custom_transform(
    records: DataFrame,
    fn: TransformFn | str,
    *,
    output_schema: StructType = STATEMENT_SCHEMA,
) -> DataFrame:
    """Run a record→entities fan-out transform, Arrow-batched.

    ``fn`` gets each record as a plain dict (reference contract,
    docs/stages/transform.md) and returns a list of output dicts.
    Interface is per-record; execution is per-Arrow-batch — the hot
    loop never crosses Python↔JVM per row.
    """
    handler = resolve_handler(fn) if isinstance(fn, str) else fn
    out_cols = [f.name for f in output_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for rec in pdf.to_dict("records"):
                out.extend(handler(rec))
            yield (
                pd.DataFrame(out, columns=out_cols)
                if out
                else pd.DataFrame(columns=out_cols)
            )

    return records.mapInPandas(run, output_schema)
