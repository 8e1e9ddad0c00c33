"""Dataset statistics + entity export (SURVEY.md §2.4 A3, §2.1 S7/S8).

Reference: a single pass over merged entities computes entity count,
per-schema counts, country coverage → ``index.json`` /
``statistics.json`` (/root/reference/investigraph/logic/export.py:64-79);
entities stream to line-delimited FtM JSON (export.py:63-71).

Spark translation: one aggregation pass over the statement/entity
table (partial+final hash agg — the Collector's single pass, but
distributed), plus a JSON sink.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_stats(statements: DataFrame) -> dict:
    """Statistics over statement rows ``(id, schema, prop, value,
    dataset)`` — the Collector analog."""
    row = statements.select(
        F.countDistinct("id").alias("entity_count"),
        F.count(F.lit(1)).alias("statement_count"),
        F.countDistinct("prop").alias("property_count"),
    ).first()
    schemata = [
        {"name": r["schema"], "count": r["n"]}
        for r in statements.groupBy("schema")
        .agg(F.countDistinct("id").alias("n"))
        .orderBy("schema")
        .collect()
    ]
    countries = [
        {"code": r["value"], "count": r["n"]}
        for r in statements.filter(F.col("prop").isin("country", "jurisdiction"))
        .groupBy("value")
        .agg(F.countDistinct("id").alias("n"))
        .orderBy("value")
        .collect()
    ]
    return {
        "entity_count": row["entity_count"],
        "statement_count": row["statement_count"],
        "property_count": row["property_count"],
        "schemata": schemata,
        "countries": countries,
    }


def schema_counts(statements: DataFrame) -> DataFrame:
    """Per-schema entity counts as a DataFrame (oracle-checkable)."""
    return statements.groupBy("schema").agg(
        F.countDistinct("id").alias("n_entities"),
        F.count(F.lit(1)).alias("n_statements"),
    )


def export_entities_json(entities: DataFrame, path: str) -> int:
    """Write merged entities as line-delimited FtM-shaped JSON
    (export.py:63-71 / the ``entities.ftm.json`` golden format).
    Returns the entity count."""
    out = entities.select(
        F.to_json(
            F.struct(
                "id",
                "schema",
                "properties",
                "datasets",
                F.array().cast("array<string>").alias("referents"),
            )
        ).alias("value")
    )
    out.write.mode("overwrite").text(path)
    return entities.count()


def write_index_json(stats: dict, path: str, dataset: str) -> None:
    """``index.json`` analog (export.py:73-79)."""
    with open(path, "w") as fh:
        json.dump({"name": dataset, **stats}, fh, indent=2)
