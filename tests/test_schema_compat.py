"""Schema-compatibility gate on the merge path: additive promote,
absent null-fill, lossless-widening accept, breaking reject at the
DRIVER (named column, before any job) — the Iceberg type-promotion
rules applied batch→table.  Reference analog: none (the reference
re-reads whole files and has no stored-schema contract); the north
rule's additive mid-stream evolution is the tested "evolve" mode."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from investigraph_etl_spark.sources.lake import (
    HashLakeTable,
    SchemaCompatibilityError,
    check_schema_compatibility,
)


def _st(*fields):
    return StructType([StructField(n, t) for n, t in fields])


# ---------------------------------------------------------- unit level


def test_classification_matrix():
    table = _st(
        ("doc_id", StringType()),
        ("tokens", ArrayType(LongType())),
        ("n_tok", LongType()),
    )
    batch = _st(
        ("doc_id", StringType()),
        ("tokens", ArrayType(IntegerType())),  # widen into long: ok
        ("lang", StringType()),  # new: additive
        ("event_sequence", LongType()),  # meta: exempt
    )
    out = check_schema_compatibility(table, batch, meta={"event_sequence"})
    assert out["additive"] == ["lang"]
    assert out["missing"] == ["n_tok"]
    assert out["breaking"] == []


def test_narrowing_and_kind_change_are_breaking():
    table = _st(("a", IntegerType()), ("b", StringType()))
    batch = _st(("a", LongType()), ("b", IntegerType()))
    out = check_schema_compatibility(table, batch)
    assert {n for n, _, _ in out["breaking"]} == {"a", "b"}
    # and the directions are reported batch→table
    assert ("a", "bigint", "int") in out["breaking"]


def test_nested_array_element_narrowing_is_breaking():
    table = _st(("tokens", ArrayType(IntegerType())))
    batch = _st(("tokens", ArrayType(LongType())))
    assert check_schema_compatibility(table, batch)["breaking"]


# --------------------------------------------------- merge integration


@pytest.fixture()
def lake(spark, tmp_path):
    schema = _st(
        ("doc_id", StringType()),
        ("tokens", ArrayType(IntegerType())),
        ("n_tok", LongType()),
        ("source", StringType()),
    )
    return HashLakeTable.create(spark, str(tmp_path / "lake"), schema, num_buckets=4)


def _batch(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df


_OK_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok long, source string, "
    "event_sequence long, op string"
)


def test_widening_batch_is_accepted_and_upcast(spark, lake):
    # n_tok arrives as int (table stores long): lossless widening
    rows = [("d1", [1, 2], 2, "s", 1, "insert")]
    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "event_sequence long, op string"
    )
    lake.merge(_batch(spark, rows, schema), 0)
    got = lake.read().select("doc_id", "n_tok").collect()
    assert [(r["doc_id"], r["n_tok"]) for r in got] == [("d1", 2)]
    # stored type is unchanged — the batch upcast, the table did not narrow
    assert lake.schema["n_tok"].dataType == LongType()


def test_breaking_type_change_raises_at_driver(spark, lake):
    # producer switched n_tok to string — must fail fast, named
    rows = [("d1", [1], "oops", "s", 1, "insert")]
    schema = (
        "doc_id string, tokens array<int>, n_tok string, source string, "
        "event_sequence long, op string"
    )
    with pytest.raises(SchemaCompatibilityError, match="n_tok"):
        lake.merge(_batch(spark, rows, schema), 0)
    assert lake.read().count() == 0  # nothing committed


def test_tokens_element_narrowing_raises(spark, lake):
    rows = [("d1", [2**40], 1, "s", 1, "insert")]
    schema = (
        "doc_id string, tokens array<long>, n_tok long, source string, "
        "event_sequence long, op string"
    )
    with pytest.raises(SchemaCompatibilityError, match="tokens"):
        lake.merge(_batch(spark, rows, schema), 0)


def test_missing_required_column_raises(spark, lake):
    rows = [("d1", [1], 1, "s", 1)]
    schema = "doc_id string, tokens array<int>, n_tok long, source string, event_sequence long"
    with pytest.raises(SchemaCompatibilityError, match="op"):
        lake.merge(_batch(spark, rows, schema), 0)


def test_strict_policy_rejects_additive_and_absent(spark, lake):
    extra = [("d1", [1], 1, "s", "en", 1, "insert")]
    extra_schema = (
        "doc_id string, tokens array<int>, n_tok long, source string, "
        "lang string, event_sequence long, op string"
    )
    with pytest.raises(SchemaCompatibilityError, match="strict"):
        lake.merge(_batch(spark, extra, extra_schema), 0, schema_policy="strict")
    absent = [("d1", [1], 1, 1, "insert")]
    absent_schema = (
        "doc_id string, tokens array<int>, n_tok long, "
        "event_sequence long, op string"
    )
    with pytest.raises(SchemaCompatibilityError, match="strict"):
        lake.merge(_batch(spark, absent, absent_schema), 0, schema_policy="strict")
    # exact schema passes under strict
    ok = [("d1", [1], 1, "s", 1, "insert")]
    lake.merge(_batch(spark, ok, _OK_SCHEMA), 0, schema_policy="strict")
    assert lake.read().count() == 1


def test_evolve_still_promotes_and_nullfills(spark, lake):
    # additive lang column + absent source column in one batch
    rows = [("d1", [1], 1, "en", 5, "insert")]
    schema = (
        "doc_id string, tokens array<int>, n_tok long, lang string, "
        "event_sequence long, op string"
    )
    lake.merge(_batch(spark, rows, schema), 0)
    got = lake.read().toPandas()
    assert list(got["lang"]) == ["en"]
    assert pd.isna(got["source"]).all()
    assert "lang" in [f.name for f in lake.schema.fields]
