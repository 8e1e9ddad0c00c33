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


def test_wider_batch_classifies_as_promote_kind_change_as_breaking():
    # round-5 (ADVICE r4): a batch WIDER than the stored type is a
    # table-side promotion, not a breaking change; a kind change stays
    # breaking.  Directions are reported batch→table in both lists.
    table = _st(("a", IntegerType()), ("b", StringType()))
    batch = _st(("a", LongType()), ("b", IntegerType()))
    out = check_schema_compatibility(table, batch)
    assert out["promote"] == [("a", "bigint", "int")]
    assert out["breaking"] == [("b", "int", "string")]


def test_nested_array_element_widening_is_promote():
    table = _st(("tokens", ArrayType(IntegerType())))
    batch = _st(("tokens", ArrayType(LongType())))
    out = check_schema_compatibility(table, batch)
    assert out["promote"] == [("tokens", "array<bigint>", "array<int>")]
    assert not out["breaking"]


def test_nested_struct_field_add_is_its_own_category():
    from pyspark.sql.types import StructType as ST

    table = _st(("meta", ST([StructField("w", IntegerType())])))
    batch = _st(
        ("meta", ST([StructField("w", IntegerType()), StructField("h", IntegerType())]))
    )
    out = check_schema_compatibility(table, batch)
    assert [n for n, _, _ in out["nested"]] == ["meta"]
    assert not out["breaking"] and not out["promote"]


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


def test_tokens_element_widening_promotes_stored_type(spark, lake):
    # round-5 (ADVICE r4): producer widened tokens to array<long> —
    # evolve mode promotes the STORED column type (schema-only commit;
    # pre-promotion int32 files widen at scan time), so a value past
    # 2^31 survives alongside rows written before the promotion.
    lake.merge(_batch(spark, [("d0", [5], 1, "s", 1, "insert")], _OK_SCHEMA), 0)
    rows = [("d1", [2**40], 1, "s", 2, "insert")]
    schema = (
        "doc_id string, tokens array<long>, n_tok long, source string, "
        "event_sequence long, op string"
    )
    lake.merge(_batch(spark, rows, schema), 1)
    assert lake.schema["tokens"].dataType == ArrayType(LongType())
    got = {r["doc_id"]: list(r["tokens"]) for r in lake.read().collect()}
    assert got == {"d0": [5], "d1": [2**40]}


def test_nested_struct_field_add_raises_with_nested_named(spark, tmp_path):
    from pyspark.sql.types import StructType as ST

    schema = _st(
        ("doc_id", StringType()),
        ("meta", ST([StructField("w", LongType())])),
    )
    lake = HashLakeTable.create(spark, str(tmp_path / "ln"), schema, num_buckets=2)
    batch = spark.createDataFrame(
        [("d1", (1, 2), 1, "insert")],
        "doc_id string, meta struct<w long, h long>, event_sequence long, op string",
    )
    with pytest.raises(SchemaCompatibilityError, match="NESTED struct"):
        lake.merge(batch, 0)


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
    # strict also rejects a type promotion (locked-schema mode)
    wide = [("d1", [2**40], 1, "s", 1, "insert")]
    wide_schema = (
        "doc_id string, tokens array<long>, n_tok long, source string, "
        "event_sequence long, op string"
    )
    with pytest.raises(SchemaCompatibilityError, match="strict"):
        lake.merge(_batch(spark, wide, wide_schema), 0, schema_policy="strict")
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
