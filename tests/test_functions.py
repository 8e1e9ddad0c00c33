"""Scalar function parity tests — mirrors the reference's
tests/test_util.py (join_text, str_or_none, id/slug behavior)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from investigraph_etl_spark.functions.ids import (
    fingerprint,
    make_data_checksum,
    make_entity_id,
    make_fingerprint_id,
    make_id,
    make_slug,
    slugify,
)
from investigraph_etl_spark.functions.text import (
    clean_name,
    join_text,
    str_or_none,
    zip_things,
)


def _one(spark, expr, **row):
    df = spark.createDataFrame([row]) if row else spark.range(1)
    return df.select(expr.alias("v")).first()["v"]


def test_str_or_none(spark):
    assert _one(spark, str_or_none(F.col("x")), x="  hi  ") == "hi"
    assert _one(spark, str_or_none(F.col("x")), x="   ") is None
    assert _one(spark, str_or_none(F.col("x")), x="\tA\n") == "A"


def test_join_text(spark):
    # reference: join_text("hello", " ", "world") == "hello world"
    # (/root/reference/tests/test_util.py:7-8)
    v = _one(spark, join_text(F.lit("hello"), F.lit(" "), F.lit("world")))
    assert v == "hello world"
    v = _one(spark, join_text(F.lit("a"), F.lit(None), F.lit("b"), sep=", "))
    assert v == "a, b"


def test_clean_name(spark):
    assert _one(spark, clean_name(F.lit("  A   B\t C "))) == "A B C"


def test_slug_and_ids(spark):
    assert _one(spark, slugify(F.lit("Hello,  World!"))) == "hello-world"
    assert _one(spark, make_slug(F.lit("EU"), F.lit("Body #1"), prefix="ds")) == "ds-eu-body-1"
    sha = hashlib.sha1(b"a|b").hexdigest()
    assert _one(spark, make_entity_id(F.lit("a"), F.lit("b"))) == sha
    assert _one(spark, make_id(F.lit("a"), F.lit("b"), prefix="pfx")) == f"pfx-{sha}"


def test_fingerprint_order_insensitive(spark):
    f1 = _one(spark, fingerprint(F.lit("Mrs. Jane A. Doe")))
    f2 = _one(spark, fingerprint(F.lit("doe,  JANE a mrs")))
    assert f1 == f2 == "a doe jane mrs"
    assert _one(spark, make_fingerprint_id(F.lit("Jane Doe"))) == hashlib.sha1(
        b"doe jane"
    ).hexdigest()


def test_make_data_checksum_stable(spark):
    a = _one(spark, make_data_checksum(F.lit("x"), F.lit(1)))
    b = _one(spark, make_data_checksum(F.lit("x"), F.lit(1)))
    c = _one(spark, make_data_checksum(F.lit("x"), F.lit(2)))
    assert a == b != c


def test_zip_things_matched(spark):
    v = _one(
        spark,
        zip_things(F.col("a"), F.col("b")),
        a="Alice, Bob",
        b="REG1, REG2",
    )
    assert [(r["left"], r["right"]) for r in v] == [("Alice", "REG1"), ("Bob", "REG2")]


def test_zip_things_single_right_fallback(spark):
    v = _one(
        spark, zip_things(F.col("a"), F.col("b")), a="Alice, Bob", b="REG1"
    )
    assert [(r["left"], r["right"]) for r in v] == [("Alice, Bob", "REG1")]


def test_zip_things_mismatch_drops(spark):
    v = _one(
        spark, zip_things(F.col("a"), F.col("b")), a="A, B, C", b="R1, R2"
    )
    assert v == []


def test_format_address_templates(spark):
    from investigraph_etl_spark.functions.addresses import format_address

    # continental order: postal code before city
    v = _one(
        spark,
        format_address(
            street=F.col("st"), postal_code=F.col("pc"),
            city=F.col("ci"), country=F.col("co"),
        ),
        st="Hauptstr. 5", pc="10115", ci="Berlin", co="de",
    )
    assert v == "Hauptstr. 5, 10115 Berlin, DE"
    # anglophone order: city before postal code
    v = _one(
        spark,
        format_address(
            street=F.col("st"), postal_code=F.col("pc"),
            city=F.col("ci"), country=F.col("co"),
        ),
        st="1 Main St", pc="90210", ci="Beverly Hills", co="us",
    )
    assert v == "1 Main St, Beverly Hills 90210, US"


def test_format_address_null_parts_drop(spark):
    from investigraph_etl_spark.functions.addresses import format_address

    v = _one(
        spark,
        format_address(street=F.col("st"), city=F.col("ci"), country=F.col("co")),
        st="  1 Main St ", ci="", co="fr",
    )
    assert v == "1 Main St, FR"
    v = _one(
        spark,
        format_address(street=F.col("st"), city=F.col("ci"), country=F.col("co")),
        st="   ", ci="", co="",
    )
    assert v is None


def test_make_address_row_deterministic(spark):
    from investigraph_etl_spark.functions.addresses import make_address_row

    expr = make_address_row(
        street=F.col("st"), city=F.col("ci"), country=F.col("co")
    )
    a = _one(spark, expr, st="1 Main St", ci="Springfield", co="us")
    b = _one(spark, expr, st="1  Main   St", ci="Springfield", co="us")
    assert a["schema"] == "Address" and a["country"] == "us"
    assert a["id"].startswith("addr-")
    # slug-keyed id: whitespace runs collapse to the same slug → same id
    assert a["id"] == b["id"]
