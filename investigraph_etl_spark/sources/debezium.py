"""Debezium/WAL JSON envelope decoder → engine change-event schema.

The north rule's input is "an ordered binlog/WAL stream of
insert/update/delete events keyed by doc_id".  In production that
stream arrives as Debezium-style JSON envelopes (Kafka topic per
table; the de-facto public CDC wire format for MySQL binlog /
Postgres WAL): a ``payload`` carrying ``before``/``after`` row
images, an ``op`` code (``c``/``r``/``u``/``d``), and a ``source``
block with the log position (``lsn``/``txId``) — see the public
Debezium docs for the envelope.  The reference repo has no CDC
source at all (its extract stage re-reads full files,
/root/reference/investigraph/logic/extract.py); this adapter is the
engine-new surface that lets the tailer consume a real change
stream instead of our synthetic parquet changelog.

Everything here is a single ``from_json`` + projection — built-in
expressions only (JVM-side, whole-stage codegen), identical under
``readStream`` (stateless, streaming-safe), no UDFs.

Decode contract
---------------
* wrapped (``{"schema":…,"payload":{…}}``) and flat (payload at top
  level, ``tombstones.on.delete`` style) envelopes both decode — the
  projection coalesces ``payload.X`` with top-level ``X``.
* op map: ``c``→insert, ``r``→insert (snapshot read), ``u``→update,
  ``d``→delete.
* ``event_sequence`` = first non-null of ``source.lsn``,
  ``source.txId``, payload ``ts_ms`` — the total order the LWW merge
  keys on.  A producer that supplies none of the three yields a null
  sequence and the row is dead-lettered rather than merged at a
  made-up position.
* delete rows carry a null payload (tokens/n_tok/source), matching
  the engine changelog shape (changelog.py) — the row image that
  identifies the key comes from ``before`` (or the Kafka key for a
  tombstone).
* Kafka tombstones (non-null key, null value) become deletes when
  ``key_col`` is given; the key may be a bare string doc_id or a
  Debezium key envelope (``{"payload":{"doc_id":…}}``).
* malformed JSON, non-envelope JSON, unknown op codes, or missing
  sequence → the ``_dead`` marker; :func:`split_dead_letters` routes
  them to a quarantine frame instead of poisoning the merge (the
  at-scale alternative — job abort on one bad producer record — is
  not acceptable on a 10^10-event stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "decode_debezium",
    "split_dead_letters",
    "debezium_stream",
    "row_schema",
    "envelope_schema",
]

# Debezium op code → engine op (changelog.py event shape)
_OPS = [("c", "insert"), ("r", "insert"), ("u", "update"), ("d", "delete")]


def row_schema(with_lang: bool = False) -> StructType:
    """The before/after row image: the tokenized-sequence table row
    (BASELINE.json input_hint) — doc_id, tokens, n_tok, source."""
    fields = [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
    if with_lang:
        fields.append(StructField("lang", StringType()))
    return StructType(fields)


def _source_schema() -> StructType:
    return StructType(
        [
            StructField("name", StringType()),
            StructField("ts_ms", LongType()),
            StructField("lsn", LongType()),
            StructField("txId", LongType()),
        ]
    )


def envelope_schema(row: StructType) -> StructType:
    """Wrapped + flat envelope in one schema: ``from_json`` leaves
    absent fields null, so the decode projection can coalesce
    ``payload.X`` with top-level ``X`` and accept either layout."""
    payload_fields = [
        StructField("before", row),
        StructField("after", row),
        StructField("source", _source_schema()),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
    ]
    return StructType(
        [StructField("payload", StructType(payload_fields)), *payload_fields]
    )


_KEY_SCHEMA = StructType(
    [
        StructField(
            "payload", StructType([StructField("doc_id", StringType())])
        ),
        StructField("doc_id", StringType()),
    ]
)


def _key_doc_id(key: Column) -> Column:
    """doc_id from a Kafka message key: key envelope, flat JSON, or a
    bare (non-JSON) string key."""
    k = key.cast("string")
    parsed = F.from_json(k, _KEY_SCHEMA)
    bare = F.when(~k.rlike(r"^\s*\{"), k)
    return F.coalesce(parsed["payload"]["doc_id"], parsed["doc_id"], bare)


def decode_debezium(
    raw: DataFrame,
    *,
    value_col: str = "value",
    key_col: str | None = None,
    seq_col: str | None = None,
    with_lang: bool = False,
) -> DataFrame:
    """Decode Debezium JSON envelopes into the engine change schema
    ``(event_sequence, op, doc_id, tokens, n_tok, source, event_time
    [, lang], _dead)``.

    One narrow projection — no shuffle, no UDF; feed the result to
    :func:`split_dead_letters`, then ``streaming.tailer.prepare_batch``
    / ``lake.merge`` exactly like the native changelog.

    ``seq_col`` names a column of ``raw`` used as the last-resort
    event sequence (a Kafka ``offset``): tombstones carry no envelope,
    so without it they dead-letter for lack of a total-order position.
    """
    row = row_schema(with_lang)
    val = F.col(value_col).cast("string")
    env = F.from_json(val, envelope_schema(row))

    def p(field: str) -> Column:
        return F.coalesce(env["payload"][field], env[field])

    op_code = p("op")
    op = F.coalesce(
        *[F.when(op_code == c, F.lit(o)) for c, o in _OPS]
    )
    before, after, src = p("before"), p("after"), p("source")
    image = F.when(op_code == "d", before).otherwise(after)
    seq_parts = [src["lsn"], src["txId"], p("ts_ms")]
    if seq_col is not None:
        seq_parts.append(F.col(seq_col))
    seq = F.coalesce(*seq_parts).cast("long")
    doc_id = image["doc_id"]
    if key_col is not None:
        kid = _key_doc_id(F.col(key_col))
        is_tombstone = val.isNull() & kid.isNotNull()
        doc_id = F.coalesce(doc_id, kid)
        # a tombstone has no envelope: its sequence must come from
        # ``seq_col`` stream metadata; otherwise it dead-letters
        op = F.when(is_tombstone, F.lit("delete")).otherwise(op)
    cols = {
        "event_sequence": seq,
        "op": op,
        "doc_id": doc_id,
        # the row image passes through verbatim (a Debezium delete
        # carries the full before-image; LWW drops the payload anyway
        # and the synthetic changelog's deletes carry null tokens by
        # construction — the decoder must not invent nulls)
        "tokens": image["tokens"],
        "n_tok": image["n_tok"].cast("int"),
        "source": image["source"],
        "event_time": F.timestamp_millis(p("ts_ms")).cast(TimestampType()),
    }
    if with_lang:
        cols["lang"] = image["lang"]
    # dead: unparseable / not an envelope / unknown op / no key / no
    # total-order position — quarantine, never merge
    dead = op.isNull() | doc_id.isNull() | seq.isNull()
    cols["_dead"] = dead
    cols["_raw"] = F.when(dead, val)
    return raw.select(*[c.alias(n) for n, c in cols.items()])


def split_dead_letters(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid change events, dead-letter quarantine).  The valid side
    drops the marker columns and matches ``tailer.change_schema``
    column-for-column; the dead side keeps the raw envelope text for
    offline triage."""
    good = decoded.filter(~F.col("_dead")).drop("_dead", "_raw")
    dead = decoded.filter(F.col("_dead")).select(
        F.col("_raw").alias("raw"),
        F.col("event_sequence"),
        F.col("op"),
        F.col("doc_id"),
    )
    return good, dead


def debezium_stream(
    spark: SparkSession,
    directory: str,
    *,
    key_col: str | None = None,
    with_lang: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` a directory of Debezium JSON-lines files (the
    file-based stand-in for a Kafka topic — swap the source for
    ``format("kafka")`` + the same decode on a real cluster; the
    decode projection is source-agnostic)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(directory)
    return decode_debezium(
        raw, value_col="value", key_col=key_col, with_lang=with_lang
    )
