"""Incrementally maintained MinHash-LSH index (operators/minhash_index.py):
feed-fold parity with a fresh rebuild, idempotent replay, multi-commit
catch-up, delete/contentless invisibility, probe semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from investigraph_etl_spark.operators.minhash_index import MinHashIndex
from investigraph_etl_spark.sources.lake import HashLakeTable
from investigraph_etl_spark.streaming.tailer import (
    change_schema,
    prepare_batch,
    target_schema,
)

T0 = pd.to_datetime(0, unit="s")


def _commit(spark, lake, batch_id, rows):
    """rows: list of (seq, op, doc_id, tokens)."""
    pdf = pd.DataFrame(
        [
            {
                "event_sequence": seq,
                "op": op,
                "doc_id": d,
                "tokens": toks,
                "n_tok": len(toks) if toks is not None else None,
                "source": "s",
                "event_time": T0,
            }
            for seq, op, d, toks in rows
        ]
    )
    lake.merge(prepare_batch(spark.createDataFrame(pdf, change_schema())), batch_id)


TOK_A = list(range(0, 40))
TOK_B = list(range(100, 140))
TOK_C = list(range(200, 240))
TOK_B2 = list(range(300, 340))
TOK_D = list(range(400, 440))
TOK_E = list(range(500, 540))


@pytest.fixture()
def source(spark, tmp_path):
    lake = HashLakeTable.create(
        spark, str(tmp_path / "src"), target_schema(), num_buckets=8
    )
    _commit(
        spark, lake, 0,
        [(1, "insert", "A", TOK_A), (2, "insert", "B", TOK_B),
         (3, "insert", "C", TOK_C)],
    )
    return lake


@pytest.fixture()
def index(spark, tmp_path):
    return MinHashIndex(
        spark, str(tmp_path / "idx"), content_col="tokens", mode="tokens",
        num_buckets=4,
    )


def _index_state(index):
    return {
        r["doc_id"]: tuple(r["band_hashes"]) if r["band_hashes"] else None
        for r in index.table.read().collect()
    }


def _fresh_bands(index, source):
    live = source.read().select("doc_id", "tokens")
    return {
        r["id"]: tuple(r["band_hashes"])
        for r in index.band_hashes(live).collect()
    }


def test_refresh_parity_catchup_and_deletes(spark, source, index):
    index.refresh(source)
    assert _index_state(index) == _fresh_bands(index, source)
    # two more commits WITHOUT intermediate refreshes: update B,
    # delete C, insert D, then insert E — one refresh catches up
    _commit(
        spark, source, 1,
        [(4, "update", "B", TOK_B2), (5, "delete", "C", None),
         (6, "insert", "D", TOK_D)],
    )
    _commit(spark, source, 2, [(7, "insert", "E", TOK_E)])
    st = index.refresh(source)
    assert not st["skipped"]
    got = _index_state(index)
    assert got == _fresh_bands(index, source)
    assert set(got) == {"A", "B", "D", "E"}  # C's tombstone holds


def test_refresh_idempotent(spark, source, index):
    index.refresh(source)
    v = index.version
    again = index.refresh(source)
    assert again["skipped"] and index.version == v


def test_probe_finds_dup_and_misses_unrelated(spark, source, index):
    index.refresh(source)
    batch = spark.createDataFrame(
        [("NEW_A", TOK_A), ("NEW_X", list(range(900, 940)))],
        "doc_id string, tokens array<int>",
    )
    pairs = {
        (r["id_new"], r["id_indexed"]): r["n_bands"]
        for r in index.probe(batch).collect()
    }
    assert pairs.get(("NEW_A", "A")) == index.bands  # identical: all bands
    assert not any(k[0] == "NEW_X" for k in pairs)


def test_probe_excludes_self(spark, source, index):
    index.refresh(source)
    own = source.read().select("doc_id", "tokens")
    assert index.probe(own).where("id_new = id_indexed").count() == 0


def test_update_to_contentless_goes_probe_invisible(spark, source, index):
    index.refresh(source)
    _commit(spark, source, 1, [(10, "update", "A", [])])
    index.refresh(source)
    assert _index_state(index)["A"] is None
    probe_old_a = spark.createDataFrame(
        [("NEW_A", TOK_A)], "doc_id string, tokens array<int>"
    )
    assert index.probe(probe_old_a).count() == 0


def test_text_mode_matches_lsh_banding_semantics(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            ("x", "the quick brown fox jumps over the lazy dog"),
            ("y", "the quick brown fox jumps over the lazy cat"),
            ("z", "completely unrelated content about spark engines here"),
        ],
        ["doc_id", "text"],
    )
    lake = HashLakeTable.create(
        spark, str(tmp_path / "tsrc"),
        docs.schema, key="doc_id", num_buckets=4,
    )
    batch = docs.selectExpr(
        "doc_id", "text",
        "monotonically_increasing_id() + 1 AS event_sequence",
        "'insert' AS op",
    )
    lake.merge(batch, 0)
    idx = MinHashIndex(
        spark, str(tmp_path / "tidx"), content_col="text", mode="text",
        num_buckets=4,
    )
    idx.refresh(lake)
    probe = spark.createDataFrame(
        [("q", "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_new"], r["id_indexed"]) for r in idx.probe(probe).collect()
    }
    assert ("q", "x") in pairs and ("q", "z") not in pairs


def test_streaming_tailer_maintains_index(spark, tmp_path):
    """End-to-end product surface: the Structured Streaming tailer
    keeps the index current via the derived= hook (duck-typed
    refresh(lake)), and the drained index equals a fresh rebuild."""
    from investigraph_etl_spark.changelog import write_changelog
    from investigraph_etl_spark.streaming.tailer import tail_changelog

    log = str(tmp_path / "log")
    write_changelog(log, 2000, chunk_size=250, seed=13, n_docs=150,
                    shuffle_window=40)
    lake = HashLakeTable.create(
        spark, str(tmp_path / "slake"), target_schema(), num_buckets=8
    )
    idx = MinHashIndex(
        spark, str(tmp_path / "sidx"), content_col="tokens", mode="tokens",
        num_buckets=4,
    )
    q = tail_changelog(
        spark, log, lake, str(tmp_path / "ckpt"),
        max_files_per_trigger=3, derived=[idx],
    )
    q.awaitTermination(300)
    assert idx.version == lake.version
    assert _index_state(idx) == _fresh_bands(idx, lake)
    # a live doc's own tokens probe back to it on every band
    row = lake.read().limit(1).collect()[0]
    probe = spark.createDataFrame(
        [("probe_doc", row["tokens"])], "doc_id string, tokens array<int>"
    )
    hits = {
        (r["id_new"], r["id_indexed"]): r["n_bands"]
        for r in idx.probe(probe).collect()
    }
    assert hits.get(("probe_doc", row["doc_id"])) == idx.bands


def test_probe_verified_exact_jaccard(spark, source, index):
    """verify_with upgrades candidates to exact verified pairs: an
    identical doc scores jaccard 1.0; a partial overlap matches the
    python-computed token-shingle jaccard and threshold-filters."""
    index.refresh(source)
    half = TOK_A[:20] + list(range(700, 720))  # shares half of A's stream
    batch = spark.createDataFrame(
        [("SAME_A", TOK_A), ("HALF_A", half)],
        "doc_id string, tokens array<int>",
    )

    def py_shingles(toks, n=3):
        if len(toks) < n:
            return {" ".join(map(str, toks))}
        return {" ".join(map(str, toks[i:i + n])) for i in range(len(toks) - n + 1)}

    a, h = py_shingles(TOK_A), py_shingles(half)
    expect_half = round(len(a & h) / len(a | h), 6)

    verified = {
        (r["id_new"], r["id_indexed"]): r["jaccard"]
        for r in index.probe(
            batch, verify_with=source.read(), threshold=0.1
        ).collect()
    }
    assert verified[("SAME_A", "A")] == 1.0
    if ("HALF_A", "A") in verified:  # only if LSH banding surfaced it
        assert verified[("HALF_A", "A")] == expect_half
    # tight threshold drops the partial pair but keeps the exact one
    tight = {
        (r["id_new"], r["id_indexed"])
        for r in index.probe(
            batch, verify_with=source.read(), threshold=0.99
        ).collect()
    }
    assert tight == {("SAME_A", "A")}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def index_cases(draw):
    seed = draw(st.integers(0, 2**16))
    n_events = draw(st.integers(150, 800))
    n_docs = draw(st.integers(10, 120))
    n_commits = draw(st.integers(1, 4))
    # refresh after a random SUBSET of commits (always after the last:
    # the property is about catching up, not about lagging forever)
    cadence_seed = draw(st.integers(0, 2**16))
    return seed, n_events, n_docs, n_commits, cadence_seed


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=index_cases())
def test_any_stream_any_refresh_cadence_equals_rebuild(
    spark, tmp_path_factory, case
):
    """Property: for ANY insert/update/delete stream split into ANY
    commit sequence, refreshing after an arbitrary subset of commits
    leaves the index equal to a fresh rebuild of the final live state."""
    import numpy as np

    from investigraph_etl_spark.changelog import gen_events_pandas
    from investigraph_etl_spark.streaming.tailer import change_schema

    seed, n_events, n_docs, n_commits, cadence_seed = case
    events = gen_events_pandas(0, n_events, seed=seed, n_docs=n_docs)
    rng = np.random.default_rng(cadence_seed)
    cuts = (
        sorted(rng.choice(range(1, len(events)), size=n_commits - 1,
                          replace=False))
        if n_commits > 1
        else []
    )
    chunks = np.split(np.arange(len(events)), cuts)
    refresh_after = {len(chunks) - 1} | {
        i for i in range(len(chunks)) if rng.random() < 0.5
    }

    root = tmp_path_factory.mktemp("idxprop")
    lake = HashLakeTable.create(
        spark, str(root / "lake"), target_schema(), num_buckets=4
    )
    idx = MinHashIndex(
        spark, str(root / "idx"), content_col="tokens", mode="tokens",
        num_buckets=4,
    )
    for bid, rows in enumerate(chunks):
        df = spark.createDataFrame(events.iloc[rows], schema=change_schema())
        lake.merge(prepare_batch(df), bid)
        if bid in refresh_after:
            idx.refresh(lake)
    assert idx.version == lake.version
    assert _index_state(idx) == _fresh_bands(idx, lake)


def test_index_key_named_id(spark, tmp_path):
    """Round-4 (ADVICE r3): with key='id' the refresh upsert join used
    to compare F.col('id') == F.col('id') — self-ambiguous.  The feed
    key is now aliased before the join, so an 'id'-keyed source folds
    correctly."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("tokens", ArrayType(LongType()), True),
        ]
    )
    src = HashLakeTable.create(
        spark, str(tmp_path / "src_id"), schema, key="id", num_buckets=4
    )
    batch = spark.createDataFrame(
        [("A", TOK_A, "insert", 1), ("B", TOK_B, "insert", 2)],
        "id string, tokens array<bigint>, op string, event_sequence long",
    )
    src.merge(batch, 0)
    idx = MinHashIndex(
        spark, str(tmp_path / "idx_id"), key="id", content_col="tokens",
        mode="tokens", num_buckets=4,
    )
    st = idx.refresh(src)
    assert not st.get("skipped")
    state = {
        r["id"]: tuple(r["band_hashes"]) for r in idx.table.read().collect()
    }
    live = src.read().select("id", "tokens")
    fresh = {
        r["id"]: tuple(r["band_hashes"])
        for r in idx.band_hashes(live).collect()
    }
    assert state == fresh
    assert set(state) == {"A", "B"}
