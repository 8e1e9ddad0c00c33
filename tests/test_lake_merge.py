"""LakeTable MERGE semantics: replay equivalence (token-array equality
per doc_id — the north-rule invariant), idempotency, late-event guard,
tombstone no-resurrection, schema evolution, bucket pruning."""

from __future__ import annotations

import pandas as pd
import pytest

from investigraph_etl_spark.changelog import gen_events_pandas, oracle_reduce
from investigraph_etl_spark.sources.lake import HashLakeTable
from investigraph_etl_spark.streaming.tailer import (
    change_schema,
    prepare_batch,
    replay_batch,
    target_schema,
)
from tests.conftest import assert_pdf_equal


def _spark_events(spark, pdf: pd.DataFrame, with_lang: bool = False):
    return spark.createDataFrame(pdf, schema=change_schema(with_lang))


@pytest.fixture()
def lake(spark, tmp_path):
    return HashLakeTable.create(
        spark, str(tmp_path / "lake"), target_schema(), num_buckets=8
    )


def test_batch_replay_equals_oracle(spark, lake):
    events = gen_events_pandas(0, 4000, seed=42, n_docs=300, dirty_frac=0.1)
    replay_batch(_spark_events(spark, events), lake)
    got = lake.read().toPandas()
    expected = oracle_reduce(events)
    assert_pdf_equal(got, expected)


def test_multi_batch_replay_equals_oracle(spark, lake):
    events = gen_events_pandas(0, 3000, seed=1, n_docs=200)
    for bid, start in enumerate(range(0, 3000, 700)):
        chunk = events.iloc[start : start + 700]
        lake.merge(prepare_batch(_spark_events(spark, chunk)), bid)
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_merge_idempotent_on_replayed_batch(spark, lake):
    events = gen_events_pandas(0, 1000, seed=2, n_docs=100)
    batch = prepare_batch(_spark_events(spark, events))
    r1 = lake.merge(batch, 0)
    v1 = lake.version
    r2 = lake.merge(batch, 0)  # foreachBatch retry delivers same id
    assert not r1["skipped"] and r2["skipped"]
    assert lake.version == v1
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_late_events_cannot_rewind_state(spark, lake):
    events = gen_events_pandas(0, 2000, seed=3, n_docs=150)
    newer, older = events.iloc[1000:], events.iloc[:1000]
    # deliver the *newer* half first, stale half afterwards
    lake.merge(prepare_batch(_spark_events(spark, newer)), 0)
    lake.merge(prepare_batch(_spark_events(spark, older)), 1)
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_tombstone_blocks_resurrection(spark, lake):
    cols = ["event_sequence", "op", "doc_id", "tokens", "n_tok", "source", "event_time"]
    t = pd.to_datetime(0, unit="s")
    ins = pd.DataFrame([[1, "insert", "x", [1, 2], 2, "web", t]], columns=cols)
    dele = pd.DataFrame([[5, "delete", "x", None, None, None, t]], columns=cols)
    stale = pd.DataFrame([[3, "update", "x", [9], 1, "web", t]], columns=cols)
    lake.merge(prepare_batch(_spark_events(spark, ins)), 0)
    lake.merge(prepare_batch(_spark_events(spark, dele)), 1)
    # a late update older than the delete must NOT resurrect the row
    lake.merge(prepare_batch(_spark_events(spark, stale)), 2)
    assert lake.read().count() == 0
    raw = lake.read_raw().toPandas()
    assert len(raw) == 1 and bool(raw["_deleted"][0]) and int(raw["_seq"][0]) == 5


def test_schema_evolution_promotes_new_column(spark, lake):
    old = gen_events_pandas(0, 800, seed=4, n_docs=100)
    new = gen_events_pandas(800, 800, seed=4, n_docs=100, with_lang=True)
    lake.merge(prepare_batch(_spark_events(spark, old)), 0)
    assert "lang" not in [f.name for f in lake.schema.fields]
    lake.merge(prepare_batch(_spark_events(spark, new, with_lang=True)), 1)
    assert "lang" in [f.name for f in lake.schema.fields]
    combined = pd.concat([old, new], ignore_index=True)
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(combined))
    # rows last written before evolution read back with null lang
    got = lake.read().toPandas().set_index("doc_id")
    exp = oracle_reduce(combined).set_index("doc_id")
    stale_docs = exp[exp["lang"].isna()].index
    assert got.loc[stale_docs, "lang"].isna().all()


def test_bucket_pruning_touches_only_needed_buckets(spark, lake):
    events = gen_events_pandas(0, 2000, seed=5, n_docs=300)
    lake.merge(prepare_batch(_spark_events(spark, events)), 0)
    cols = ["event_sequence", "op", "doc_id", "tokens", "n_tok", "source", "event_time"]
    one = pd.DataFrame(
        [[99_999, "update", "doc-00000007", [7], 1, "web", pd.to_datetime(0, unit="s")]],
        columns=cols,
    )
    r = lake.merge(prepare_batch(_spark_events(spark, one)), 1)
    assert r["touched_buckets"] == 1
    # untouched buckets' files carried forward unchanged
    assert_pdf_equal(
        lake.read().toPandas(),
        oracle_reduce(pd.concat([events, one], ignore_index=True)),
    )


def test_salted_lww_same_result(spark, lake):
    events = gen_events_pandas(0, 3000, seed=6, n_docs=50, skew_frac=0.6, n_hot=1)
    lake.merge(prepare_batch(_spark_events(spark, events), salt_buckets=8), 0)
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def _data_bytes(lake) -> int:
    import pathlib

    data = pathlib.Path(lake.root) / "data"
    return sum(p.stat().st_size for p in data.rglob("*") if p.is_file())


def test_merge_on_read_write_amplification_bounded(spark, lake):
    """North-rule scale property: a delta commit writes ∝ batch bytes,
    NOT table bytes (the round-1 COW design rewrote every touched
    bucket per commit)."""
    big = gen_events_pandas(0, 5000, seed=11, n_docs=400)
    lake.merge(prepare_batch(_spark_events(spark, big)), 0, auto_compact_deltas=100)
    table_bytes = _data_bytes(lake)
    one = gen_events_pandas(50_000, 1, seed=12, n_docs=400)
    before = _data_bytes(lake)
    lake.merge(prepare_batch(_spark_events(spark, one)), 1, auto_compact_deltas=100)
    delta_bytes = _data_bytes(lake) - before
    # a 1-event delta commit must be orders of magnitude below the table
    assert delta_bytes < table_bytes / 10, (delta_bytes, table_bytes)


def test_compact_folds_deltas_preserves_state(spark, lake):
    events = gen_events_pandas(0, 3000, seed=13, n_docs=150)
    for bid, start in enumerate(range(0, 3000, 500)):
        chunk = events.iloc[start : start + 500]
        lake.merge(
            prepare_batch(_spark_events(spark, chunk)), bid, auto_compact_deltas=100
        )
    assert any(lake.snapshot()["deltas"].values())
    expected = oracle_reduce(events)
    r = lake.compact()
    assert r["compacted_buckets"] > 0
    assert not any(lake.snapshot()["deltas"].values())
    assert_pdf_equal(lake.read().toPandas(), expected)
    # and the table still merges after compaction
    more = gen_events_pandas(9000, 100, seed=14, n_docs=150)
    lake.merge(prepare_batch(_spark_events(spark, more)), 99)
    assert_pdf_equal(
        lake.read().toPandas(),
        oracle_reduce(pd.concat([events, more], ignore_index=True)),
    )


def test_auto_compact_triggers_at_threshold(spark, lake):
    events = gen_events_pandas(0, 1200, seed=15, n_docs=20)  # few docs → few buckets
    compactions = 0
    for bid, start in enumerate(range(0, 1200, 200)):
        chunk = events.iloc[start : start + 200]
        r = lake.merge(
            prepare_batch(_spark_events(spark, chunk)), bid, auto_compact_deltas=3
        )
        compactions += r.get("compacted_buckets", 0)
    assert compactions > 0
    deltas = lake.snapshot()["deltas"]
    # smoothed compaction folds a bounded bucket set per commit, so
    # delta counts stay bounded by ~2× the threshold, not threshold+1
    assert all(len(d) <= 2 * 3 for d in deltas.values())
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_lww_auto_count_strategy(spark, lake):
    """auto_count picks shuffle_hash above the key threshold and
    broadcast below it — same result either way."""
    from investigraph_etl_spark.operators.lww import lww_dedup

    events = gen_events_pandas(0, 2000, seed=16, n_docs=300)
    df = _spark_events(spark, events)
    small = lww_dedup(df, "doc_id", "event_sequence", winners_strategy="auto_count")
    forced = lww_dedup(
        df,
        "doc_id",
        "event_sequence",
        winners_strategy="auto_count",
        auto_count_max_keys=10,  # force the shuffle_hash branch
    )
    a = {r["doc_id"]: r["event_sequence"] for r in small.collect()}
    b = {r["doc_id"]: r["event_sequence"] for r in forced.collect()}
    assert a == b and len(a) > 200


def test_vacuum_time_travel_to_retained_manifest(spark, lake):
    """Vacuum must keep every file referenced by any RETAINED manifest,
    and resolve paths before comparing (symlink/relative spellings)."""
    import json
    import pathlib

    events = gen_events_pandas(0, 2000, seed=17, n_docs=100)
    for bid, start in enumerate(range(0, 2000, 400)):
        lake.merge(
            prepare_batch(_spark_events(spark, events.iloc[start : start + 400])),
            bid,
            auto_compact_deltas=2,  # force compactions → superseded files
        )
    lake.vacuum(keep_manifests=3)
    # every retained manifest's file set must still exist on disk
    for m in sorted((pathlib.Path(lake.root) / "manifests").glob("v*.json"))[-3:]:
        doc = HashLakeTable._materialize(m.parent, json.loads(m.read_text()))
        assert doc.get("buckets") or doc.get("deltas")  # not vacuous
        for files in doc.get("buckets", {}).values():
            for f in files:
                assert pathlib.Path(f).exists(), f
        for dsets in doc.get("deltas", {}).values():
            for files in dsets:
                for f in files:
                    assert pathlib.Path(f).exists(), f
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_vacuum_reclaims_superseded_files_preserves_state(spark, lake):
    events = gen_events_pandas(0, 3000, seed=7, n_docs=100)
    for bid, start in enumerate(range(0, 3000, 600)):
        chunk = events.iloc[start : start + 600]
        lake.merge(prepare_batch(_spark_events(spark, chunk)), bid)
    expected = oracle_reduce(events)
    import pathlib

    data = pathlib.Path(lake.root) / "data"
    before = sum(1 for p in data.rglob("*") if p.is_file())
    stats = lake.vacuum(keep_manifests=2)
    after = sum(1 for p in data.rglob("*") if p.is_file())
    # 5 commits each rewrote most buckets → most file sets superseded
    assert stats["removed_files"] > 0 and after < before
    assert stats["expired_manifests"] > 0
    # live state byte-identical after GC, and the table still merges
    assert_pdf_equal(lake.read().toPandas(), expected)
    one = gen_events_pandas(9000, 10, seed=8, n_docs=100)
    lake.merge(prepare_batch(_spark_events(spark, one)), 99)
    assert_pdf_equal(
        lake.read().toPandas(),
        oracle_reduce(pd.concat([events, one], ignore_index=True)),
    )


def test_fast_policy_replay_equals_oracle(spark, lake):
    """The sustained-ingest fast policy — reduce_batch=False (read-time
    LWW subsumes the in-batch reduce) + compact_mode="async"
    (background folding harvested at later commits) — must reach the
    exact same final state as the default path.  auto_compact_deltas=2
    forces several async folds to be scheduled AND harvested
    mid-replay, exercising the snapshot/consumed-prefix bookkeeping
    under concurrent delta appends to the same buckets."""
    events = gen_events_pandas(0, 3000, seed=11, n_docs=200, dirty_frac=0.1)
    for bid, start in enumerate(range(0, 3000, 300)):
        chunk = events.iloc[start : start + 300]
        lake.merge(
            prepare_batch(_spark_events(spark, chunk)), bid,
            reduce_batch=False, compact_mode="async", auto_compact_deltas=2,
        )
    lake.wait_for_compaction()
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))
    # reopening from disk (fresh reader) sees the identical state —
    # every harvested fold was persisted by a later manifest write or
    # by wait_for_compaction's own version bump
    reopened = HashLakeTable(spark, lake.root)
    assert_pdf_equal(reopened.read().toPandas(), oracle_reduce(events))


def test_unreduced_deltas_fold_at_compaction(spark, lake):
    """reduce_batch=False writes duplicate key rows into one commit's
    delta; read() must still LWW them away, and compact() must fold
    them into singletons."""
    events = gen_events_pandas(0, 1200, seed=12, n_docs=40)  # heavy dups
    lake.merge(
        prepare_batch(_spark_events(spark, events)), 0,
        reduce_batch=False, compact_mode="off",
    )
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))
    lake.compact()
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))
    # post-compaction the base holds ≤1 row per key
    raw = lake.read_raw().groupBy(lake.key).count().toPandas()
    assert (raw["count"] == 1).all()


def test_sync_compact_lands_inflight_async_fold_first(spark, lake):
    """Mode-switch safety: an inflight async fold's consumed-prefix
    bookkeeping must be applied before any sync fold touches the same
    buckets — otherwise the harvest would drop the wrong delta sets."""
    events = gen_events_pandas(0, 2000, seed=21, n_docs=120, dirty_frac=0.1)
    chunks = [events.iloc[i : i + 250] for i in range(0, 2000, 250)]
    for bid, chunk in enumerate(chunks[:-1]):
        lake.merge(
            prepare_batch(_spark_events(spark, chunk)), bid,
            reduce_batch=False, compact_mode="async", auto_compact_deltas=2,
        )
    # switch to sync for the last commit while a fold may be inflight
    lake.merge(
        prepare_batch(_spark_events(spark, chunks[-1])), len(chunks) - 1,
        reduce_batch=False, compact_mode="sync", auto_compact_deltas=2,
    )
    lake.wait_for_compaction()
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_vacuum_lands_inflight_fold_before_collecting(spark, lake):
    """vacuum() must persist an inflight async fold before orphan
    collection, or it would delete the fold's not-yet-referenced
    output files."""
    events = gen_events_pandas(0, 1500, seed=22, n_docs=100)
    chunks = [events.iloc[i : i + 300] for i in range(0, 1500, 300)]
    for bid, chunk in enumerate(chunks):
        lake.merge(
            prepare_batch(_spark_events(spark, chunk)), bid,
            reduce_batch=False, compact_mode="async", auto_compact_deltas=2,
        )
    lake.vacuum(keep_manifests=1)
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))
    # reopening from disk agrees — the fold was persisted, not orphaned
    reopened = HashLakeTable(spark, lake.root)
    assert_pdf_equal(reopened.read().toPandas(), oracle_reduce(events))


def test_read_keys_prunes_to_key_buckets(spark, lake):
    """Point lookup: result equals a filtered full read, tombstoned
    keys return nothing, and the scan touches ONLY the files of the
    buckets the keys hash into (the 100 TB point-lookup story)."""
    events = gen_events_pandas(0, 2000, seed=23, n_docs=150)
    replay_batch(_spark_events(spark, events), lake)
    oracle = oracle_reduce(events)
    live = list(oracle["doc_id"].iloc[:3])
    all_ids = {f"doc-{n:08d}" for n in range(150)}
    dead = sorted(all_ids - set(oracle["doc_id"]))[:1]  # tombstoned
    got = lake.read_keys(live + dead).toPandas()
    assert_pdf_equal(got, oracle[oracle["doc_id"].isin(live)])
    # pruning: inputFiles ⊆ the keys' buckets' files, a strict subset
    # of the full table's files
    touched = set(lake.read_keys(live + dead).inputFiles())
    every = set(lake.read_raw().inputFiles())
    assert touched and touched < every


def test_read_keys_empty_list(spark, lake):
    events = gen_events_pandas(0, 500, seed=24, n_docs=50)
    replay_batch(_spark_events(spark, events), lake)
    assert lake.read_keys([]).count() == 0


def test_time_travel_reads_retained_versions(spark, lake):
    """read(version=v) reproduces the state as of commit v (MVCC), and
    vacuum-expired versions raise instead of silently reading current
    files."""
    events = gen_events_pandas(0, 3000, seed=25, n_docs=120)
    versions = []
    for bid, start in enumerate(range(0, 3000, 1000)):
        chunk = events.iloc[start : start + 1000]
        stats = lake.merge(prepare_batch(_spark_events(spark, chunk)), bid)
        versions.append(stats["version"])
    # snapshot after the FIRST commit == oracle over its events only
    assert_pdf_equal(
        lake.read(version=versions[0]).toPandas(),
        oracle_reduce(events.iloc[:1000]),
    )
    # latest (explicit + implicit agree)
    assert_pdf_equal(
        lake.read(version=versions[-1]).toPandas(), oracle_reduce(events)
    )
    # expire everything but the newest manifest: old version must raise
    lake.vacuum(keep_manifests=1)
    with pytest.raises(ValueError, match="expired|not available"):
        lake.read(version=versions[0]).count()
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_time_travel_schema_as_of_version(spark, lake):
    """A version before additive evolution exposes the OLD schema —
    the snapshot's columns, not the current ones."""
    base = gen_events_pandas(0, 800, seed=26, n_docs=60)
    s1 = lake.merge(prepare_batch(_spark_events(spark, base)), 0)
    evolved = gen_events_pandas(800, 800, seed=26, n_docs=60, with_lang=True)
    lake.merge(
        prepare_batch(_spark_events(spark, evolved, with_lang=True)), 1
    )
    old_cols = set(lake.read(version=s1["version"]).columns)
    new_cols = set(lake.read().columns)
    assert "lang" not in old_cols and "lang" in new_cols


def test_mvcc_pinned_reader_sees_stable_snapshot(spark, lake):
    """A DataFrame built before later commits is pinned to its
    snapshot's file set (manifest captured at plan time; compaction
    supersedes but never deletes — only vacuum does): collecting it
    AFTER more merges and forced compactions must still return the
    old state, while a fresh read sees the new one."""
    events = gen_events_pandas(0, 2400, seed=61, n_docs=120)
    first, rest = events.iloc[:1200], events.iloc[1200:]
    lake.merge(prepare_batch(_spark_events(spark, first)), 0)
    pinned = lake.read()
    expected_old = oracle_reduce(first)
    for bid, start in enumerate(range(0, 1200, 400), start=1):
        lake.merge(
            prepare_batch(_spark_events(spark, rest.iloc[start : start + 400])),
            bid,
            auto_compact_deltas=2,  # force folds while the reader is pinned
        )
    lake.compact()
    assert_pdf_equal(pinned.toPandas(), expected_old)
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))


def test_manifest_bytes_per_commit_proportional_to_touched_buckets(spark, tmp_path):
    """The Iceberg-style split (round 3): committing a batch that
    touches ONE bucket writes metadata ∝ that bucket's (compaction-
    bounded) file list plus an O(num_buckets)-pointer manifest list —
    NOT the whole table's file inventory.  The flat round-2 layout
    re-serialized EVERY bucket's file list per commit; here a
    single-bucket commit on a well-populated 64-bucket table must write
    far less than the flat-equivalent document, and untouched buckets'
    manifest files must be reused, not rewritten."""
    import json as _json
    import pathlib as _pl

    lake = HashLakeTable.create(
        spark, str(tmp_path / "lake"), target_schema(), num_buckets=64
    )
    mdir = _pl.Path(lake.root) / "manifests"
    # populate every bucket across several commits (default compaction)
    for bid, start in enumerate(range(0, 6000, 1000)):
        ev = gen_events_pandas(start, 1000, seed=7, n_docs=400)
        lake.merge(prepare_batch(_spark_events(spark, ev)), bid)

    cols = ["event_sequence", "op", "doc_id", "tokens", "n_tok", "source", "event_time"]
    t = pd.to_datetime(0, unit="s")
    before = {p.name: p.stat().st_size for p in mdir.iterdir()}
    ev = pd.DataFrame([[10**6, "insert", "one-key", [1], 1, "web", t]], columns=cols)
    lake.merge(prepare_batch(_spark_events(spark, ev)), 99)
    new_files = [p for p in mdir.iterdir() if p.name not in before]
    new_bytes = sum(p.stat().st_size for p in new_files)
    # the flat layout would have re-serialized this whole document:
    flat_bytes = len(
        _json.dumps(
            {
                "buckets": lake._manifest.get("buckets", {}),
                "deltas": lake._manifest.get("deltas", {}),
            }
        )
    )
    assert new_bytes < 0.3 * flat_bytes, (new_bytes, flat_bytes)
    # exactly one bucket manifest rewritten; the other 63 reused
    new_bm = [p for p in new_files if p.name.startswith("bm-")]
    assert len(new_bm) == 1, [p.name for p in new_files]
    refs = _json.loads(
        (mdir / f"v{lake.version:06d}.json").read_text()
    )["bucket_refs"]
    assert sum(1 for r in refs.values() if r not in before) == 1


def _bucket_of(lake, key: str) -> int:
    from pyspark.sql import functions as F

    return (
        lake.spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(key)), F.lit(lake.num_buckets))
            .cast("int")
            .alias("b")
        )
        .collect()[0]["b"]
    )


def test_read_keys_file_skipping_after_sorted_compaction(spark, lake):
    """Iceberg-style data skipping: compaction sorts each bucket by key
    and rolls files at compact_target_file_rows, so a point lookup
    reads a strict subset of even its OWN bucket's base files — and the
    result still equals the filtered full read (pruning can never
    change LWW winners)."""
    lake.compact_target_file_rows = 4
    events = gen_events_pandas(0, 3000, seed=31, n_docs=200)
    for bid, start in enumerate(range(0, 3000, 1000)):
        chunk = events.iloc[start : start + 1000]
        lake.merge(prepare_batch(_spark_events(spark, chunk)), bid)
    lake.compact()
    oracle = oracle_reduce(events)
    key = str(oracle["doc_id"].iloc[0])
    got = lake.read_keys([key]).toPandas()
    assert_pdf_equal(got, oracle[oracle["doc_id"] == key])
    # the key's bucket was rolled into several key-disjoint files …
    bucket_files = set(lake._manifest["buckets"][str(_bucket_of(lake, key))])
    assert len(bucket_files) > 1
    # … and the lookup reads a strict subset of them
    touched = {
        f.removeprefix("file://") for f in lake.read_keys([key]).inputFiles()
    }
    assert touched and touched < bucket_files
    # every base file now carries harvested [min,max] key stats
    stats = lake._manifest["file_stats"]
    for fl in lake._manifest["buckets"].values():
        for f in fl:
            assert f in stats and stats[f][0] <= stats[f][1]


def test_file_stats_survive_manifest_roundtrip(spark, lake):
    """Stats persist in the per-bucket manifests: a fresh table handle
    (new reader process) prunes lookups just like the writer did."""
    lake.compact_target_file_rows = 4
    events = gen_events_pandas(0, 2000, seed=32, n_docs=150)
    replay_batch(_spark_events(spark, events), lake)
    lake.compact()
    oracle = oracle_reduce(events)
    key = str(oracle["doc_id"].iloc[1])
    reopened = HashLakeTable(spark, str(lake.root))
    assert reopened._manifest["file_stats"] == lake._manifest["file_stats"]
    bucket_files = set(reopened._manifest["buckets"][str(_bucket_of(lake, key))])
    touched = {
        f.removeprefix("file://") for f in reopened.read_keys([key]).inputFiles()
    }
    assert touched and touched < bucket_files
    assert_pdf_equal(
        reopened.read_keys([key]).toPandas(),
        oracle[oracle["doc_id"] == key],
    )


def test_file_skipping_with_tombstones_and_async_compaction(spark, lake):
    """Skipping is sound under the full LWW surface: tombstoned keys
    stay dead, late events stay lost, and the async-compaction harvest
    carries the new bases' stats (old files' stats dropped)."""
    lake.compact_target_file_rows = 4
    events = gen_events_pandas(0, 2500, seed=33, n_docs=180, dirty_frac=0.1)
    for bid, start in enumerate(range(0, 2500, 500)):
        chunk = events.iloc[start : start + 500]
        lake.merge(
            prepare_batch(_spark_events(spark, chunk)),
            bid,
            auto_compact_deltas=2,
            compact_mode="async",
        )
    lake.wait_for_compaction()
    oracle = oracle_reduce(events)
    all_ids = {f"doc-{n:08d}" for n in range(180)}
    dead = sorted(all_ids - set(oracle["doc_id"]))[:2]
    live = [str(k) for k in oracle["doc_id"].iloc[:3]]
    got = lake.read_keys(live + dead).toPandas()
    assert_pdf_equal(got, oracle[oracle["doc_id"].isin(live)])
    # stats reference only files the manifest still points at
    current = set(lake._bucket_files())
    assert set(lake._manifest["file_stats"]) <= current


# ------------------------- IcebergLakeTable (jar-gated) dry-run cover


def test_iceberg_merge_sql_text():
    """The production MERGE INTO path is jar-gated (no Iceberg runtime
    in this sandbox) — pin the generated SQL TEXT so it cannot rot
    silently (round-5, VERDICT r4 task 5): all three clauses present,
    both MATCHED clauses guarded by the late-event `_seq` rule, delete
    ordered before update (first matching WHEN wins in Spark SQL), and
    inserts never resurrect tombstones."""
    from investigraph_etl_spark.sources.lake import IcebergLakeTable

    sql = IcebergLakeTable.MERGE_SQL.format(
        table="cat.db.docs", source="_merge_src", key="doc_id"
    )
    flat = " ".join(sql.split())
    assert "MERGE INTO cat.db.docs t" in flat
    assert "USING _merge_src s" in flat
    assert "ON t.doc_id = s.doc_id" in flat
    delete = "WHEN MATCHED AND s.op = 'delete' AND s.event_sequence > t._seq THEN DELETE"
    update = "WHEN MATCHED AND s.event_sequence > t._seq THEN UPDATE SET *"
    insert = "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *"
    assert delete in flat and update in flat and insert in flat
    # clause ORDER is semantic: the guarded DELETE must precede the
    # guarded UPDATE or deletes would be applied as updates
    assert flat.index(delete) < flat.index(update) < flat.index(insert)
    # every data-changing clause is late-event-guarded or tombstone-safe
    assert flat.count("s.event_sequence > t._seq") == 2


def test_iceberg_requires_configured_runtime(spark):
    from investigraph_etl_spark.sources.lake import IcebergLakeTable

    with pytest.raises(RuntimeError, match="Iceberg runtime not configured"):
        IcebergLakeTable(spark, "cat.db.docs")


# -------------------- async-compaction concurrency property (task 6)


@pytest.mark.parametrize("seed", range(20))
def test_async_compaction_interleaved_reads_lww_equivalent(
    spark, tmp_path, seed
):
    """Randomized (seeded) multi-commit ingest with compact_mode='async':
    background folds overlap subsequent commits (lake.py merge →
    _harvest_compaction), and a read issued at ANY point — including
    while a fold is in flight — must see the exact LWW survivor set of
    the commits applied so far (round-5, VERDICT r4 task 6).  Also
    time-travels back to every recorded version at the end: harvested
    compaction commits must not have changed any snapshot's rows."""
    import random

    rng = random.Random(seed)
    n_commits = rng.choice([3, 4])
    chunk = rng.choice([200, 350])
    n_docs = rng.choice([40, 80])
    lake = HashLakeTable.create(
        spark, str(tmp_path / f"alake{seed}"), target_schema(), num_buckets=4
    )
    lake.compact_target_file_rows = rng.choice([4, 64])
    events = gen_events_pandas(
        0, n_commits * chunk, seed=seed, n_docs=n_docs, dirty_frac=0.15
    )
    snapshots = []  # (version, oracle prefix end)
    for bid in range(n_commits):
        part = events.iloc[bid * chunk : (bid + 1) * chunk]
        lake.merge(
            prepare_batch(_spark_events(spark, part)),
            bid,
            auto_compact_deltas=rng.choice([1, 2]),
            compact_mode="async",
        )
        snapshots.append((lake.version, (bid + 1) * chunk))
        # mid-flight read: the async fold from THIS commit may still be
        # running — the read must already be LWW-exact
        if rng.random() < 0.7:
            assert_pdf_equal(
                lake.read().toPandas(),
                oracle_reduce(events.iloc[: (bid + 1) * chunk]),
            )
    lake.wait_for_compaction()
    assert_pdf_equal(lake.read().toPandas(), oracle_reduce(events))
    # every recorded snapshot still reads to its own prefix's LWW state
    for version, end in snapshots:
        assert_pdf_equal(
            lake.read(version=version).toPandas(),
            oracle_reduce(events.iloc[:end]),
        )
