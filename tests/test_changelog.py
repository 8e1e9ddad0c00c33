"""Generator & oracle sanity: determinism, knobs, reducer semantics."""

from __future__ import annotations

import pandas as pd

from investigraph_etl_spark.changelog import (
    gen_events_pandas,
    normalize_pandas,
    oracle_reduce,
    read_changelog_pandas,
    write_changelog,
)


def test_generator_deterministic_and_partition_invariant():
    whole = gen_events_pandas(0, 500, seed=7)
    parts = pd.concat(
        [gen_events_pandas(0, 123, seed=7), gen_events_pandas(123, 377, seed=7)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_generator_mix_and_dirt():
    df = gen_events_pandas(0, 5000, seed=42, dirty_frac=0.1)
    ops = df["op"].value_counts(normalize=True)
    assert 0.5 < ops["insert"] < 0.7
    assert 0.2 < ops["update"] < 0.4
    assert 0.05 < ops["delete"] < 0.15
    # deletes carry null payload
    dels = df[df["op"] == "delete"]
    assert dels["tokens"].isna().all() and dels["n_tok"].isna().all()
    # some rows need cleaning
    assert (df["source"].str.strip().str.lower() != df["source"]).any()
    # some n_tok corrupt vs actual token length
    live = df[df["op"] != "delete"]
    actual = live["tokens"].map(len)
    assert (live["n_tok"] != actual).any() and (live["n_tok"] == actual).mean() > 0.9


def test_skew_knob():
    df = gen_events_pandas(0, 5000, seed=1, skew_frac=0.5, n_hot=2, n_docs=10_000)
    top = df["doc_id"].value_counts(normalize=True)
    assert top.iloc[:2].sum() > 0.4


def test_normalize_pandas():
    df = gen_events_pandas(0, 2000, seed=3, dirty_frac=0.2)
    norm = normalize_pandas(df)
    assert set(norm["source"].dropna().unique()) <= {"web", "books", "code", "wiki"}
    live = norm[norm["op"] != "delete"]
    assert (live["n_tok"] == live["tokens"].map(len)).all()


def test_oracle_reduce_semantics():
    ev = pd.DataFrame(
        {
            "event_sequence": [1, 2, 3, 4, 5],
            "op": ["insert", "update", "insert", "delete", "insert"],
            "doc_id": ["a", "a", "b", "b", "c"],
            "tokens": [[1], [2, 3], [4], None, [5]],
            "n_tok": pd.array([1, 2, 1, None, 1], dtype="Int32"),
            "source": ["web", "web", "code", None, "  WIKI "],
            "event_time": pd.to_datetime([0, 1, 2, 3, 4], unit="s"),
        }
    )
    final = oracle_reduce(ev)
    state = {r.doc_id: r for r in final.itertuples()}
    assert set(state) == {"a", "c"}  # b deleted
    assert state["a"].tokens == [2, 3]
    assert state["c"].source == "wiki"
    # tombstones visible when asked
    raw = oracle_reduce(ev, with_tombstones=True)
    assert set(raw["doc_id"]) == {"a", "b", "c"}


def test_write_read_changelog_roundtrip(tmp_path):
    files = write_changelog(
        str(tmp_path / "log"), 2500, chunk_size=1000, seed=42, shuffle_window=50,
        evolution_at=2000,
    )
    assert len(files) == 3
    back = read_changelog_pandas(str(tmp_path / "log"))
    assert len(back) == 2500
    assert set(back["event_sequence"]) == set(range(2500))
    # evolution: lang present only for late events
    assert back.loc[back["event_sequence"] >= 2000, "lang"].notna().all()
    assert back.loc[back["event_sequence"] < 2000, "lang"].isna().all()
