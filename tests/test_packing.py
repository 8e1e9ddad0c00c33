"""Sequence packing: span math, lossless reassembly, fixed-length
invariant, determinism across partitionings."""

from __future__ import annotations

import random

import pytest

from investigraph_etl_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(13)
    rows = [
        (
            f"s{rng.randrange(3)}",
            i,
            [rng.randrange(50000) for _ in range(rng.choice([0, 3, 17, 64, 131]))],
        )
        for i in range(120)
    ]
    return spark.createDataFrame(
        [(s, i, t, len(t)) for s, i, t in rows],
        "source string, doc_id long, tokens array<int>, n_tok int",
    )


def _oracle_spans(pdf, C):
    """Driver-side reference: literal concat-then-chop per shard."""
    out = []
    for shard, g in pdf.groupby("source"):
        off = 0
        for _, r in g.sort_values("doc_id").iterrows():
            n = r["n_tok"]
            if n <= 0:
                continue
            for b in range(off // C, (off + n - 1) // C + 1):
                a, e = max(b * C - off, 0), min((b + 1) * C - off, n)
                out.append((shard, b, r["doc_id"], a, e, list(r["tokens"])[a:e]))
            off += n
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


def test_spans_match_reference(spark, docs):
    got = sorted(
        (
            (r["shard"], r["seq_id"], r["doc_id"], r["tok_start"], r["tok_end"],
             list(r["piece"]))
            for r in pack_sequences(docs, max_len=64).collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    assert got == _oracle_spans(docs.toPandas(), 64)


def test_assembled_sequences_fixed_length_and_lossless(spark, docs):
    seqs = pack_sequences(docs, max_len=64, assemble=True).collect()
    pdf = docs.toPandas()
    by_shard = {}
    for r in sorted(seqs, key=lambda r: (r["shard"], r["seq_id"])):
        by_shard.setdefault(r["shard"], []).extend(r["seq_tokens"])
        # every sequence is exactly max_len except a shard's last
        last_seq = max(s["seq_id"] for s in seqs if s["shard"] == r["shard"])
        if r["seq_id"] < last_seq:
            assert r["seq_len"] == 64
        else:
            assert 0 < r["seq_len"] <= 64
    for shard, g in pdf.groupby("source"):
        flat = [
            t
            for _, row in g.sort_values("doc_id").iterrows()
            for t in row["tokens"]
        ]
        assert by_shard.get(shard, []) == flat, f"shard {shard} not lossless"


def test_packing_invariant_to_input_partitioning(spark, docs):
    a = pack_sequences(docs, max_len=32).collect()
    b = pack_sequences(docs.repartition(7), max_len=32).collect()
    key = lambda r: (r["shard"], r["seq_id"], r["doc_id"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: t[:3]) == sorted(
        map(tuple, b), key=lambda t: t[:3]
    )


def test_packing_rejects_bad_max_len(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, max_len=0)
