"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline first-class citizens (driver mandate).  Scale
notes per operator:

* exact: one hash-agg shuffle with map-side combine — scales linearly.
* n-gram Jaccard (exact): shingle-explode + self-equi-join on shingle —
  the *baseline*; cost grows with shingle document frequency, so a
  ``max_shingle_df`` cap (off by default to preserve oracle parity)
  drops stop-shingles at scale.
* MinHash-LSH: the 100 TB path — signatures via one hash-agg (k min's),
  banding turns all-pairs into per-bucket candidate generation; cost ∝
  data + candidate pairs, never n².
* SimHash: one 64-bit fingerprint per doc via bit-majority of token
  hashes; near-dups = small Hamming distance; bucketable by rotation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.operators.textstats import words
from investigraph_etl_spark.partitioning import fan_out


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts by md5; canonical = min id (deterministic).
    Returns (text_hash, canonical_id, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (the Jaccard/MinHash unit)."""
    ws = F.transform(words(text), lambda w: F.lower(w))
    k = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    # short docs (< n words): fall back to the whole text as one shingle
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array(F.array_join(ws, " "))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    Plan: per-doc distinct shingles → explode → self-join on shingle →
    per-pair intersection count → Jaccard from |A|,|B|,|A∩B|.  The
    self-join is an equi-join Catalyst can shuffle-hash; AQE splits
    skewed shingle keys.  ``max_shingle_df`` drops shingles appearing
    in more than that many docs (stop-shingle cap for web scale).
    """
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    sizes = sh.select("id", "n_sh")
    ex = sh.select("id", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        # stop-shingle cap: aggregate doc-frequency (map-side combine)
        # and semi-join back — cheaper than a count window at scale
        rare = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        ex = ex.join(rare, "shingle", "left_semi")
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    *,
    n: int = 3,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of
    xxhash64(shingle, salt_i).  One explode + one hash-agg computing all
    k minimums simultaneously (map-side combine ⇒ shuffle carries one
    row per doc per partition)."""
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows of
    ``num_hashes/bands`` values, hash each band, self-join per
    (band_ix, band_hash) bucket → candidate pairs (id_a < id_b) with the
    number of agreeing bands.  All-pairs never materializes."""
    r = num_hashes // bands
    sig = minhash_signatures(
        df, n=n, num_hashes=num_hashes, text_col=text_col, id_col=id_col, seed=seed
    )
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_ix"),
                        F.xxhash64(
                            *[F.element_at("signature", b * r + j + 1) for j in range(r)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_ix", "band.band_hash")
    a, b = band_rows.alias("a"), band_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_ix") == F.col("b.band_ix"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: majority vote of token-hash bits.

    Pure column expressions: explode tokens → per-(doc, bit) sum of
    ±1 → reassemble.  Compact alternative used here: aggregate the
    token array directly with a 64-slot vector fold (no explode, no
    shuffle at all — per-row lambda over the token array)."""
    ws = F.transform(words(F.col(text_col)), lambda w: F.lower(w))
    hashes = F.transform(ws, lambda w: F.xxhash64(w))
    # bit masks as a literal array (shift amounts must be Python ints in
    # Spark, so mask-AND instead of shifts; bit 63 = sign-bit mask)
    masks = F.array(
        *[F.lit(1 << i).cast("long") for i in range(63)],
        F.lit(-(1 << 63)).cast("long"),
    )
    # votes[bit] = Σ tokens (bit set ? +1 : -1)
    init = F.array_repeat(F.lit(0).cast("long"), 64)
    votes = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda v, m: v + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    bits = F.zip_with(
        votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
    )
    sim = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))
    return fan_out(df).select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, *, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k, using the
    block-rotation trick: split the 64-bit hash into (k+1) blocks — two
    hashes within distance k must agree exactly on ≥1 block — join per
    (block_ix, block_value) then verify with bit_count(xor)."""
    blocks = max_hamming + 1
    width = 64 // blocks
    s = simhash(df, text_col=text_col, id_col=id_col)
    rows = s.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_ix"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("blk"),
    ).select("id", "simhash", "blk.block_ix", "blk.block_val")
    a, b = rows.alias("a"), rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_ix") == F.col("b.block_ix"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand
