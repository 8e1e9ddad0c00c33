"""Deterministic hash sampling / splitting — training-data mixture ops.

Training pipelines need sampling that is (a) reproducible across runs
and engines (no RNG state, no partition-order dependence — Spark's
``df.sample`` is neither), (b) stable under resampling (lowering a
fraction yields a strict subset, so mixture weights can be retuned
without re-materializing), and (c) a pure narrow filter that pushes
into the scan at 100 TB.

The primitive: ``u(key) = int(md5(key ∥ salt)[:8 hex]) / 2^32`` — a
uniform [0,1) value derived only from the row's key.  Keep a row iff
``u < fraction``; assign splits by cumulative ranges of the same
``u``.  md5-hex parses identically in Spark (``conv(substr(...),16,
10)``) and DuckDB (``CAST('0x'||substr(...) AS BIGINT)``), which is
what makes the driver-gate oracle exact.

Zero shuffle, zero UDF; different ``salt`` values give independent
draws (per-epoch subsampling, A/B holdouts).

Reference scope: the reference has no sampling op (its ``-l`` record
limit is a debug head, SURVEY.md §2.2 P9) — mandate §2.11.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(2**32)


def hash_long(key: Column | str, *, salt: str = "") -> Column:
    """The raw 32-bit hash value behind :func:`hash_uniform`, as a
    non-negative long — for ordering/bucketing uses where float
    precision has no business existing."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(F.concat(k.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("long")


def hash_uniform(key: Column | str, *, salt: str = "") -> Column:
    """Deterministic uniform [0,1) value per key (md5-based)."""
    return hash_long(key, salt=salt) / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame, fraction: float, *, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible,
    subset-stable (fraction f' < f selects a subset of f's rows)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_uniform(key_col, salt=salt) < fraction)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    key_col: str,
    stratum_col: str,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep fractions (the mixture-weighting pass):
    ``fractions`` maps stratum value → fraction; unlisted strata keep
    ``default``.  One narrow CASE filter, no join, no shuffle."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} out of [0, 1]")
    frac = reduce(
        lambda acc, kv: acc.when(F.col(stratum_col) == kv[0], F.lit(kv[1])),
        fractions.items(),
        F.when(F.lit(False), F.lit(0.0)),
    ).otherwise(F.lit(float(default)))
    return df.filter(hash_uniform(key_col, salt=salt) < frac)


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    *,
    key_col: str,
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign every row a named split by cumulative hash ranges —
    e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}``.  Weights
    must sum to 1 (±1e-9).  A key always lands in the same split,
    across runs, engines, and cluster sizes."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_uniform(key_col, salt=salt)
    expr = None
    cum = 0.0
    items = list(splits.items())
    for name, w in items[:-1]:
        cum += w
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def mixture_resample(
    df: DataFrame,
    *,
    key_col: str,
    domain_col: str,
    temperature: float,
    salt: str = "",
    keep_col: str = "keep_frac",
) -> DataFrame:
    """Temperature-scaled domain mixture resampling — the data-mixing
    stage multilingual / multi-domain training corpora go through
    (exponentiated-count sampling: Lample & Conneau XLM '19 §3.1,
    Raffel et al. T5 '20 §3.4.1): target domain shares ∝ n_d^(1/T),
    so T > 1 flattens the mixture toward uniform (upweights small
    domains) and T = 1 keeps natural proportions.

    Downsample-only formulation (no row duplication): keep fraction
    ``keep_d = n_d^(1/T−1) / max_d' n_d'^(1/T−1)`` — the most-boosted
    domain keeps everything, every other domain thins toward the
    target shape.  Rows pass the same deterministic
    :func:`hash_uniform` filter as every sampler here, so the result
    is reproducible, engine-portable (exact DuckDB oracle), and
    retunes to a new T without re-materializing upstream.

    Scale shape: ONE count agg (map-side combine, |domains| rows) →
    broadcast keep-fraction table → narrow filter; the corpus itself
    never crosses a shuffle.  Rows with a NULL domain are dropped
    (equi-join semantics, same in the oracle).
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    expo = 1.0 / temperature - 1.0
    w = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(domain_col, F.pow(F.col("_n"), F.lit(expo)).alias("_w"))
    )
    wmax = w.agg(F.max("_w").alias("_wmax"))
    keep = (
        w.crossJoin(F.broadcast(wmax))
        .select(domain_col, (F.col("_w") / F.col("_wmax")).alias("_keep"))
    )
    return (
        df.join(F.broadcast(keep), on=domain_col)
        .where(hash_uniform(key_col, salt=salt) < F.col("_keep"))
        .withColumn(keep_col, F.round(F.col("_keep"), 6))
        .drop("_keep")
    )


def shuffle_shards(
    df: DataFrame,
    *,
    key_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic training-order shuffle WITHOUT a global sort —
    the epoch-shuffle pass a training-data pipeline runs before
    writing shards.

    Each row gets ``shard = h(key∥salt) % n_shards`` and ``pos`` = its
    rank within the shard by ``(h, key)``; reading shards in
    ``(shard, pos)`` order is a reproducible pseudo-random global
    permutation that depends only on ``(key, salt)`` — a new salt is a
    new epoch order, the same salt reproduces the run bit-for-bit on
    any engine or cluster size.

    Scale shape: NO range exchange (a naive ``ORDER BY hash`` is a
    global sort — the thing to avoid at 100 TB); rows hash-partition
    by shard and each shard sorts independently inside its partition.
    The md5 math is hash-uniform, so shards are skew-free by
    construction.  Ties in the 32-bit hash break on the key —
    total order, fully deterministic, exactly reproducible in the
    DuckDB oracle (same md5 → same ranks)."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = hash_long(key_col, salt=salt)
    out = df.withColumn("_h", h).withColumn(
        shard_col, F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_h"), F.col(key_col))
    return out.withColumn(pos_col, F.row_number().over(w)).drop("_h")
