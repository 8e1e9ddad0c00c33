"""Last-writer-wins dedup per key (SURVEY.md §2.5 W1, §2.4 A1).

Reference semantics: in-task fragment merge keyed by entity id —
"last fragment merges into accumulated state"
(/root/reference/investigraph/model/context.py:407-415).  North-rule
form: reduce each (micro)batch to ≤1 row per ``doc_id``, keeping the
row with the greatest ``event_sequence``.

Physical strategy — ``groupBy(key).agg(max_by(struct(*), seq))`` and
NOT a ``row_number()`` window:

* hash aggregate with **map-side partial aggregation**: each input
  partition first reduces locally to one row per key, so a hot key
  shuffles ~num_input_partitions rows instead of all its duplicates —
  the built-in cure for doc_id hot-key skew at this stage;
* a ranking window would shuffle *every* row to its key's partition and
  sort it there: strictly more data movement and a sort we don't need.

For pathological skew (one key ≫ everything, north-rule knob) an
explicit two-phase salted variant is provided: salt → per-(key,salt)
partial LWW → unsalt → final LWW.  With max_by's map-side combine the
two-phase path is rarely needed, but it bounds the reduce fan-in per
task deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    seq: str = "event_sequence",
    *,
    salt_buckets: int = 0,
) -> DataFrame:
    """Keep, per ``key``, only the row with the max ``seq``.

    One shuffle (hash-partition by key) with map-side combine; two
    shuffles when ``salt_buckets > 0`` (explicit skew mitigation).
    Ties on ``seq`` are impossible in a well-formed changelog
    (``event_sequence`` is globally unique); ``max_by`` would pick an
    arbitrary one otherwise.
    """
    payload = [c for c in df.columns if c != key]
    packed = F.max_by(F.struct(*payload), F.col(seq)).alias("_best")

    if salt_buckets > 0:
        # phase 1: spread each key over `salt_buckets` reducers; the salt
        # is a hash of the sequence → deterministic, uniform per event
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(seq)), F.lit(salt_buckets))
        )
        partial = salted.groupBy(key, "_salt").agg(packed)
        # phase 2: ≤ salt_buckets rows per key remain — trivial final reduce
        final = partial.select(key, F.col("_best.*")).groupBy(key).agg(packed)
    else:
        final = df.groupBy(key).agg(packed)
    return final.select(key, "_best.*")
