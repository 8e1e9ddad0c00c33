"""Last-writer-wins dedup per key (SURVEY.md §2.5 W1, §2.4 A1).

Reference semantics: in-task fragment merge keyed by entity id —
"last fragment merges into accumulated state"
(/root/reference/investigraph/model/context.py:407-415).  North-rule
form: reduce each (micro)batch to ≤1 row per ``doc_id``, keeping the
row with the greatest ``event_sequence``.

Physical strategy — measured, not guessed (see BENCH.md):

* ``max_by(struct(payload…))`` and ranking windows both force
  **SortAggregate / Sort** because the agg buffer (or sort row)
  carries the variable-length token arrays — at 2M events that plan
  *inversely* scaled with cores (sorting MBs of array payload per
  task, twice).
* The winning plan is **narrow-winner + semi-join**:
    1. ``winners = groupBy(key).agg(max(seq))`` — fixed-width buffer →
       whole-stage-codegen HashAggregate with map-side partial agg;
       column pruning means this branch never reads the payload.
    2. ``events ⋉ winners on (key, seq)`` — a semi join that AQE
       converts to **broadcast** when the winner set is small (the
       common micro-batch case): the payload then has ZERO shuffles
       and ZERO sorts end-to-end.
  At 10^10-event scale the winner set of a micro-batch is bounded by
  its distinct keys; if it outgrows the broadcast threshold AQE falls
  back to a shuffled hash join — still sort-free.

``seq`` must be unique per key within ``df`` (changelog contract:
``event_sequence`` is globally unique) or duplicates survive; the lake
merge adds an explicit tiebreak column for its target∪batch union
(sources/lake.py).
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
    extra_keys: tuple[str, ...] = (),
    winners_strategy: str = "broadcast",
    auto_count_max_keys: int = 2_000_000,
) -> DataFrame:
    """Keep, per ``key``, only the row with the max ``(seq, *extra_keys)``.

    ``salt_buckets > 0`` adds an explicit two-phase reduce for
    pathological single-key skew (north-rule knob): phase 1 reduces
    each (key, salt) slice, phase 2 reduces the ≤``salt_buckets``
    survivors.  Both phases stay narrow (no payload).

    ``winners_strategy`` picks the semi-join physical form:

    * ``"broadcast"`` (default) — the winner set of a micro-batch is its
      distinct-key count × ~24B; even a 10M-key batch broadcasts in
      ~0.25GB.  The payload side then has ZERO shuffle and ZERO sort.
      Left to AQE, a winner set past ``autoBroadcastJoinThreshold``
      (10MB) silently degrades to a sort-merge join that shuffles AND
      SORTS the full payload — measured 10× slower with 30× the GC
      (BENCH.md) — so the strategy is explicit, not inferred.
    * ``"shuffle_hash"`` — for batches whose key set genuinely cannot
      broadcast: one payload shuffle, hash probe, still no sort.
    * ``"auto"`` — defer to Catalyst/AQE.
    * ``"auto_count"`` — size-based pick (round-2, VERDICT item 7): one
      extra *narrow* job counts the winner set (scan of key+order
      columns only — the payload is never touched), then broadcast if
      it fits ``auto_count_max_keys``, else shuffle_hash.  Removes the
      "caller must remember the knob" failure mode for bulk replays
      with 10⁷⁺ distinct keys, at the cost of one cheap count per call.
    """
    order_cols = [seq, *extra_keys]
    # scalar max for the single-order-key hot path: max over a STRUCT
    # forces SortAggregate (struct comparisons aren't hash-aggregable),
    # while max over a plain long stays inside whole-stage-codegen
    # HashAggregate with map-side combine — asserted in
    # tests/test_plans.py.  The struct form only runs when a tiebreak
    # column is genuinely needed (lake read-time LWW on (_seq,
    # _commit)), and even then sorts only the narrow key projection.
    if extra_keys:
        pick = F.max(F.struct(*order_cols)).alias("_w")
        unpack = lambda w: w.select(key, "_w.*")  # noqa: E731
    else:
        pick = F.max(F.col(seq)).alias(seq)
        unpack = lambda w: w  # noqa: E731

    narrow = df.select(key, *order_cols)
    if salt_buckets > 0:
        salted = narrow.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(seq)), F.lit(salt_buckets))
        )
        partial = unpack(salted.groupBy(key, "_salt").agg(pick)).select(
            key, *order_cols
        )
        winners = unpack(partial.groupBy(key).agg(pick))
    else:
        winners = unpack(narrow.groupBy(key).agg(pick))

    if winners_strategy == "auto_count":
        n_keys = winners.count()
        winners_strategy = (
            "broadcast" if n_keys <= auto_count_max_keys else "shuffle_hash"
        )
    if winners_strategy == "broadcast":
        winners = F.broadcast(winners)
    elif winners_strategy == "shuffle_hash":
        winners = winners.hint("shuffle_hash")
    return df.join(winners, on=[key, *order_cols], how="left_semi")
