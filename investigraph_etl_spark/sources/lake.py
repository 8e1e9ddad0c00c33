"""LakeTable — Iceberg-style upsert table with a parquet fallback.

SURVEY.md §7.1: no Iceberg/Delta jars exist in this sandbox, so the
engine ships a thin lake abstraction with two backends behind one API
(``merge`` / ``read`` / ``add_columns`` / ``snapshot``):

* :class:`HashLakeTable` (always available) — hash-bucketed parquet
  directories + JSON manifest snapshots + an atomically-swapped
  version pointer.  Functionally an "Iceberg-lite": MVCC reads,
  bucket-pruned MERGE, additive schema evolution, idempotent commits.
* :class:`IcebergLakeTable` (config-gated) — issues real ``MERGE INTO``
  SQL when an Iceberg catalog is on the classpath.  Untestable here;
  the SQL path is kept ready and asserted for shape only.

Merge semantics (the core invariant, SURVEY.md §1.3): the batch is a
set of LWW-reduced change rows ``(key, op, event_sequence, payload…)``;
merging = last-writer-wins over ``target ∪ batch`` on
``(key, _seq)`` with delete-as-tombstone.  Tombstones are retained so
a *late* event older than a delete cannot resurrect a row — the
``WHEN MATCHED AND s.event_sequence > t._seq`` guard from SURVEY.md
§2.9 T5, expressed as a plain max-by reduce.

Scale design (100 TB / 10^10 events):
* the table is bucketed by ``xxhash64(key) % num_buckets`` — a MERGE
  touches only buckets present in the batch (partition pruning by
  file list, the manifest is the index);
* per-commit work ∝ (touched buckets' data + batch), never a full
  table rewrite;
* the LWW-union reduce is a hash aggregate with map-side combine —
  no sort, no row_number;
* manifests are O(num_buckets) JSON — at 4096 buckets still trivial.

Single-writer assumption: one committer at a time (Structured
Streaming's ``foreachBatch`` is sequential per query).  Matches the
reference's warning that parallel loads need a parallel-safe store
(/root/reference/docs/run/parallelization.md:17-19).
"""

from __future__ import annotations

import json
import os
import pathlib
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

_INTERNAL = [
    StructField("_seq", LongType(), True),
    StructField("_deleted", BooleanType(), True),
]


class HashLakeTable:
    """Hash-bucketed parquet table with snapshot manifests.

    Layout::

        <root>/_latest                  # version pointer (atomic rename)
        <root>/manifests/v<NNNNNN>.json # schema, bucket→files, commits
        <root>/data/c<version>/b=<k>/…  # data files written by commit v
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = pathlib.Path(root)
        self._manifest = self._load_manifest()

    # ---------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        *,
        key: str = "doc_id",
        num_buckets: int = 32,
        overwrite: bool = False,
    ) -> HashLakeTable:
        rootp = pathlib.Path(root)
        if (rootp / "_latest").exists():
            if not overwrite:
                return cls(spark, root)
            import shutil

            shutil.rmtree(rootp)
        (rootp / "manifests").mkdir(parents=True, exist_ok=True)
        (rootp / "data").mkdir(parents=True, exist_ok=True)
        manifest = {
            "version": 0,
            "key": key,
            "num_buckets": num_buckets,
            "schema": json.loads(schema.json()),
            "buckets": {},
            "commits": {},
            "lineage": [],
        }
        cls._write_manifest(rootp, manifest)
        return cls(spark, root)

    @staticmethod
    def _write_manifest(rootp: pathlib.Path, manifest: dict) -> None:
        v = manifest["version"]
        mpath = rootp / "manifests" / f"v{v:06d}.json"
        tmp = rootp / f"_latest.tmp.{uuid.uuid4().hex}"
        mpath.write_text(json.dumps(manifest))
        tmp.write_text(str(v))
        os.replace(tmp, rootp / "_latest")  # atomic pointer swap

    def _load_manifest(self) -> dict:
        v = int((self.root / "_latest").read_text())
        return json.loads((self.root / "manifests" / f"v{v:06d}.json").read_text())

    # ------------------------------------------------------ properties
    @property
    def key(self) -> str:
        return self._manifest["key"]

    @property
    def num_buckets(self) -> int:
        return self._manifest["num_buckets"]

    @property
    def schema(self) -> StructType:
        """Payload schema (without internal columns)."""
        return StructType.fromJson(self._manifest["schema"])

    @property
    def full_schema(self) -> StructType:
        return StructType(list(self.schema.fields) + list(_INTERNAL))

    @property
    def version(self) -> int:
        return self._manifest["version"]

    def snapshot(self) -> dict:
        return dict(self._manifest)

    def last_committed(self, stream_id: str = "default") -> int:
        return self._manifest["commits"].get(stream_id, -1)

    # ------------------------------------------------------------ read
    def _bucket_files(self, buckets: list[int] | None = None) -> list[str]:
        entries = self._manifest["buckets"]
        if buckets is None:
            keys = list(entries)
        else:
            keys = [str(b) for b in buckets if str(b) in entries]
        return [f for k in keys for f in entries[k]]

    def read_raw(self, buckets: list[int] | None = None) -> DataFrame:
        """All rows incl. tombstones and internal columns.  Passing
        ``buckets`` prunes the scan to those buckets' files."""
        files = self._bucket_files(buckets)
        if not files:
            return self.spark.createDataFrame([], self.full_schema)
        # explicit schema ⇒ files written before a column was added
        # read it back as null (additive evolution, SURVEY.md §2.9 T6)
        return self.spark.read.schema(self.full_schema).parquet(*files)

    def read(self) -> DataFrame:
        """Live rows, public schema."""
        cols = [f.name for f in self.schema.fields]
        return self.read_raw().filter(~F.col("_deleted")).select(*cols)

    # --------------------------------------------------------- evolve
    def add_columns(self, new_fields: list[StructField]) -> None:
        existing = {f.name for f in self.schema.fields}
        added = [f for f in new_fields if f.name not in existing]
        if not added:
            return
        schema = StructType(list(self.schema.fields) + added)
        self._manifest = {
            **self._manifest,
            "version": self.version + 1,
            "schema": json.loads(schema.json()),
        }
        self._write_manifest(self.root, self._manifest)

    # ----------------------------------------------------------- merge
    def merge(
        self,
        batch: DataFrame,
        batch_id: int,
        *,
        stream_id: str = "default",
        seq: str = "event_sequence",
        op: str = "op",
        salt_buckets: int = 0,
        winners_strategy: str = "broadcast",
    ) -> dict:
        """Apply one change batch (raw or pre-reduced — LWW runs here).

        In-batch dedup and the target-vs-batch merge are ONE pass:
        ``LWW(LWW(batch) ∪ target) ≡ LWW(batch ∪ target)``, so folding
        them halves the winner aggregations and broadcast builds
        (measured — BENCH.md).  ``salt_buckets``/``winners_strategy``
        forward to :func:`lww_dedup`.

        Exactly-once: Structured Streaming batch ids are monotonic and a
        retried batch re-runs with the same id, so a batch with
        ``batch_id <= last committed`` is a replay → skipped (the
        reference analog is tag-based source skip,
        /root/reference/investigraph/model/context.py:272-279).
        Returns commit stats.
        """
        if batch_id <= self.last_committed(stream_id):
            return {"skipped": True, "version": self.version}

        # 1. schema evolution: promote new payload columns
        meta = {self.key, seq, op}
        batch_payload = [f for f in batch.schema.fields if f.name not in meta]
        self.add_columns(batch_payload)
        pay_cols = [f.name for f in self.schema.fields]

        # 2. change rows → target row shape (+ internal columns)
        changes = batch.select(
            *[
                F.col(c).cast(self.schema[c].dataType)
                if c in batch.columns
                else F.lit(None).cast(self.schema[c].dataType).alias(c)
                for c in pay_cols
            ],
            F.col(seq).cast("long").alias("_seq"),
            (F.col(op) == F.lit("delete")).alias("_deleted"),
        )
        # deletes keep the key but null payload
        changes = changes.select(
            F.col(self.key),
            *[
                F.when(F.col("_deleted"), F.lit(None).cast(self.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                for c in pay_cols
                if c != self.key
            ],
            "_seq",
            "_deleted",
        )

        bucket_expr = F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.num_buckets))
        changes = changes.withColumn("_bucket", bucket_expr)

        # 3. prune: only buckets the batch touches are read & rewritten.
        # This extra action runs only a scan of the key column + a
        # distinct (≤ num_buckets rows out) — column pruning reaches the
        # source, and no join/LWW is in this plan branch.
        touched = sorted(
            r["_bucket"] for r in changes.select("_bucket").distinct().collect()
        )
        current = self.read_raw(touched).withColumn("_bucket", bucket_expr)

        # 4. single LWW over target ∪ batch: dedups within the batch AND
        # applies the _seq-max late-event guard against the target
        # (late/out-of-order events lose; a delete tombstone cannot be
        # resurrected by an older update).  _pref breaks target-vs-batch
        # ties (possible only when an already-applied event replays past
        # the commit-log check — content identical, keep the batch side).
        unioned = current.withColumn("_pref", F.lit(0)).unionByName(
            changes.withColumn("_pref", F.lit(1))
        )

        # (A co-partitioned exchange-reuse variant — shuffle payload once
        # by bucket, winner-agg and semi-join riding that partitioning —
        # was prototyped and measured WORSE: Catalyst pushes the semi
        # join through the union, duplicating the winner subplan, and a
        # struct-max agg degrades to SortAggregate.  Broadcast keeps the
        # payload shuffle count at one — the write's own — with a small
        # serial broadcast-build cost bounded by the batch's key count.)
        from investigraph_etl_spark.operators.lww import lww_dedup

        merged = lww_dedup(
            unioned,
            self.key,
            "_seq",
            extra_keys=("_pref",),
            salt_buckets=salt_buckets,
            winners_strategy=winners_strategy,
        ).drop("_pref")
        merged = merged.repartition(max(len(touched), 1), "_bucket")

        # 5. write one file set for the touched buckets — dynamic
        # partitionBy on _bucket (the data is already clustered by it);
        # NO global sort — sorting rows that carry token arrays
        # measurably inverse-scales (BENCH.md)
        out_version = self.version + 1
        out_dir = self.root / "data" / f"c{out_version:06d}"
        (
            merged.write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(str(out_dir))
        )
        new_files: dict[str, list[str]] = {}
        for bdir in out_dir.glob("_bucket=*"):
            b = bdir.name.split("=", 1)[1]
            new_files[b] = sorted(str(p) for p in bdir.glob("*.parquet"))

        # 6. commit: carry forward untouched buckets, swap pointer
        buckets = dict(self._manifest["buckets"])
        for b in touched:
            buckets[str(b)] = new_files.get(str(b), [])
        commits = {**self._manifest["commits"], stream_id: batch_id}
        lineage = self._manifest.get("lineage", [])[-200:] + [
            {"batch_id": batch_id, "stream_id": stream_id, "version": out_version,
             "touched_buckets": [int(b) for b in touched]}
        ]
        self._manifest = {
            **self._manifest,
            "version": out_version,
            "buckets": buckets,
            "commits": commits,
            "lineage": lineage,
        }
        self._write_manifest(self.root, self._manifest)
        return {
            "skipped": False,
            "version": out_version,
            "touched_buckets": len(touched),
        }


    # ----------------------------------------------------- maintenance
    def vacuum(self, *, keep_manifests: int = 10) -> dict:
        """Garbage-collect storage (the Iceberg ``expire_snapshots`` +
        ``remove_orphan_files`` analog).

        Merge is copy-on-write per touched bucket, so every commit
        supersedes the touched buckets' previous file sets — without
        GC, storage grows with Σ(batch writes), unbounded over a
        10^10-event replay.  Deletes every data file not referenced by
        the CURRENT manifest and expires all but the newest
        ``keep_manifests`` manifests.  Time travel to expired versions
        is gone afterwards; do not run concurrently with a reader
        pinned to an old snapshot (single-writer discipline, as with
        Iceberg maintenance)."""
        referenced = {
            f for files in self._manifest["buckets"].values() for f in files
        }
        removed = 0
        data = self.root / "data"
        for p in sorted(data.rglob("*"), reverse=True):
            if p.is_file() and str(p) not in referenced:
                p.unlink()
                removed += 1
            elif p.is_dir():
                try:
                    p.rmdir()  # only empties fall
                except OSError:
                    pass
        manifests = sorted((self.root / "manifests").glob("v*.json"))
        expired = manifests[:-keep_manifests] if keep_manifests > 0 else []
        for m in expired:
            m.unlink()
        return {"removed_files": removed, "expired_manifests": len(expired)}


class IcebergLakeTable:
    """Real-Iceberg backend: same API, SQL ``MERGE INTO`` execution.

    Requires ``iceberg-spark-runtime`` on the classpath and a configured
    catalog — not present in this sandbox (SURVEY.md §7.1), so this
    class only validates availability and composes the SQL.  The MERGE
    mirrors SURVEY.md §2.3 J4 with the late-event guard.
    """

    MERGE_SQL = """
        MERGE INTO {table} t
        USING {source} s
        ON t.{key} = s.{key}
        WHEN MATCHED AND s.op = 'delete' AND s.event_sequence > t._seq THEN DELETE
        WHEN MATCHED AND s.event_sequence > t._seq THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *
    """

    def __init__(self, spark: SparkSession, table: str, key: str = "doc_id"):
        if not any(
            "iceberg" in str(spark.conf.get(k, "") or "").lower()
            for k in ("spark.sql.extensions", "spark.sql.catalog.spark_catalog")
        ):
            raise RuntimeError(
                "Iceberg runtime not configured; use HashLakeTable instead"
            )
        self.spark, self.table, self.key = spark, table, key

    def merge(self, batch: DataFrame, batch_id: int, **_: object) -> dict:
        batch.createOrReplaceTempView("_merge_src")
        self.spark.sql(
            self.MERGE_SQL.format(table=self.table, source="_merge_src", key=self.key)
        )
        return {"skipped": False, "version": batch_id}


LakeTable = HashLakeTable
