"""Tabular source readers + seed discovery (SURVEY.md §2.1 S1-S3).

The reference mimetype-sniffs pandas readers with a per-source
"pandas spec" (skiprows / encoding / dtype —
/root/reference/investigraph/logic/extract.py:13-26, fixture options
/root/reference/tests/fixtures/gdho/config.yml:26-31) and seeds
sources by globbing a store prefix
(/root/reference/investigraph/logic/seed.py:10-32).

Spark translation: one ``read_source`` that maps the same spec onto
``spark.read`` options; xlsx falls back to a driver-side pandas read
(small-file format, exactly how the reference treats it) gated behind
an import-try.  Every record is stamped with its source name — the
reference stamps ``__source__`` (context.py:285).
"""

from __future__ import annotations

import fnmatch
import pathlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Source:
    """A discovered/configured source (reference model/source.py:11-49).

    ``limit`` caps records read from this source (reference ``-l`` /
    ``Context.record_limit``, context.py:282-284); ``slug_columns``
    renames headers to snake_case on read (reference ``slugified_dict``
    over record keys, util.py:25-26)."""

    uri: str
    name: str | None = None
    # pandas-spec subset the reference exercises (gdho/ec_meetings)
    options: dict = field(default_factory=dict)
    # runpandarun-style ``operations:`` list (generic playbook dispatch,
    # round 5 — see sources/playbook.py; reference extract.md:30-46)
    operations: list = field(default_factory=list)
    limit: int | None = None
    slug_columns: bool = False

    def __post_init__(self) -> None:
        if self.name is None:
            if "://" in self.uri:
                from urllib.parse import urlparse

                self.name = pathlib.Path(urlparse(self.uri).path).stem or "source"
            else:
                self.name = pathlib.Path(self.uri).stem


def seed_sources(
    prefix: str,
    *,
    pattern: str = "*",
    exclude: str | None = None,
) -> list[Source]:
    """Glob a directory prefix into Sources with include/exclude
    filters (reference logic/seed.py:10-32: ``glob``/``exclude`` over a
    store listing)."""
    base = pathlib.Path(prefix)
    out = []
    for p in sorted(base.rglob(pattern)):
        if not p.is_file():
            continue
        rel = str(p.relative_to(base))
        if exclude and fnmatch.fnmatch(rel, exclude):
            continue
        out.append(Source(uri=str(p)))
    return out


_ENCODING_ALIASES = {"latin": "ISO-8859-1", "latin1": "ISO-8859-1"}


def fetch_to_spool(
    uri: str, cache_dir: str | None = None, timeout: float = 60.0
) -> str:
    """Fetch a remote (http/https) source to a local spool file and
    return the local path — cached ADDRESSED BY URI (one spool entry
    per uri; the body is not checksummed — a changed remote body behind
    the same uri reuses the stale cache entry until it is deleted),
    so repeat runs reuse the download (the reference's archive-cache
    behavior, /root/reference/investigraph/model/context.py:349-374).
    Driver-side on purpose: reference sources are single tabular files
    (the same reason the xlsx path is driver-side); a 100 TB lake
    ingests from object storage the Spark readers address natively,
    not via per-file HTTP.

    Concurrency-safe (round-4, ADVICE r3): the temp name carries a
    uuid, not just the pid, so two threads in one process fetching the
    same uri cannot clobber each other's partial download; the final
    ``os.replace`` is atomic, so concurrent fetchers converge on one
    complete file.  ``timeout`` bounds the socket (urlretrieve has no
    timeout parameter)."""
    import hashlib
    import os
    import tempfile
    import urllib.request
    import uuid
    from urllib.parse import urlparse

    cache = pathlib.Path(
        cache_dir
        or os.environ.get("INVESTIGRAPH_SPOOL")
        or pathlib.Path(tempfile.gettempdir()) / "investigraph_spool"
    )
    cache.mkdir(parents=True, exist_ok=True)
    name = pathlib.Path(urlparse(uri).path).name or "source"
    key = hashlib.sha256(uri.encode("utf-8")).hexdigest()[:16]
    dest = cache / f"{key}-{name}"
    if not dest.exists():
        tmp = cache / f"{dest.name}.part.{os.getpid()}.{uuid.uuid4().hex}"
        try:
            with urllib.request.urlopen(uri, timeout=timeout) as resp, open(
                tmp, "wb"
            ) as fh:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    fh.write(chunk)
            os.replace(tmp, dest)  # atomic: concurrent fetchers converge
        finally:
            if tmp.exists():
                tmp.unlink(missing_ok=True)
    return str(dest)


def read_source(spark: SparkSession, source: Source) -> DataFrame:
    """Read one tabular source per its spec; stamps ``__source__``.

    Spec keys (reference pandas-spec parity):
      ``skiprows`` (int) — junk preamble lines before the header
      ``encoding`` (str) — e.g. ``latin``
      ``dtype: str`` — all columns as strings (no inference)
      ``multiline`` (bool) — quoted newlines in fields
    """
    if source.uri.startswith(("http://", "https://")):
        import dataclasses

        source = dataclasses.replace(source, uri=fetch_to_spool(source.uri))
    opts = dict(source.options)
    suffix = pathlib.Path(source.uri).suffix.lower()
    if suffix not in (".xlsx", ".xls", ".json", ".jsonl", ".ndjson",
                      ".parquet", ".csv", ".tsv", ".txt"):
        # extensionless / unknown-suffix URI: sniff the content —
        # the reference dispatches on the resource mimetype
        # (guess_handler_from_mimetype, logic/extract.py:21); local
        # spool files carry no Content-Type, so magic bytes stand in
        suffix = _sniff_suffix(source.uri)
    if suffix in (".xlsx", ".xls"):
        df = _read_excel_driver(spark, source, opts)
    elif suffix in (".json", ".jsonl", ".ndjson"):
        df = spark.read.json(source.uri)
    elif suffix == ".parquet":
        df = spark.read.parquet(source.uri)
    else:
        df = _read_csv(spark, source, opts)
    if source.operations:
        from investigraph_etl_spark.sources.playbook import apply_operations

        df = apply_operations(df, source.operations)
    if source.slug_columns:
        from investigraph_etl_spark.functions.ids import slugify_columns

        df = slugify_columns(df)
    if source.limit is not None:
        # P9 record limit: Catalyst pushes LocalLimit below the stamp
        # projection into the scan — no full read happens
        df = df.limit(source.limit)
    return df.withColumn("__source__", F.lit(source.name))


def _sniff_suffix(uri: str) -> str:
    """Content sniffing for URIs whose extension names no known format
    (round-5, VERDICT r4 item 8 — the reference's
    ``guess_handler_from_mimetype`` analog for spooled local files):
    zip magic → xlsx, parquet magic → parquet, a leading '{'/'[' →
    JSON, anything else → CSV (the reference's own default)."""
    try:
        with open(uri, "rb") as fh:
            head = fh.read(64)
    except OSError:
        return ".csv"
    if head[:4] == b"PK\x03\x04":
        return ".xlsx"
    if head[:4] == b"PAR1":
        return ".parquet"
    stripped = head.lstrip()
    if stripped[:1] in (b"{", b"["):
        return ".json"
    return ".csv"


def _read_csv(spark: SparkSession, source: Source, opts: dict) -> DataFrame:
    reader = spark.read.option("header", True)
    enc = opts.get("encoding")
    if enc:
        reader = reader.option("encoding", _ENCODING_ALIASES.get(enc, enc))
    if opts.get("multiline"):
        reader = reader.option("multiLine", True).option("escape", '"')
    if not (opts.get("dtype") == "str" or opts.get("dtype") is str):
        reader = reader.option("inferSchema", False)  # strings by default
    skip = int(opts.get("skiprows", 0))
    if skip:
        # Spark CSV has no skiprows; rewrite the file without the first
        # N physical lines, preserving order.  coalesce(1) is REQUIRED
        # for correctness here, not a perf accident: line order (and
        # hence monotonically_increasing_id) is only global on a single
        # partition.  This is fine for the reference's use of skiprows
        # (junk preamble in small hand-maintained CSVs, e.g. the gdho
        # fixture); for a BIG csv with a preamble, strip the head once
        # out-of-band instead — a distributed order-preserving line
        # drop would force a global sort for no benefit.
        text = spark.read.text(source.uri).coalesce(1)
        body = (
            text.withColumn("_i", F.monotonically_increasing_id())
            .filter(F.col("_i") >= skip)
            .drop("_i")
        )
        import tempfile

        tmp = tempfile.mkdtemp(prefix="skiprows_")
        body.write.mode("overwrite").text(tmp)
        return reader.csv(tmp)
    return reader.csv(source.uri)


def _read_excel_driver(spark: SparkSession, source: Source, opts: dict) -> DataFrame:
    """xlsx via driver-side pandas (the reference's own strategy —
    extract.py materializes a pandas frame first).  Gated: openpyxl may
    be absent."""
    try:
        import pandas as pd

        pdf = pd.read_excel(
            source.uri,
            skiprows=int(opts.get("skiprows", 0)),
            dtype=str if opts.get("dtype") in ("str", str) else None,
        )
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "xlsx reading needs openpyxl, not present in this environment"
        ) from e
    if opts.get("fillna") is not None:
        pdf = pdf.fillna(opts["fillna"])
    pdf = pdf.astype(object).where(pdf.notna(), None)  # NaN→None (extract.py:25)
    return spark.createDataFrame(pdf)
