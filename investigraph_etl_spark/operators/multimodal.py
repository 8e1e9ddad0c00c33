"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct — the Spark-side plumbing (schema, batch iteration,
partition sizing) is real and tested; the actual codec work is stubbed
behind ``decoder=`` because no image/audio libraries ship in this
container (driver mandate: stub the decode, make the plumbing real).

Pattern: ``mapInPandas`` over Arrow batches — each batch hands the
decoder a ``pd.Series`` of byte payloads and gets back fixed-shape
feature rows.  Swap ``fake_feature_decoder`` for a real
PIL/torchaudio-backed one with zero plan changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("n_bytes", IntegerType(), True),
    ]
)


def real_decoder_stub(payloads: pd.Series) -> np.ndarray:
    """Where a real image/audio decode would run (PIL / libsndfile /
    ffmpeg are not in this container)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "inject a decoder via extract_features(decoder=...)"
    )


def fake_feature_decoder(payloads: pd.Series, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: digest bytes → fixed-dim float
    vector.  Keeps every Spark-side contract (batch in, (N, dim)
    float32 out) honest without codecs."""
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, b in enumerate(payloads):
        d = hashlib.sha256(bytes(b or b"")).digest()
        out[i] = np.frombuffer(d[: dim * 4], dtype=np.uint32).astype(np.float32) / 2**32
    return out


def extract_features(
    media: DataFrame,
    *,
    decoder: Callable[[pd.Series], np.ndarray] = real_decoder_stub,
    batch_hint: int | None = None,
) -> DataFrame:
    """binary payload → feature vectors via Arrow-batched mapInPandas.

    Scale: payloads never hit the driver; each task decodes its Arrow
    batches locally.  For multi-MB payloads set a smaller
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (``batch_hint``)
    so a batch fits executor memory.
    """
    if batch_hint:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_hint)
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = decoder(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "feature": list(feats),
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (decode stubbed).  Shows the explode-shape the real
    sampler uses."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )
