"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shape, ``mapInPandas``
signatures, partition sizing) is real and tested; the actual media decode
is stubbed behind ``_decode_image_stub`` because no image/audio libraries
exist in this container — swap the stub for PIL/ffmpeg calls in production,
nothing else changes.

Scale notes: media rows are large (MBs) — ``mapInPandas`` with a small
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory;
feature extraction emits small fixed-width rows, so the output shuffle is
cheap regardless of input size.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque bytes
        StructField("width", IntegerType()),     # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),  # 16-dim embedding stub
    ]
)


def generate_media(spark, n_rows: int) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    the id (so tests are stable); kinds cycle image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.concat(F.lit("MEDIA:"), F.col("id"), F.repeat(F.lit("x"), (F.pmod(F.col("id"), F.lit(64)) * 16).cast("int")))
    return spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/fake")).alias("mime"),
        payload.cast("binary").alias("payload"),
        (F.lit(64) + F.pmod(F.col("id"), F.lit(256))).cast("int").alias("width"),
        (F.lit(64) + F.pmod(F.col("id") * 3, F.lit(256))).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(60000))).alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake decode — real impl would be
    ``PIL.Image.open(io.BytesIO(payload))``.  Derives a 16-dim float vector
    from the payload bytes so downstream plumbing is fully testable."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    return arr.reshape(4, 16).mean(axis=0) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: large binary in, small vector out."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, max_dim: int = 224) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side; byte transform is the
    stub (identity) — a real impl swaps `_resize_payload` only."""
    scale = F.least(
        F.lit(max_dim) / F.col("width"), F.lit(max_dim) / F.col("height"), F.lit(1.0)
    )
    return media.withColumn("target_w", (F.col("width") * scale).cast("int")).withColumn(
        "target_h", (F.col("height") * scale).cast("int")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset —
    the explode happens JVM-side; actual frame decode is the stubbed step."""
    frames = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def decode_is_stubbed() -> bool:
    """Marker for callers/tests: media decode is a deterministic fake."""
    return True
