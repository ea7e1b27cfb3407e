"""Multimodal (image/audio/video) column plumbing (north star).

Media are opaque ``binary`` columns plus typed metadata columns —
the standard lakehouse pattern (parquet stores the bytes; Spark never
interprets them until an explicit decode step). Decode/feature-extract
run as Arrow-batched ``mapInPandas`` / pandas UDFs so bytes cross the
JVM↔Python boundary once per batch, not per row.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are STUBBED: ``decode_image_stub`` produces deterministic
fake features derived from the bytes. The Spark-side plumbing — schema,
batch iteration, partitioning, UDF signatures — is real and tested;
swapping the stub for a real codec changes one inner function.

100 TB notes: binary payloads dominate partition sizing — set
``maxRecordsPerFile`` / ``files.maxPartitionBytes`` by payload size, not
row count; never groupBy/shuffle raw bytes (extract features first, then
drop the payload column before any wide transform).
"""

from __future__ import annotations

from collections.abc import Iterator

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
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (no codecs in this container):
    payload bytes are a seeded function of media_id."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 31 + j * 7) % 256) for j in range(128 + (i % 5) * 16))
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, payload, f"application/x-fake-{kind}", 64 + i % 32, 48 + i % 24, 1000 * (1 + i % 10)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decode kernel — deterministic fake feature vector from bytes.

    A real implementation would decode with PIL and pool pixels; this
    container has no image libs, so we hash-pool the raw bytes instead
    (keeps the full pipeline testable and deterministic).
    """
    if payload is None:
        raise NotImplementedError("real image decoding requires PIL — not in this container")
    acc = [0.0] * dim
    for j, b in enumerate(payload):
        acc[j % dim] += float(b)
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def extract_features(df: DataFrame, dim: int = 8, batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, one Python roundtrip per batch, output drops the
    payload immediately (never shuffle raw bytes)."""

    from nyc_tlc_trip_data_pipelines_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "feature": pdf["payload"].map(lambda b: decode_image_stub(b, dim)),
                }
            )

    return df.mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plan for video rows: explodes a frame-timestamp
    index per video (metadata-driven — the decode of each frame stays
    stubbed). Shows the explode-then-process shape used for real frame
    extraction at scale."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )
    return frames


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_image_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize kernel (no PIL in this container): deterministic
    truncate/cycle of the source bytes to w*h length. Swap for a real
    ``PIL.Image.resize`` without touching the Spark plumbing.

    Raises NotImplementedError for non-positive targets the way a real
    codec would reject a bad geometry.
    """
    if w <= 0 or h <= 0:
        raise NotImplementedError("real codec required for degenerate geometry")
    need = w * h
    if not payload:
        return b"\x00" * need
    reps = need // len(payload) + 1
    return (payload * reps)[:need]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image rows to (width, height) via Arrow-batched
    mapInPandas — bytes cross the JVM boundary once per batch. Only
    ``kind == 'image'`` rows are sent to Python (filter pushed to the
    scan); payload size is metadata-checked downstream, not decoded."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": width,
                    "out_height": height,
                    "payload": pdf["payload"].map(
                        lambda b: resize_image_stub(b, width, height)
                    ),
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(_resize, RESIZED_SCHEMA)
