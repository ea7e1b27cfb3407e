"""Multimodal (image/audio/video) column plumbing (north star).

Media are opaque ``binary`` columns plus typed metadata columns —
the standard lakehouse pattern (parquet stores the bytes; Spark never
interprets them until an explicit decode step). Decode/feature-extract
run as Arrow-batched ``mapInPandas`` / pandas UDFs so bytes cross the
JVM↔Python boundary once per batch, not per row.

Decode status by modality (round 2): **audio and image decode are REAL**
— RIFF/WAVE parsed with stdlib ``wave`` (``decode_wav``) and 24-bit BMP
parsed from the raw header + pixel rows with numpy (``decode_bmp``),
both oracle-checked end-to-end against closed-form fixture formulas.
Only video decode remains stubbed (ffmpeg is not in this container);
``decode_image_stub`` is kept as the documented fallback shape for
codecs that genuinely need external libs (JPEG/PNG/MP4), where swapping
the stub for PIL/ffmpeg changes one inner function.

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
    DoubleType,
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


# ---------------------------------------------------------------------------
# REAL decoders (round 2): formats the standard library can decode.
#
# PIL/librosa/ffmpeg are not in this container, but WAV is decodable with
# stdlib `wave` and 24-bit BMP is a fixed-layout header + raw pixel rows
# (numpy). These kernels are NOT stubs: the payloads are real encoded
# files, the decoders parse the actual format, and — because the
# fixture generator writes samples/pixels from a closed-form integer
# formula — the decoded statistics are provable in plain SQL, so the
# decode round-trip is oracle-checked end to end. Video decode remains
# stubbed (no ffmpeg), with the explode-then-process plan shape tested.
# ---------------------------------------------------------------------------


def _wav_samples(media_id: int, n: int) -> list[int]:
    """Closed-form deterministic 16-bit PCM samples (the SQL-provable
    fixture formula): s_j = (id*7919 + j*31) % 65536 - 32768."""
    return [((media_id * 7919 + j * 31) % 65536) - 32768 for j in range(n)]


def make_wav_media(spark, n: int = 48) -> DataFrame:
    """Real RIFF/WAVE payloads (PCM 16-bit mono, 8 kHz) with
    formula-generated samples; n_samples varies per id."""
    import io
    import struct
    import wave

    rows = []
    for i in range(n):
        n_samples = 400 + (i % 5) * 100
        samples = _wav_samples(i, n_samples)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{n_samples}h", *samples))
        rows.append((i, "audio", buf.getvalue(), "audio/wav", None, None, n_samples * 1000 // 8000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_wav(payload: bytes) -> tuple[int, int, float, int]:
    """REAL decode: parse the RIFF container with stdlib `wave`, return
    (n_samples, sample_rate, rms, peak). Integer squares sum exactly in
    float64 (n·32768² ≪ 2⁵³), so rms is bit-stable."""
    import io
    import math
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getsampwidth() == 2 and w.getnchannels() == 1
        rate = w.getframerate()
        nf = w.getnframes()
        samples = struct.unpack(f"<{nf}h", w.readframes(nf))
    sq = 0.0
    peak = 0
    for s in samples:
        sq += float(s) * s
        peak = max(peak, abs(s))
    return nf, rate, round(math.sqrt(sq / max(nf, 1)), 6), peak


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """WAV feature extraction via Arrow-batched ``mapInPandas`` — bytes
    cross to Python once per batch; the payload never survives the map."""
    from nyc_tlc_trip_data_pipelines_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decode_wav(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.Series([o[0] for o in out], dtype="int32"),
                    "sample_rate": pd.Series([o[1] for o in out], dtype="int32"),
                    "rms": [o[2] for o in out],
                    "peak": pd.Series([o[3] for o in out], dtype="int32"),
                }
            )

    return df.mapInPandas(_decode, AUDIO_DECODE_SCHEMA)


_BMP_W, _BMP_H = 16, 12


def _bmp_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Closed-form (r, g, b) fixture formula — SQL-provable."""
    r = (media_id * 7 + x * 5 + y * 17) % 256
    g = (media_id * 5 + x * 13 + y * 3) % 256
    b = (media_id * 3 + x * 7 + y * 11) % 256
    return r, g, b


def make_bmp_media(spark, n: int = 48) -> DataFrame:
    """Real 24-bit BMP payloads (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding) with formula-generated pixels."""
    import struct

    rows = []
    w, h = _BMP_W, _BMP_H
    row_bytes = (w * 3 + 3) // 4 * 4
    for i in range(n):
        pixels = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up storage order
            for x in range(w):
                r, g, b = _bmp_pixel(i, x, y)
                pixels += bytes((b, g, r))  # BGR on disk
            pixels += b"\x00" * (row_bytes - w * 3)
        img_size = len(pixels)
        header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        rows.append((i, "image", bytes(header) + bytes(pixels), "image/bmp", w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def decode_bmp(payload: bytes) -> tuple[int, int, float, float, float]:
    """REAL decode: parse the BMP header (data offset, dims, bpp) and the
    padded bottom-up BGR rows with numpy (see ``_bmp_array``); returns
    (width, height, mean_r, mean_g, mean_b). Integer pixel sums are
    exact in float64."""
    import numpy as np

    arr = _bmp_array(payload)
    means = arr.astype(np.float64).mean(axis=(0, 1))  # (b, g, r)
    return (
        arr.shape[1],
        arr.shape[0],
        round(float(means[2]), 6),
        round(float(means[1]), 6),
        round(float(means[0]), 6),
    )


def decode_image_features(df: DataFrame) -> DataFrame:
    """BMP feature extraction via Arrow-batched ``mapInPandas``."""
    from nyc_tlc_trip_data_pipelines_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decode_bmp(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series([o[0] for o in out], dtype="int32"),
                    "height": pd.Series([o[1] for o in out], dtype="int32"),
                    "mean_r": [o[2] for o in out],
                    "mean_g": [o[3] for o in out],
                    "mean_b": [o[4] for o in out],
                }
            )

    return df.mapInPandas(_decode, IMAGE_DECODE_SCHEMA)


def _bmp_array(payload: bytes):
    """Parse a 24-bit BMP into a top-down (h, w, 3) BGR uint8 array."""
    import struct

    import numpy as np

    assert payload[:2] == b"BM"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    assert struct.unpack_from("<H", payload, 28)[0] == 24
    row_bytes = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, dtype=np.uint8, count=abs(h) * row_bytes, offset=data_off)
    arr = arr.reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    return arr[::-1] if h > 0 else arr


def _encode_bmp(arr) -> bytes:
    """Encode a top-down (h, w, 3) BGR uint8 array as a 24-bit BMP
    (bottom-up rows, 4-byte padding) — the exact inverse of _bmp_array."""
    import struct

    h, w = arr.shape[0], arr.shape[1]
    row_bytes = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(arr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def resize_bmp(payload: bytes, factor: int = 2) -> bytes:
    """REAL resize: integer-factor box downsample of a 24-bit BMP —
    each output pixel is the floor-mean of its factor×factor block
    (exact integer arithmetic, so the result is SQL-provable) — then
    re-encoded as a valid BMP."""
    import numpy as np

    arr = _bmp_array(payload)
    h, w = arr.shape[0], arr.shape[1]
    assert h % factor == 0 and w % factor == 0, "dims must divide the factor"
    small = (
        arr.astype(np.int64)
        .reshape(h // factor, factor, w // factor, factor, 3)
        .sum(axis=(1, 3))
        // (factor * factor)
    ).astype(np.uint8)
    return _encode_bmp(small)


def resize_bmp_images(df: DataFrame, factor: int = 2) -> DataFrame:
    """Real BMP box-downsample via Arrow ``mapInPandas``; emits the
    re-encoded payload so downstream decode proves the round trip."""
    from nyc_tlc_trip_data_pipelines_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(lambda b: resize_bmp(b, factor)),
                    "mime": pdf["mime"],
                    "width": pd.Series(
                        [w // factor for w in pdf["width"]], dtype="int32"
                    ),
                    "height": pd.Series(
                        [h // factor for h in pdf["height"]], dtype="int32"
                    ),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return df.mapInPandas(_resize, MEDIA_SCHEMA)
