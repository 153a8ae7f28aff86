"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract is real and tested — schemas, Arrow-batched
Pandas UDFs over ``mapInPandas``, partition-preserving plumbing — while
the actual media decode is STUBBED (this container ships no image/audio
libraries): ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic md5-derived fake decode
stands in so the full pipeline is exercisable end-to-end.

At 100 TB: binary payloads ride in parquet as-is (no row-group
bloat — keep ``parquet.block.size`` moderate), decode runs as a narrow
``mapInPandas`` stage with Arrow transfer, and per-batch memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
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

#: canonical multimodal record: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the driver's ``documents`` table as a media corpus
    (utf-8 payload bytes) so the binary plumbing is exercisable against
    real test data."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, n_features: int) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions and features derived from
    md5(payload) — stands in for PIL/ffmpeg, stable across engines."""
    import hashlib

    digest = hashlib.md5(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    channels = 1 + digest[2] % 4
    feats = [((digest[(3 + i) % 16] / 255.0) * 2 - 1) for i in range(n_features)]
    return width, height, channels, feats


def decode_media(
    df: DataFrame,
    n_features: int = 8,
    fake: bool = False,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    ``mapInPandas``.

    The real decode path needs PIL/torchaudio/ffmpeg — unavailable here,
    so it raises unless ``fake=True`` (deterministic stub).  The Spark
    plumbing (schema, batching, partitioning) is identical either way.
    """

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            out = {
                "media_id": [], "media_type": [], "width": [],
                "height": [], "channels": [], "features": [],
            }
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, c, feats = _fake_decode(bytes(payload), n_features)
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def resize_media(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """Resize images to ``width``x``height`` via Arrow-batched
    ``mapInPandas`` — a 1:1 narrow map (no shuffle, no row-count
    change).  Real path needs PIL (not in this container): raises
    unless ``fake=True``, where the deterministic stub re-hashes the
    payload to a fixed-size pseudo-bitmap so batch shapes and schema
    are exercised for real."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                seed = hashlib.md5(bytes(payload)).digest()
                n = width * height
                fake_bitmap = (seed * (n // len(seed) + 1))[:n]
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["payload"].append(fake_bitmap)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 4, fake: bool = False
) -> DataFrame:
    """Sample video frames every ``every_ms`` via ``mapInPandas`` — a
    1:N explode done batch-side (one input row yields up to
    ``max_frames`` frame rows).  Real path needs ffmpeg: raises unless
    ``fake=True`` (frame count/payloads derived from md5, deterministic)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            out = {"media_id": [], "frame_index": [], "frame_ts_ms": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.md5(bytes(payload)).digest()
                n_frames = 1 + digest[0] % max_frames
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["payload"].append(
                        hashlib.md5(digest + bytes([i])).digest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata extraction over binary payloads (no decode):
    byte length + content hash — the audit/dedup primitive for media
    corpora.  Mirrors exactly in the DuckDB oracle."""
    return df.select(
        "media_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.conv(F.substring(F.md5("payload"), 1, 15), 16, 10)
        .cast("long")
        .alias("payload_hash"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("duration_s", DoubleType(), False),
        StructField("energy", DoubleType(), False),
        StructField("zcr", DoubleType(), False),
    ]
)


def extract_audio_features(
    df: DataFrame, n_frames: int = 6, fake: bool = False
) -> DataFrame:
    """Per-frame audio features (energy + zero-crossing rate) via
    Arrow-batched ``mapInPandas`` — a 1:N batch-side explode (one
    audio payload yields ``n_frames`` feature rows), the audio
    counterpart of ``sample_frames``.

    Real path needs torchaudio/ffmpeg (not in this container): raises
    unless ``fake=True``, where the deterministic stub derives the
    sample rate and per-frame features from md5(payload) — exact
    integer-over-constant divisions, so every engine reproduces
    bit-identical doubles (no rounding needed for oracle parity).
    """

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires torchaudio/ffmpeg (not in "
                    "this container); pass fake=True for the deterministic "
                    "stub"
                )
            out = {
                "media_id": [], "frame_idx": [], "sample_rate": [],
                "duration_s": [], "energy": [], "zcr": [],
            }
            for mid, payload, n_bytes in zip(
                pdf["media_id"], pdf["payload"], pdf["n_bytes"]
            ):
                digest = hashlib.md5(bytes(payload)).digest()
                rate = 8000 + (digest[0] % 8) * 1000
                dur = int(n_bytes) / rate
                for i in range(n_frames):
                    hi = digest[(2 * i) % 16]
                    lo = digest[(2 * i + 1) % 16]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["sample_rate"].append(rate)
                    out["duration_s"].append(dur)
                    out["energy"].append((hi * 256 + lo) / 65535.0)
                    out["zcr"].append(digest[(i + 5) % 16] / 255.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
