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
