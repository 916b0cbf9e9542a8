"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The image/audio codecs are not available in this container, so the
decode kernels are STUBBED (deterministic fakes clearly marked below);
everything Spark-side — schema, partitioning, UDF signatures, batch
shapes — is real and tested. Swapping in PIL/librosa/ffmpeg only
replaces the bodies of ``_decode_image_stub`` / ``_sample_frames_stub``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

USE_REAL_CODECS = False  # no PIL/librosa/ffmpeg in this container

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feat_width", T.IntegerType(), True),
        T.StructField("feat_height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_media(documents: DataFrame) -> DataFrame:
    """Derive a media table from documents: payload = utf-8 bytes of the
    text (a deterministic stand-in for image bytes), typed metadata."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
    )


def _decode_image_stub(payload: bytes, width, height):
    """STUB decode: real impl would be PIL.Image.open(BytesIO(payload)).
    Deterministic fake: dims halve (the 'resize'), plus content hash."""
    if USE_REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("real image decode requires PIL — not in container")
    return (
        len(payload or b""),
        hashlib.sha256(payload or b"").hexdigest(),
        int(width or 0) // 2,
        int(height or 0) // 2,
    )


def _sample_frames_stub(payload: bytes, n: int = 4) -> int:
    """STUB frame sampler: real impl would invoke ffmpeg; fake returns a
    deterministic frame count derived from payload length."""
    if USE_REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("real frame sampling requires ffmpeg — not in container")
    return min(n, max(1, len(payload or b"") // 32))


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas. Each batch
    arrives as a pandas DataFrame (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch); per-batch loops stay
    in Python but cross the JVM boundary once per batch, not per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, mime, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                n_bytes, sha, fw, fh = _decode_image_stub(payload, w, h)
                frames = _sample_frames_stub(payload) if mime == "video/mp4" else None
                rows.append((int(media_id), n_bytes, sha, fw, fh, frames))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "sha256", "feat_width", "feat_height", "n_frames"],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
