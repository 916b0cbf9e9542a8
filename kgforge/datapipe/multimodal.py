"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
decoded with Arrow-batched ``mapInPandas``.

Round 2 replaces the round-1 stubs with **real pure-stdlib codecs** for
three genuine container formats:

- ``image/png``  — written with zlib-compressed IDAT + CRC chunks and
  decoded by parsing IHDR, inflating IDAT, and reversing scanline
  filters (None/Sub/Up implemented — the filters our encoder emits).
- ``audio/wav``  — RIFF/WAVE PCM16: struct-packed header + samples,
  decoded by walking the chunk list to ``fmt ``/``data``.
- ``video/y4m``  — YUV4MPEG2 (mplayer/ffmpeg's raw-video container),
  ``Cmono`` colourspace: text header + ``FRAME\\n`` delimited luma
  planes; decode parses the header and frame-samples every 2nd frame.

Payload *content* is a deterministic function of ``media_id`` (pure
arithmetic, no RNG), so the DuckDB oracle can predict every decoded
feature — sample counts, mean luma/amplitude — without touching binary,
while the Spark side genuinely parses the bytes it decodes.

At scale: payloads stay opaque ``binary`` columns; decode crosses the
JVM boundary once per Arrow batch (mapInPandas), never per row.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ------------------------------------------------------------ deterministic
# payload-content formulas (single source of truth; the DuckDB oracle in
# gate.py mirrors these arithmetically)
PNG_W = lambda mid: 4 + mid % 5  # noqa: E731
PNG_H = lambda mid: 3 + mid % 4  # noqa: E731
WAV_RATE = lambda mid: 8000 + (mid % 4) * 4000  # noqa: E731
WAV_N = lambda mid: 64 + mid % 64  # noqa: E731
Y4M_W = lambda mid: 4 + mid % 3  # noqa: E731
Y4M_H = lambda mid: 2 + mid % 3  # noqa: E731
Y4M_FRAMES = lambda mid: 2 + mid % 5  # noqa: E731


def png_pixel(mid: int, x: int, y: int) -> int:
    return (mid + 3 * x + 7 * y) % 256


def wav_sample(mid: int, i: int) -> int:
    return ((mid * 31 + i * 7) % 65536) - 32768


def y4m_luma(mid: int, f: int, x: int, y: int) -> int:
    return (mid + 13 * f + x + 5 * y) % 256


# ------------------------------------------------------------ encoders
def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(mid: int) -> bytes:
    """Greyscale 8-bit PNG; scanlines use filter 0 (None)."""
    w, h = PNG_W(mid), PNG_H(mid)
    raw = b"".join(
        b"\x00" + bytes(png_pixel(mid, x, y) for x in range(w)) for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, grey
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def encode_wav(mid: int) -> bytes:
    """RIFF/WAVE, PCM16 mono."""
    rate, n = WAV_RATE(mid), WAV_N(mid)
    data = b"".join(struct.pack("<h", wav_sample(mid, i)) for i in range(n))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_y4m(mid: int) -> bytes:
    """YUV4MPEG2 Cmono: text header + FRAME-delimited luma planes."""
    w, h, nf = Y4M_W(mid), Y4M_H(mid), Y4M_FRAMES(mid)
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()]
    for f in range(nf):
        out.append(b"FRAME\n")
        out.append(bytes(y4m_luma(mid, f, x, y) for y in range(h) for x in range(w)))
    return b"".join(out)


# ------------------------------------------------------------ decoders
def _png_unfilter(raw: bytes, w: int, h: int) -> bytes:
    """Reverse PNG scanline filters for 8-bit greyscale (bpp=1).
    Implements None/Sub/Up — the filters this pipeline's encoder can
    emit; anything else raises (honest failure, no silent garbage)."""
    out = bytearray()
    prev = bytes(w)
    pos = 0
    for _ in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + w])
        pos += 1 + w
        if ftype == 1:  # Sub
            for i in range(1, w):
                line[i] = (line[i] + line[i - 1]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(w):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out += line
        prev = bytes(line)
    return bytes(out)


def decode_png(payload: bytes) -> dict:
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit greyscale supported")
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    pixels = _png_unfilter(zlib.decompress(idat), w, h)
    return {
        "width": w,
        "height": h,
        "n_frames": None,
        "sample_rate": None,
        # mean pixel value, e3-scaled for exact cross-engine compare
        "mean_value_e3": (sum(pixels) * 1000) // (w * h),
    }


def decode_wav(payload: bytes) -> dict:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos = 12
    rate, data = None, b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif tag == b"data":
            data = body
        pos += 8 + length
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    return {
        "width": None,
        "height": None,
        "n_frames": n,  # sample count
        "sample_rate": rate,
        "mean_value_e3": (sum(abs(s) for s in samples) * 1000) // n,
    }


def decode_y4m(payload: bytes, frame_step: int = 2) -> dict:
    """Parse the Y4M header and frame-sample every ``frame_step``-th
    frame (the multimodal 'frame sampling' op); mean luma over the
    sampled frames only."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    params = dict((p[0], p[1:]) for p in header.split()[1:])
    w, h = int(params["W"]), int(params["H"])
    if params.get("C", "420") != "mono":
        raise ValueError("only Cmono supported")
    pos, frames = nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 6] != b"FRAME\n":
            raise ValueError("bad frame marker")
        pos += 6
        frames.append(payload[pos : pos + w * h])
        pos += w * h
    sampled = frames[::frame_step]
    total = sum(sum(fr) for fr in sampled)
    return {
        "width": w,
        "height": h,
        "n_frames": len(sampled),
        "sample_rate": None,
        "mean_value_e3": (total * 1000) // (w * h * len(sampled)),
    }


# ------------------------------------------------------------ Spark plumbing
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("mean_value_e3", T.LongType(), True),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def _encode_payload(mid: int, mime: str) -> bytes:
    if mime == "image/png":
        return encode_png(mid)
    if mime == "audio/wav":
        return encode_wav(mid)
    return encode_y4m(mid)


@pandas_udf(T.BinaryType())
def _encode_udf(mids: pd.Series, mimes: pd.Series) -> pd.Series:
    return pd.Series(
        [_encode_payload(int(m), mi) for m, mi in zip(mids, mimes)], dtype=object
    )


def attach_media(documents: DataFrame) -> DataFrame:
    """Derive a media table from documents: REAL container bytes
    (PNG/WAV/Y4M) whose content is a pure function of doc_id."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/y4m")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mime.alias("mime"),
    ).withColumn("payload", _encode_udf(F.col("media_id"), F.col("mime")))


_DECODERS = {"image/png": decode_png, "audio/wav": decode_wav, "video/y4m": decode_y4m}


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas. Each batch
    arrives as one pandas DataFrame (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch); decoding stays in
    Python but crosses the JVM boundary once per batch, not per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                feats = _DECODERS[mime](bytes(payload))
                rows.append(
                    (
                        int(media_id),
                        mime,
                        len(payload),
                        feats["width"],
                        feats["height"],
                        feats["n_frames"],
                        feats["sample_rate"],
                        feats["mean_value_e3"],
                        hashlib.sha256(bytes(payload)).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mime", "n_bytes", "width", "height",
                    "n_frames", "sample_rate", "mean_value_e3", "sha256",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# -------------------------------------------------------------- resize op
def encode_png_raster(pixels: bytes, w: int, h: int) -> bytes:
    """Greyscale 8-bit PNG from a row-major raster (filter 0 scanlines)
    — the generic form of :func:`encode_png`."""
    raw = b"".join(
        b"\x00" + bytes(pixels[y * w : (y + 1) * w]) for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, out_w: int, out_h: int) -> tuple[bytes, int]:
    """Nearest-neighbor resize of an 8-bit greyscale PNG: decode, sample
    src pixel (x*w)//out_w, (y*h)//out_h, re-encode. Returns
    (resized_png, mean_value_e3 of the resized raster)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, _, _ = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    src = _png_unfilter(zlib.decompress(idat), w, h)
    resized = bytes(
        src[((y * h) // out_h) * w + ((x * w) // out_w)]
        for y in range(out_h)
        for x in range(out_w)
    )
    mean_e3 = (sum(resized) * 1000) // (out_w * out_h)
    return encode_png_raster(resized, out_w, out_h), mean_e3


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_value_e3", T.LongType(), False),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """The multimodal *resize* op: nearest-neighbor downsample of every
    image row to (out_w, out_h), re-encoded as real PNG bytes — an
    Arrow-batched ``mapInPandas`` (one JVM crossing per batch), the same
    shape a production thumbnailer (PIL/libvips behind this exact UDF
    signature) runs at 100 TB. Non-image rows are filtered out, not
    errored, so the op composes with a mixed media table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                if mime != "image/png":
                    continue
                out_png, mean_e3 = resize_png(bytes(payload), out_w, out_h)
                rows.append((int(media_id), out_png, out_w, out_h, mean_e3))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "width", "height", "mean_value_e3"],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
