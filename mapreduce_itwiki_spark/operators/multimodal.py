"""Multimodal column plumbing (north-star ⊕, SURVEY.md §2).

Images/audio/video are opaque ``binary`` columns plus typed metadata;
the Spark-side contract — schema, Arrow batch shape, partitioning —
is real and tested, while the codec step is stubbed (no image/audio
libraries in this container) behind a deterministic fake + a clearly
marked NotImplementedError for the real path.

Scale notes: blobs ride the same parquet row groups as their metadata;
``spark.sql.files.maxPartitionBytes`` governs scan granularity, and all
per-blob work is ``mapInPandas`` (Arrow-batched, per-partition) so a
100 TB corpus decodes embarrassingly parallel with zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata contract for a blob column
BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_blob(docs: DataFrame) -> DataFrame:
    """Materialize a binary column + typed metadata from the text corpus
    (stands in for image/audio payloads; byte-exact and deterministic)."""
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id"),
        blob.alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(blob).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_blob(payload: bytes) -> list[float]:
    """REAL codec entry point for formats needing external libraries —
    JPEG/audio/video decode is not available in this container. PNG has
    a REAL pure-stdlib implementation below (:func:`decode_png_gray`);
    swap this in for the other formats when codec libs exist on the
    executors."""
    raise NotImplementedError("codec libraries (PIL/ffmpeg/soundfile) not installed")


# ---------------------------------------------------------------------------
# REAL PNG codec (grayscale 8-bit), pure stdlib: zlib inflate + scanline
# un-filtering per the PNG spec. No external image libraries needed — this
# is an actual working decode path, not a stub.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png_gray(pixels: bytes, width: int) -> bytes:
    """Encode raw 8-bit grayscale pixels (row-major, len = width*height)
    as a valid PNG (color type 0, no interlace, filter 0 per scanline)."""
    import struct
    import zlib

    if width <= 0 or len(pixels) % width:
        raise ValueError("pixels length must be a positive multiple of width")
    height = len(pixels) // width

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale PNG → (width, height, pixels). Handles
    filter types 0 (None), 1 (Sub) and 2 (Up) — everything a compliant
    grayscale encoder commonly emits; anything else raises."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, 0, 0, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced grayscale supported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    out = bytearray()
    stride = width
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(1, stride):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out.extend(row)
        prev = row
    return width, height, bytes(out)


def fake_decode(payload: bytes, n_features: int = 4) -> list[float]:
    """Deterministic stand-in 'decoder': first n bytes as floats. Keeps
    the UDF signature, Arrow batch shape, and schema identical to the
    real path."""
    head = payload[:n_features]
    return [float(b) for b in head] + [0.0] * (n_features - len(head))


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched per-partition feature extraction over blob columns —
    the multimodal hot path (decode / resize / frame-sample all share
    this mapInPandas shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "feature": [fake_decode(b) for b in pdf["blob"]],
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL WAV codec (16-bit PCM mono), pure stdlib struct — the audio twin
# of the PNG path above.


def encode_wav_pcm16(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode signed 16-bit mono PCM samples as a valid RIFF/WAVE file."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, list[int]]:
    """Decode a 16-bit PCM mono WAV → (sample_rate, samples). Walks RIFF
    chunks properly (tolerates extra chunks a foreign encoder inserts)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if typ == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", data[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit PCM mono supported")
        elif typ == b"data":
            samples = [
                struct.unpack("<h", data[i : i + 2])[0] for i in range(0, len(data), 2)
            ]
        pos += 8 + length + (length % 2)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def audio_stats(audio: DataFrame, blob_col: str = "wav") -> DataFrame:
    """REAL audio decode over a WAV blob column: mapInPandas runs the
    stdlib PCM decoder per blob and emits (n_samples, duration, RMS) —
    the audio feature-extraction shape with a working codec."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_l, dur_l, rms_l = [], [], []
            for blob in pdf[blob_col]:
                rate, samples = decode_wav_pcm16(bytes(blob))
                n_l.append(len(samples))
                dur_l.append(round(len(samples) / rate, 6))
                rms_l.append(
                    round(math.sqrt(sum(s * s for s in samples) / len(samples)), 6)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": n_l,
                    "duration_sec": dur_l,
                    "rms": rms_l,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )
    return audio.mapInPandas(run, schema)


def image_stats(images: DataFrame, blob_col: str = "png") -> DataFrame:
    """REAL image decode over a PNG blob column: Arrow-batched
    mapInPandas runs the pure-stdlib PNG decoder per blob and emits
    typed stats (dims + mean pixel). This is the actual 100 TB
    multimodal shape — binary column in, decoded features out, zero
    shuffles — with a working codec rather than a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w_l, h_l, mean_l = [], [], []
            for blob in pdf[blob_col]:
                w, h, px = decode_png_gray(bytes(blob))
                w_l.append(w)
                h_l.append(h)
                # round 6: a mean of n=2^k bytes has <= 6 fractional
                # decimal digits, so this is EXACT — rounding to fewer
                # digits hits half-way ties where Python (banker's) and
                # SQL (half-up) disagree
                mean_l.append(round(sum(px) / len(px), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w_l,
                    "height": h_l,
                    "mean_pixel": mean_l,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_pixel", T.DoubleType()),
        ]
    )
    return images.mapInPandas(run, schema)


def frame_sample(blobs: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: 1 blob → N frame rows (video-style
    fan-out). Real frame extraction is NotImplemented (see decode_blob);
    the fake slices the payload so schema/fan-out/partitioning are
    exercised for real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(bytes(blob[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return blobs.mapInPandas(run, schema)
