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
    """REAL codec entry point — image/audio decode is not available in
    this container. The Spark plumbing calls :func:`fake_decode` instead;
    swap this in when codec libs exist on the executors."""
    raise NotImplementedError("codec libraries (PIL/ffmpeg/soundfile) not installed")


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
