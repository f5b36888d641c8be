"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema, Arrow batch shape,
partition-friendly ``mapInPandas`` feature extraction, frame-sampling
layout. The actual media decode is STUBBED (`decode_media`) because no
image/audio libraries exist in this environment; `_FakeDecoder` provides a
deterministic stand-in so the distributed plumbing is exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),     # image/jpeg, audio/wav, ...
        StructField("width", IntegerType()),          # typed metadata travels
        StructField("height", IntegerType()),          # beside the blob
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_digests", ArrayType(LongType())),
        StructField("byte_histogram_head", ArrayType(IntegerType())),
    ]
)

FRAME_BYTES = 1024  # stand-in "frame" granule for frame-sampling layout


def decode_media(blob: bytes, media_type: str):
    """Real decode entry point — requires PIL/torchaudio/decord, which are
    not available in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; use _FakeDecoder for plumbing tests"
    )


class _FakeDecoder:
    """Deterministic decode stand-in: 'frames' are FRAME_BYTES slices, the
    per-frame digest is a numpy int64 sum — enough to verify batch shapes,
    schema and partitioning without media libs."""

    @staticmethod
    def features(blob: bytes) -> tuple[int, int, list[int], list[int]]:
        arr = np.frombuffer(blob, dtype=np.uint8)
        n_frames = max(1, (len(arr) + FRAME_BYTES - 1) // FRAME_BYTES)
        digests = [int(arr[i * FRAME_BYTES:(i + 1) * FRAME_BYTES].astype(np.int64).sum()) for i in range(n_frames)]
        hist = np.bincount(arr[:4096] % 16, minlength=16).astype(np.int32)
        return len(arr), n_frames, digests, [int(x) for x in hist]


def extract_features(media_df: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns."""

    def gen(it):
        for pdf in it:
            if not len(pdf):
                continue
            rows = {"doc_id": [], "media_type": [], "byte_len": [], "n_frames": [],
                    "frame_digests": [], "byte_histogram_head": []}
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], pdf["media_type"]):
                if use_fake_decoder:
                    bl, nf, dg, hist = _FakeDecoder.features(bytes(blob))
                else:  # pragma: no cover - requires media libs
                    bl, nf, dg, hist = decode_media(bytes(blob), mt)
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["byte_len"].append(bl)
                rows["n_frames"].append(nf)
                rows["frame_digests"].append(dg)
                rows["byte_histogram_head"].append(hist)
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(gen, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from the documents fixture: the UTF-8 bytes
    of the text play the role of an opaque blob (lets the multimodal
    plumbing run against driver-provided data)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
