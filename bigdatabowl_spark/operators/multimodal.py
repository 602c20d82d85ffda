"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with typed metadata structs.
The decode/feature-extract step is a Pandas-UDF (`mapInPandas`) stage — the
Spark-side plumbing (schema, Arrow batch shape, partitioning) is real; the
actual codec is stubbed deterministically because media libraries are not
available in this environment (clearly marked below).

Scale posture: mapInPandas streams Arrow batches — payload bytes never
round-trip through Python row objects; partition count governs memory, and
binary columns stay columnar end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Treat the UTF-8 bytes of a text column as an opaque media payload."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode: deterministic metadata from payload length.

    A real deployment would call PIL/ffmpeg here on each Arrow batch. The
    container has no media libs, so dimensions are derived from byte length —
    keeping the Spark plumbing (binary Arrow transfer, batch iteration,
    output schema) fully exercised and oracle-checkable.
    """
    for pdf in batches:
        byte_len = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int32"),
                "width": (64 + byte_len % 512).astype("int32"),
                "height": (64 + (byte_len * 7) % 512).astype("int32"),
                "format": ["img" if b % 2 == 0 else "aud" for b in byte_len],
            }
        )


def decode_metadata(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Binary payload → typed metadata via Arrow-batched mapInPandas."""
    payloads = attach_binary(df, text_col, id_col)
    return payloads.mapInPandas(_fake_decode, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("scale_num", LongType()),
    ]
)


def resize_metadata(df: DataFrame, target: int = 224, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """STUB resize: fit the decoded dimensions into a target×target box.

    A real deployment resizes pixel buffers per Arrow batch (PIL/opencv);
    here the aspect-preserving integer geometry — the part that must be
    exact and partition-independent — is computed for real. scale_num is
    the numerator of the integer scale ratio target/max(w,h)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            byte_len = pdf["payload"].map(len)
            w = (64 + byte_len % 512).astype("int64")
            h = (64 + (byte_len * 7) % 512).astype("int64")
            mx = w.where(w >= h, h)
            out_w = (w * target) // mx
            out_h = (h * target) // mx
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": out_w.astype("int32"),
                    "out_height": out_h.astype("int32"),
                    "scale_num": (target * 1_000_000 // mx).astype("int64"),
                }
            )

    return attach_binary(df, text_col, id_col).mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 100, stride: int = 4,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """STUB video frame sampling: payload = frames of `frame_bytes` each;
    emit every `stride`-th frame index and its byte offset (one output row
    per sampled frame — a row-expanding mapInPandas stage).

    The real codec would demux/seek per Arrow batch; the expansion shape,
    offsets, and schema are the engine-side contract."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                for k in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(k)
                    offs.append(k * frame_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                }
            )

    return attach_binary(df, text_col, id_col).mapInPandas(_sample, FRAME_SCHEMA)


def md5_features(df: DataFrame, dims: int = 4, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """STUB feature extraction: deterministic pseudo-embedding per payload —
    feature i = md5(text ∥ '_' ∥ i) folded to [0, 1). Pure Column
    expressions (JVM-side), bit-reproducible in the oracle; a real model
    would run under predict_batch_udf on the binary column instead."""
    feats = [
        (
            F.conv(F.substring(F.md5(F.concat(F.col(text_col), F.lit(f"_{i}"))), 1, 8), 16, 10)
            .cast("double") / F.lit(float(1 << 32))
        ).alias(f"f{i}")
        for i in range(dims)
    ]
    return df.select(F.col(id_col), *feats)
