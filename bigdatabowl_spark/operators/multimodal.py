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
    """Treat the UTF-8 bytes of a text column as an opaque media payload.

    If the input ALREADY carries a binary `payload` column it passes
    through untouched — the fuzz path (tests/test_multimodal_fuzz.py)
    feeds raw adversarial bytes to the same kernels the text-derived
    catalog queries run."""
    from pyspark.sql.types import BinaryType

    if "payload" in df.columns and isinstance(
        df.schema["payload"].dataType, BinaryType
    ):
        return df.select(F.col(id_col), "payload")
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


# Stub codec contract shared by validate_payloads (JVM prefilter) and
# decode_with_errors (kernel-side try/except): a payload "decodes" iff it
# is non-null, non-empty, carries at least MIN_HEADER_BYTES, and its first
# byte is < 0x80 (the stand-in for a magic-number check — real codecs
# reject on magic before anything else). Deterministic and cheap so both
# engines of the oracle harness can compute it.
MIN_HEADER_BYTES = 4


def validate_payloads(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """JVM-side payload triage → S13 status column (no Python).

    At 100 TB the cheap rejections (null/empty/truncated/bad magic) should
    never reach a Python worker: pure Column expressions classify every
    payload so only plausible bytes flow into the decode kernel and the
    rest split off through split_error_channel. Statuses: ok | error:null
    | error:empty | error:truncated | error:badheader."""
    c = F.col(payload_col)
    first_byte = F.conv(F.hex(F.substring(c, 1, 1)), 16, 10).cast("int")
    status = (
        F.when(c.isNull(), F.lit("error:null"))
        .when(F.octet_length(c) == 0, F.lit("error:empty"))
        .when(F.octet_length(c) < MIN_HEADER_BYTES, F.lit("error:truncated"))
        .when(first_byte >= 128, F.lit("error:badheader"))
        .otherwise(F.lit("ok"))
    )
    return df.select(
        F.col(id_col), c.alias(payload_col), status.alias("status")
    )


ERROR_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("status", StringType()),
    ]
)


def _decode_or_error(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode kernel with a PER-PAYLOAD error channel: one malformed
    payload becomes one error ROW, never a dead Arrow batch (the S13
    pattern inside mapInPandas — the reference aborts the whole play on
    one bad frame, comb_model_big_run_cpu.py:27-45). The try/except is
    belt-and-braces over validate_payloads' prefilter: a real codec fails
    on bytes no header check can pre-screen."""

    def one(payload):
        try:
            if payload is None:
                return (None, None, None, None, "error:null")
            n = len(payload)
            if n == 0:
                return (0, None, None, None, "error:empty")
            if n < MIN_HEADER_BYTES:
                return (n, None, None, None, "error:truncated")
            if payload[0] >= 128:
                return (n, None, None, None, "error:badheader")
            # ---- STUB decode (no media libs in container): the metadata
            # derivation mirrors _fake_decode exactly ----
            return (
                n,
                64 + n % 512,
                64 + (n * 7) % 512,
                "img" if n % 2 == 0 else "aud",
                "ok",
            )
        except Exception as e:  # a crash is one row, not a dead batch
            return (None, None, None, None, f"error:{type(e).__name__}")

    for pdf in batches:
        decoded = [one(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": pd.array(
                    [d[0] for d in decoded], dtype="Int32"
                ),
                "width": pd.array([d[1] for d in decoded], dtype="Int32"),
                "height": pd.array([d[2] for d in decoded], dtype="Int32"),
                "format": [d[3] for d in decoded],
                "status": [d[4] for d in decoded],
            }
        )


def decode_with_errors(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Binary payload → typed metadata WITH an S13 status column.

    Composes with sources.io.split_error_channel: ok rows feed the
    pipeline, error rows land in the errors table with a typed reason.
    Input may be a text table (payload = UTF-8 bytes) or any DataFrame
    already carrying a binary `payload` column."""
    return attach_binary(df, text_col, id_col).mapInPandas(
        _decode_or_error, ERROR_DECODE_SCHEMA
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
