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
