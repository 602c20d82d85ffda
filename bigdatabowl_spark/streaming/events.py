"""Streaming-shaped operators over the events table.

The reference is pure batch (SURVEY §2.9) — its only streaming-shaped
semantics are frame-ordered windows. We expose both:

- a batch tumbling-window aggregate (oracle-checkable, registered in the
  catalog via plans/relational-style epoch arithmetic), and
- a real Structured Streaming twin (readStream over the same parquet,
  watermark + windowed agg) proving the engine's plans lift to streaming
  unchanged. Tested with an in-memory sink in tests/test_streaming.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.functions.scalar import dec
from bigdatabowl_spark.plans.catalog import register, t

WINDOW_US = 600_000_000  # 10 minutes


@register(
    "stream_tumbling_counts",
    "ST1,A1,A18",
    """
    SELECT CAST(floor(epoch_us(ts) / 600000000) AS BIGINT) AS window_id,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts — batch form (time at rest).

    Same epoch arithmetic the streaming twin uses, so batch and stream agree.
    """
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("ts_us") / WINDOW_US).cast("long").alias("window_id"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("window_value"),
    )


def tumbling_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin: readStream → watermark → windowed agg.

    Uses the micro-timestamp reconstructed from ts_ns; watermark bounds state
    for late data. Caller attaches a sink (memory/parquet) and starts it.
    """
    from bigdatabowl_spark.session import configure

    configure(spark)
    batch = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(f"{sf_dir.rstrip('/')}")
    )
    with_ts = stream.withColumn(
        "event_time", F.timestamp_micros(F.expr("CAST(ts AS LONG) div 1000"))
    )
    return (
        with_ts.withWatermark("event_time", "30 minutes")
        .groupBy(F.window("event_time", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )
