"""Structured Streaming twin agrees with the batch tumbling-window query."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatabowl_spark.streaming.events import tumbling_counts_batch, tumbling_counts_stream, WINDOW_US


def test_stream_matches_batch(spark, sf_dir):
    batch = (
        tumbling_counts_batch(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.sum("n").alias("total"))
    )
    batch_counts = {r.event_type: r.total for r in batch.collect()}

    stream_df = tumbling_counts_stream(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, SUM(n) AS total FROM tumbling_test GROUP BY event_type"
    ).collect()
    stream_counts = {r.event_type: r.total for r in got}
    assert stream_counts == batch_counts

    # window ids line up with the batch epoch arithmetic
    win = spark.sql("SELECT DISTINCT window_start_us FROM tumbling_test").collect()
    assert all(r.window_start_us % WINDOW_US == 0 for r in win)
