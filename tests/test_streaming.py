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


def test_stateful_running_totals(spark, sf_dir):
    """applyInPandasWithState running totals equal the batch aggregate
    after one availableNow pass."""
    from bigdatabowl_spark.sources.tables import load_table
    from bigdatabowl_spark.streaming.events import stateful_user_totals

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    expected = {r.user_id: r.n for r in batch.collect()}

    q = (
        stateful_user_totals(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, MAX(n_events) AS n FROM stateful_test GROUP BY user_id"
    ).collect()
    assert {r.user_id: r.n for r in got} == expected


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Kill/restart robustness: a checkpointed file-source stream that dies
    mid-stream and is restarted over a grown input directory must emit every
    input row exactly once (no loss from the first run, no reprocessing on
    resume). This is the recovery contract a 6-hour 100 TB ingest relies on."""
    import pyspark.sql.functions as F

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(str(src / "batch1"))

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # first run sees only half1, then "dies"
    half2.write.mode("overwrite").parquet(str(src / "batch2"))
    run_once()  # restart from checkpoint over the grown directory

    got = spark.read.parquet(str(sink))
    assert got.count() == events.count()  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == events.count()
