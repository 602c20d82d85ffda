from bigdatabowl_spark.streaming.events import tumbling_counts_batch, tumbling_counts_stream  # noqa: F401
