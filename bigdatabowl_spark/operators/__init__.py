from bigdatabowl_spark.operators import dedup, similarity, text, multimodal  # noqa: F401
