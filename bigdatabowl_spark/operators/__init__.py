from bigdatabowl_spark.operators import asof, dedup, similarity, skew, text, multimodal  # noqa: F401
