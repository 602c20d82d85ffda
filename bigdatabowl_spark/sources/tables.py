"""Testdata table readers (parquet star schema, see TESTDATA.md).

Mirrors the reference's scan layer (SURVEY §2.1): the reference reads CSVs with
manual ``usecols`` pruning (comb_model_big_run_cpu.py:17-20) and multi-file
week globs (completion_probability_torch.py:29-34). Here every scan is a
parquet read through Catalyst, so column pruning and predicate pushdown reach
the reader automatically — ``.select``/``.filter`` downstream is enough.

``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as int64
nanos (``spark.sql.legacy.parquet.nanosAsLong``). We standardize on an
additional ``ts_ns`` BIGINT column and keep all time arithmetic in epoch
integers — deterministic, timezone-free, and identical in the DuckDB oracle
(``epoch_ns(ts)``).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; events gains ``ts_ns`` (BIGINT epoch nanos)."""
    if name == "events":
        configure(spark)  # driver-owned sessions need nanosAsLong at runtime
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        # ts column arrives as LongType nanos under nanosAsLong. DuckDB's
        # TIMESTAMP is microsecond-precision (nanos truncated on read), so
        # oracle-matched queries must use ts_us, not ts_ns.
        df = df.withColumn("ts_ns", F.col("ts").cast("long"))
        df = df.withColumn("ts_us", F.expr("ts_ns div 1000"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
