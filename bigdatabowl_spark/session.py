"""SparkSession factory with scale-appropriate defaults.

The reference parallelizes with ``multiprocessing.Pool`` (normalize.py:107-111,
optimize_def.py:188-190); here Spark's scheduler owns parallelism and these
configs set the knobs that matter at cluster scale (AQE, shuffle partitions,
Arrow) while remaining correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf applied at build time (static-ish) — tuned for local[N] test runs but
# chosen to be the right defaults on a real cluster too.
_BUILD_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet stores TIMESTAMP(NANOS); read as int64 nanos
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.enabled": "false",
}


def runtime_conf(cpus: int | None = None) -> dict[str, str]:
    """Conf that is runtime-settable — applied defensively to externally
    provided sessions (the correctness driver builds its own SparkSession)."""
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": str(2 * cpus),
    }


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an existing session (idempotent)."""
    for k, v in runtime_conf().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — keep whatever it has
    return spark


def get_spark(app_name: str = "bigdatabowl-spark", master: str | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in _BUILD_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(2 * cpus))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    return configure(builder.getOrCreate())
