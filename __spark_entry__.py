"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over bigdatabowl_spark.plans.catalog — every implemented operator
from SURVEY.md §2 is a catalog entry pairing a Spark DataFrame plan with a
DuckDB oracle SQL twin (bit-exact by construction; see plans/catalog.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bigdatabowl_spark.plans.catalog import CATALOG
    import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG

    return CATALOG["a1_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG
    from bigdatabowl_spark.plans.catalog import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each catalog query (same column aliases)."""
    import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG
    from bigdatabowl_spark.plans.catalog import oracle_map

    return oracle_map()
