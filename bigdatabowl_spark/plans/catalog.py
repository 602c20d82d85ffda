"""Declared-query catalog: every operator ships as (Spark plan, DuckDB oracle).

Each entry is one row of SURVEY.md §2 re-expressed as an idiomatic Spark
DataFrame plan over the /root/testdata star schema, paired with an ANSI-SQL
twin that DuckDB executes on the same parquet files. The driver hash-compares
the two at sf0.01 — so every query here is written for *bit-level* cross-engine
determinism:

- grouped sums/avgs of 2-decimal doubles go through DECIMAL (exact),
- time arithmetic is epoch-microsecond BIGINT (DuckDB timestamp precision),
- top-k always carries a deterministic tiebreak key,
- trig/exp/log outputs are rounded (libm vs JVM may differ in the last ulp),
- cross-engine hashing uses md5 (identical algorithm in both engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.session import configure
from bigdatabowl_spark.sources.tables import load_table


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    survey: str  # SURVEY §2 row ids this query exercises, e.g. "A1,P4,F6"
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


CATALOG: dict[str, CatalogQuery] = {}


def register(name: str, survey: str, oracle: str | None):
    """Decorator: add a (spark builder, oracle sql) pair to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        CATALOG[name] = CatalogQuery(
            name=name, survey=survey, builder=wrapped, oracle=oracle, doc=fn.__doc__ or ""
        )
        return wrapped

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in CATALOG.items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}


# Shared SQL fragments for the oracle side ----------------------------------

def dsum(expr: str, prec: int = 18, scale: int = 2) -> str:
    """DuckDB twin of functions.scalar.dec_sum — exact decimal sum as double."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def davg(expr: str, prec: int = 18, scale: int = 2) -> str:
    """DuckDB twin of dec_avg — exact decimal numerator / count, in double."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT({expr}))"


HEX2INT = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"
