"""Skew mitigation: key salting for joins and aggregations.

The reference never needed this (single machine), but at 100 TB a skewed
key — one viral document, one game with 10× frames — serializes a stage.
Two standard remedies, exposed as composable helpers:

- salted aggregation: two-phase aggregate (key, salt) → key. Works for any
  algebraic aggregate; the partial phase spreads a hot key over N salts.
- salted join: replicate the small side N× (one copy per salt), salt the
  big side uniformly-deterministically, join on (key, salt). Exactly the
  rewrite AQE's skew-join performs at runtime; explicit form for when the
  skew is known ahead of time or AQE is unavailable (streaming joins).

Salts are deterministic (hash of a stable id column, not rand()) so results
are reproducible run-to-run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def deterministic_salt(id_col: Column, n_salts: int) -> Column:
    """Stable salt in [0, n_salts) from a row id — reproducible, unlike
    F.rand()."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_salts)).cast("int")


def salted_count_sum(
    df: DataFrame, key: str, value: str, id_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase (salted) count+sum per key.

    Phase 1 groups on (key, salt) — a hot key spreads over n_salts
    reducers; phase 2 merges the n_salts partials per key (tiny)."""
    salted = df.withColumn("_salt", deterministic_salt(F.col(id_col), n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum(value).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: big side salted, small side replicated n_salts×.

    Output equals big.join(small, key) row-for-row; the hot key's rows land
    on n_salts different reducers instead of one."""
    big_s = big.withColumn("_salt", deterministic_salt(F.col(big_id_col), n_salts))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")
