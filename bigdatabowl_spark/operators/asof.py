"""As-of join: for each left row, the latest right row with
right_ts <= left_ts per key — the time-series enrichment operator Spark
has no built-in for (reference analogue: interval/as-of style frame joins,
SURVEY §2.3 J13, movement_stats.ipynb · cells 25-26).

Spark-first formulation: instead of a range join (which explodes into a
per-key cross product before picking the max), union the two sides into one
event stream, shuffle ONCE on the key, and carry the most recent right-side
payload forward with `last(..., ignorenulls=True)` over an ordered window.
Cost at 100 TB: one exchange on the key + one in-partition sort — the same
shape as any windowed aggregate, with no intermediate blowup; skewed keys
can reuse the salting pattern in operators/skew.py.

The oracle twin is DuckDB's native `ASOF LEFT JOIN`, so the semantics here
are pinned bit-for-bit to the industry-standard definition (ties included:
a right row AT the left row's timestamp matches — the union orders right
rows before left rows at equal timestamps to reproduce that).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Returns every `left` row plus, for each name in
    `payload_cols`, a `<name><suffix>` column holding that column's value
    from the latest `right` row with ``right_ts <= left_ts`` for the same
    `key` (null if no such row).

    Column-name collisions between the two inputs are avoided by renaming
    the right side's timestamp into the payload: pass it in `payload_cols`
    if the match timestamp is wanted in the output.
    """
    left_cols = [c for c in left.columns if c not in (key, left_ts)]
    is_right = F.lit(0)
    tagged_right = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        is_right.alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left_cols],
    )
    tagged_left = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).alias(f"__r_{c}") for c in payload_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    # right rows sort before left rows at equal __ts, so an exact-timestamp
    # right row is visible to the left row's window frame (ASOF `>=` ties)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_right.unionByName(tagged_left).select(
        key,
        "__ts",
        "__side",
        *[F.col(f"__l_{c}") for c in left_cols],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__a_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        key,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__a_{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
