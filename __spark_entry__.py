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


# Round-8 driver-run ordering. The driver caps each round at 50 queries, so
# emit first (a) this round's new + implementation-touched queries —
# stream_stateful_totals_eventtime (event-time TTL, the eviction decision
# itself oracle-checked) and m1e_dart_forest_score (dart doc through the
# four-path certification) are new; m6 switched its default objective to
# 'hybrid' (surrogate shortlist + full-kernel re-rank → outputs change;
# kernel before its readside twin); stream_stateful_totals gained the
# tombstone-free assertion + 2-empty-batch drain — then (b) the
# re-verification queue from VERDICT r7 item 1: the 9 r2-latest queries,
# then the r4-latest tier in catalog order (36 of 42 fit under the cap).
# Entries past position 50 are the documented queue for round 9: the
# 6 r4-tier remainders, then the r5 tier oldest-first. m1b/m1c/m1d were
# refactored into stage-parameterized helpers this round with identical
# output (and m1e exercises those same helpers on the dart stage), so
# they queue behind the never-re-proved tiers rather than re-running.
_RUN_FIRST = (
    # (a) new + touched this round
    "stream_stateful_totals_eventtime", "m1e_dart_forest_score",
    "m6_optimize_defense", "m6_defense_readside", "stream_stateful_totals",
    # (b) r2-latest tier — last driver-green in round 2
    "s3_multi_scan_union", "split_assign",
    "stream_session_windows", "stream_sliding_counts",
    "stream_tumbling_counts", "w1_lag_gaps",
    "w2_first_event_offset", "w3_rolling_mean", "w5_share_of_total",
    # (b) r4-latest tier, catalog order (first 36 — cap is 50)
    "resample_interpolate", "o7_global_rank", "funnel_steps",
    "pack_sequences", "s14_upsert_merge", "o6_zorder_layout",
    "s15_rollup_reuse", "containment_pairs", "skew_salted_agg",
    "w8_zscore_anomaly", "pii_redact", "url_host_agg",
    "rollup_hierarchy", "unpivot_features", "ntile_stratify",
    "dedup_incremental", "mixture_temperature", "repeated_ngram_spans",
    "kmv_distinct_sketch", "bloom_semi_prune", "scd2_history",
    "psi_drift", "markov_transitions", "simhash_hamming_pairs",
    "zonemap_prune_stats", "oov_rate", "dup_span_coverage",
    "sessionize_batch", "blocking_pairs", "mad_robust_stats",
    "time_range_rolling", "time_weighted_avg", "triangle_count",
    "prefix_filter_jaccard", "cohort_retention", "pq_codes",
    # ---- 50-query cap lands here; below is the documented queue (r9) ----
    "semantic_dedup", "dq_checks", "cms_heavyhitters",
    "stream_dedup", "stream_static_enrich", "stream_foreach_merge",
    # then the r5-green tier oldest-first, then r6 (catalog order)
)


def _ordered(mapping: dict) -> dict:
    first = {k: mapping[k] for k in _RUN_FIRST if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in first}
    return {**first, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG
    from bigdatabowl_spark.plans.catalog import query_fns

    return _ordered(query_fns())


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each catalog query (same column aliases)."""
    import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG
    from bigdatabowl_spark.plans.catalog import oracle_map

    return _ordered(oracle_map())
