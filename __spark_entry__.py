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


# Round-2 driver-run ordering: the round-1 driver produced correctness rows
# for only 50 of 90 catalog queries. Emit first the queries that still need a
# driver verdict — the 18 that errored/hash-missed in round 1 (all fixed by
# the events.ts dtype dispatch + oracle BIGINT casts) and the 40 the driver
# never reached — so a capped run covers them before re-proving round-1
# greens.
_RUN_FIRST = (
    # round-1 FAIL/error rows (fixed this round)
    "j7_event_span", "j13_range_join", "a7b_approx_sketches", "w1_lag_gaps",
    "w3_rolling_mean", "w5_share_of_total", "a26_argmax_per_group",
    "a7_distinct_counts", "a24_masked_pivot", "a8_relative_freq",
    "a15_event_sets", "a18_histogram_2d", "a25_cumulative", "j15_asof_join",
    "j16_full_outer", "f_kinematics", "p9_conditional_tiers", "a17_autocorr",
    # round-1 rows the driver never reached
    "etl_normalize_tracking", "s4_prior_artifact_lifecycle",
    "eppa_field_surface", "eppa_pass_summary",
    "eppa_player_stats", "m2_value_model_width", "m5_tuning_dataset",
    "m6_optimize_defense",
    "m1_tree_ensemble_score", "m7_grouped_matrix", "split_assign",
    "pack_sequences", "decontaminate_ngram", "kmeans_lloyd",
    "s1_csv_roundtrip", "s3_multi_scan_union", "s10_partitioned_resume",
    "s13_error_channel", "stream_tumbling_counts", "stream_sliding_counts",
    "stream_session_windows", "stream_stateful_totals",
    "a20_gamma_moments_fit", "a21_adaptive_window_fit", "a22_histogram_smooth",
    "a23_group_product", "a28_weighted_expectation", "j10_prior_weighted_rank",
    "p5_null_handling", "w2_first_event_offset", "o5_deterministic_shuffle",
    "p1_conjunctive_lookup", "p11_masked_update", "p15_existence_guard",
    "j6_rejoin_computed", "j11_selfjoin_compare", "j14_label_join",
    "a27_axis_reduce", "o4_deterministic_order", "f13_flat_index",
    "f14_meshgrid", "f15_xor_flags", "f17_dot_projection",
    "analytics_player_rankings", "analytics_throw_calibration",
    # round-2 additions (no driver verdict yet)
    "text_repetition", "mixture_sample", "token_topk", "f_json_props",
    "stream_dedup", "m10_quality_logit", "s14_upsert_merge",
    "o6_zorder_layout", "stream_interval_join", "bpe_pair_counts",
    "tfidf_topterms", "chunk_documents", "containment_pairs",
    "skew_salted_agg", "s15_rollup_reuse", "quality_percentile_filter", "w8_zscore_anomaly",
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
