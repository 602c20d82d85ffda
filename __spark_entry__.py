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


# Round-6 driver-run ordering. The driver caps each round at 50 queries, so
# emit first (a) the one never-driver-run query (the new m4_prior_surface),
# then (b) every implementation-touched chain this round — the three eppa
# tables now come from one shared staged kernel pass, m2 scores a depth-4
# forest, a20b gained a NaN guard, m5's throw frame is now sorted — each
# kernel entry immediately before its oracle-checked *_readside twin (the
# kernel's builder stages the parquet the readside's oracle reads), then
# (c) re-verification of the r1-green queries whose last driver run was
# round 1 (VERDICT r5 item 6 — shared helpers refactored since). Entries
# past position 50 are the documented queue (driver-green r2+ and
# in-repo-oracle green at sf0.001/0.01).
_RUN_FIRST = (
    # (a) never driver-run
    "m4_prior_surface", "m1b_forest_score", "m1c_forest_udf_score",
    "m1d_forest_compiled_score", "encode_tokens", "ngram_lm_score",
    "sim_recall_certify", "s18_compaction_roundtrip", "s19_dpp_star_join",
    "f_variant_props",
    # (b) implementation-touched kernel chains (kernel before readside)
    "eppa_field_surface", "eppa_surface_readside",
    "eppa_pass_summary", "eppa_pass_readside", "stream_eppa_kernel",
    "eppa_player_stats", "eppa_player_readside",
    "m2_value_model_width", "m2_width_readside",
    "analytics_player_rankings", "rankings_readside",
    "analytics_throw_calibration", "calibration_readside",
    "a20b_gamma_mle_fit", "a20b_mle_readside",
    "m5_tuning_dataset",
    "s4_prior_artifact_lifecycle", "s4_lifecycle_readside",
    "m6_optimize_defense", "m6_defense_readside",
    # (c) r1-green queries with no driver run since round 1
    "a10_quantiles", "a12_two_level_agg", "a16_corr_moments",
    "a19_calibration", "a1_pricing_summary", "dedup_apply",
    "dedup_clusters", "dedup_embed_cosine", "dedup_exact",
    "embed_ivf_knn", "embed_knn_brute", "embed_lsh_buckets",
    "f12_time_parts", "f_strings_keys", "j1_broadcast_enrich",
    "j3_region_rollup", "j4_derived_scalar", "j5_derived_key_join",
    "minhash_lsh_pairs", "multimodal_decode",
    # ---- 50-query cap lands here; below is the documented queue ----
    "multimodal_features", "multimodal_frame_sample", "multimodal_resize",
    "ngram_jaccard_pairs", "o2_global_topn", "simhash_docs",
    # r1 remainder, then the r2-green tier (oldest first), then r4/r5 greens
    "text_langid", "text_quality", "text_tokens_fingerprint",
    "u4_semi_anti", "u5_except_intersect", "w4_topk_per_group",
    "a15_event_sets", "a17_autocorr", "a18_histogram_2d",
    "a20_gamma_moments_fit", "a21_adaptive_window_fit",
    "a22_histogram_smooth", "a23_group_product", "a24_masked_pivot",
    "a25_cumulative", "a26_argmax_per_group", "a28_weighted_expectation",
    "a7_distinct_counts", "a8_relative_freq", "decontaminate_ngram",
    "etl_normalize_tracking", "f_kinematics", "j10_prior_weighted_rank",
    "j13_range_join", "j15_asof_join", "j16_full_outer", "j7_event_span",
    "kmeans_lloyd", "m1_tree_ensemble_score", "m7_grouped_matrix",
    "o5_deterministic_shuffle", "p1_conjunctive_lookup", "p5_null_handling",
    "p9_conditional_tiers", "s10_partitioned_resume", "s13_error_channel",
    "s1_csv_roundtrip", "s3_multi_scan_union", "split_assign",
    "stream_session_windows", "stream_sliding_counts",
    "stream_stateful_totals", "stream_tumbling_counts", "w1_lag_gaps",
    "w2_first_event_offset", "w3_rolling_mean", "w5_share_of_total",
    "a7b_approx_sketches", "a7c_sketch_certify",
    "corpus_pipeline", "pagerank_bucketed", "pagerank_fixed",
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
