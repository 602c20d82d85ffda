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


# Round-11 driver-run ordering. The driver caps each round at 50 queries.
# This window completes the steady ≤3-round freshness cycle (VERDICT r10
# item 1):
# (a) the full r7-latest tier — all 37 remaining oracle-checked queries,
# in the order r10 documented (catalog order);
# (b) the two STALE rows-only kernel chains (`m6_optimize_defense`, last
# driver row r8; `a7b_approx_sketches`, r5 — the repo's oldest row), each
# with its certifying readside/certify twin right behind it so the chain
# re-stages AND re-greens under current code (m6_defense_readside's
# oracle reads the parquet m6's builder stages — test_entry guards the
# ordering; a7c is independent but rotates with its partner);
# (c) the two builders this round's io.py change touched —
# s10_partitioned_resume (write_partitioned's ''-guard is now a
# raise_error CASE inside the written projection, single pass) and
# s19_dpp_star_join (staged through write_partitioned with the new
# partition VALUE codec, dim side encoded so DPP still fires);
# (d) the first 7 of the r8-latest tier in catalog order — the rotation's
# steady-state drumbeat.
# After this round no query's latest driver row (green or rows-only) is
# older than r8. Entries past position 50 are the documented queue for
# round 12: the r8-tier remainder in catalog order.
_RUN_FIRST = (
    # (a) r7-latest tier — catalog order (37)
    "o2_global_topn", "a7_distinct_counts", "a24_masked_pivot",
    "a8_relative_freq", "a15_event_sets",
    "a18_histogram_2d", "a25_cumulative",
    "j15_asof_join", "j16_full_outer", "f_kinematics",
    "p9_conditional_tiers", "a17_autocorr", "text_langid",
    "ngram_jaccard_pairs", "simhash_docs", "multimodal_resize",
    "multimodal_frame_sample", "multimodal_features",
    "decontaminate_ngram", "kmeans_lloyd", "a20_gamma_moments_fit",
    "a21_adaptive_window_fit", "a22_histogram_smooth",
    "a23_group_product", "a28_weighted_expectation",
    "j10_prior_weighted_rank", "m1_tree_ensemble_score",
    "p5_null_handling", "o5_deterministic_shuffle",
    "p1_conjunctive_lookup", "m7_grouped_matrix", "s13_error_channel",
    "etl_normalize_tracking", "m1b_forest_score", "m1c_forest_udf_score",
    "m1d_forest_compiled_score", "pagerank_converge",
    # (b) stale rows-only kernel chain + certifying twins. NOTE:
    # a7b_approx_sketches (the repo's oldest driver row, r5) is NOT here —
    # it was deliberately DE-CATALOGED in r7 (approx sketch values are
    # engine-specific, so its row could only ever be no_oracle;
    # relational.py:391-396); a7c_sketch_certify is its oracle-checked
    # certificate and rotates in its stead.
    "m6_optimize_defense", "m6_defense_readside",
    "a7c_sketch_certify",
    # (c) builders touched by this round's write_partitioned single-pass
    # guard + partition value codec, plus the NEW multimodal S13 error
    # channel (first driver row; adversarial-bytes fuzz in
    # tests/test_multimodal_fuzz.py)
    "s10_partitioned_resume", "s19_dpp_star_join",
    "multimodal_error_channel",
    # (d) r8-latest tier — first 7 in catalog order
    "w1_lag_gaps", "w3_rolling_mean", "w5_share_of_total",
    "resample_interpolate", "o7_global_rank", "funnel_steps",
    "split_assign",
    # ---- 50-query cap lands here; below is the documented queue (r12):
    # the r8-tier remainder in catalog order ----
    "pack_sequences", "s3_multi_scan_union", "w2_first_event_offset",
    "s14_upsert_merge", "o6_zorder_layout", "s15_rollup_reuse",
    "containment_pairs", "skew_salted_agg", "w8_zscore_anomaly",
    "pii_redact", "url_host_agg", "rollup_hierarchy", "ntile_stratify",
    "dedup_incremental", "mixture_temperature", "repeated_ngram_spans",
    "kmv_distinct_sketch", "bloom_semi_prune", "scd2_history",
    "psi_drift", "markov_transitions", "simhash_hamming_pairs",
    "zonemap_prune_stats", "oov_rate", "dup_span_coverage",
    "sessionize_batch", "blocking_pairs", "mad_robust_stats",
    "time_range_rolling", "time_weighted_avg", "triangle_count",
    "prefix_filter_jaccard", "cohort_retention", "pq_codes",
    "m1e_dart_forest_score", "stream_tumbling_counts",
    "stream_sliding_counts", "stream_stateful_totals_eventtime",
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
