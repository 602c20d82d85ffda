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


# Round-5 driver-run ordering. The driver caps each round at 50 queries, so
# emit first the queries with no driver verdict in any round (VERDICT r4
# item 1), then the kernel chains paired with their new oracle-checked
# *_readside twins (VERDICT r4 item 2 — each kernel query materializes its
# output table, the readside that FOLLOWS it aggregates that same parquet in
# both engines, so the kernel entry must stay immediately before its
# readside), then insurance re-runs of every query whose implementation
# changed this round. Entries past position 50 are the documented queue
# (all driver-green in r1/r2/r4 and in-repo-oracle green at sf0.001/0.01).
_RUN_FIRST = (
    # (a) the 22 queries with no driver verdict in r1/r2/r4
    "quality_percentile_filter", "m10_quality_logit",
    "mixture_sample", "token_topk", "bpe_pair_counts",
    "chunk_documents", "text_repetition", "f_json_props",
    "p11_masked_update", "p15_existence_guard", "j6_rejoin_computed",
    "j11_selfjoin_compare", "j14_label_join", "a27_axis_reduce",
    "o4_deterministic_order", "f13_flat_index", "f14_meshgrid",
    "f15_xor_flags", "f17_dot_projection",
    "analytics_player_rankings", "rankings_readside",
    "analytics_throw_calibration", "calibration_readside",
    "a20b_gamma_mle_fit", "a20b_mle_readside",
    # (b) kernel chains, each immediately followed by its oracle-checked
    #     read side (the kernel's builder stages the parquet the readside's
    #     oracle reads)
    "eppa_field_surface", "eppa_surface_readside",
    "eppa_pass_summary", "eppa_pass_readside", "stream_eppa_kernel",
    "eppa_player_stats", "eppa_player_readside",
    "m2_value_model_width", "m2_width_readside",
    "m6_optimize_defense", "m6_defense_readside",
    "s4_prior_artifact_lifecycle", "s4_lifecycle_readside",
    "a7b_approx_sketches", "a7c_sketch_certify",
    # (c) new / implementation-touched this round
    "corpus_pipeline", "pagerank_bucketed",
    "tfidf_topterms", "stream_interval_join", "table_diff",
    "s16_npy_datasource", "s17_npy_writer_roundtrip",
    "stream_npy_artifacts",
    "skew_salted_join", "pagerank_fixed",
    # ---- 50-query cap lands here; below is the documented queue ----
    "mixture_temperature",
    "repeated_ngram_spans", "kmv_distinct_sketch", "bloom_semi_prune",
    "scd2_history", "psi_drift", "markov_transitions",
    "simhash_hamming_pairs", "zonemap_prune_stats", "oov_rate",
    "dup_span_coverage", "sessionize_batch", "blocking_pairs",
    "mad_robust_stats", "time_range_rolling", "time_weighted_avg",
    "triangle_count", "prefix_filter_jaccard",
    "cohort_retention", "stream_foreach_merge", "pq_codes",
    "semantic_dedup", "dq_checks", "cms_heavyhitters",
    "pack_sequences", "pii_redact", "url_host_agg", "stream_static_enrich",
    "rollup_hierarchy", "unpivot_features", "ntile_stratify",
    "resample_interpolate", "o7_global_rank", "funnel_steps",
    "dedup_incremental", "containment_pairs", "skew_salted_agg",
    "stream_dedup", "s14_upsert_merge", "s15_rollup_reuse",
    "o6_zorder_layout", "w8_zscore_anomaly",
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
