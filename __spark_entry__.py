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


# Round-10 driver-run ordering. The driver caps each round at 50 queries.
# This window finishes the freshness rotation VERDICT r9 item 1 asked for:
# (a) the full r6-latest tier — 21 direct oracle-checked queries in catalog
# order, then the 8 kernel readside twins, each interleaved AFTER the
# rows-only kernel chain whose builder stages the parquet its oracle reads
# (test_entry guards that ordering; the 8 kernel queries consume slots as
# no_oracle rows, so the tier fills 37 of the 50). The dedup trio
# minhash_lsh_pairs / dedup_clusters / dedup_apply (DD3/6/7) sits in this
# tier and is additionally fuzz-hardened this round through
# test_dedup_fuzz's collision-pressure corpus (VERDICT r9 item 3).
# (b) The five queries whose BUILDERS the round-10 sources-layout fuzz
# changed (s1 null-token CSV round trip, s10 value-space resume +
# schema'd read-back, the s16/stream_npy/s17 stem-codec artifact family)
# get fresh driver rows; s19/s18, also touched, already sit in tier (a).
# (b2) s20_jsonl_roundtrip and stream_jsonl_documents are NEW this round
# (JSONL corpus sink/scan + its streaming ingest twin) and get their
# first driver rows. (c) The remaining 6 slots start the r7-latest tier
# in catalog order.
# After this round no oracle-checked query's latest driver-green row is
# older than r7. Entries past position 50 are the documented queue for
# round 11: the r7-tier remainder in catalog order.
_RUN_FIRST = (
    # (a) r6-latest tier — direct-oracle queries, catalog order
    "j4_derived_scalar", "j5_derived_key_join", "a10_quantiles",
    "a16_corr_moments", "a19_calibration", "f_strings_keys",
    "f12_time_parts", "dedup_exact", "minhash_lsh_pairs",
    "dedup_clusters", "dedup_apply", "embed_lsh_buckets",
    "multimodal_decode", "s18_compaction_roundtrip", "s19_dpp_star_join",
    "m5_tuning_dataset", "stream_eppa_kernel", "m4_prior_surface",
    "encode_tokens", "ngram_lm_score", "f_variant_props",
    # (a) r6 readside twins, each behind the kernel chain that stages
    # its bytes
    "eppa_field_surface", "eppa_surface_readside",
    "eppa_pass_summary", "eppa_pass_readside",
    "eppa_player_stats", "eppa_player_readside",
    "m2_value_model_width", "m2_width_readside",
    "s4_prior_artifact_lifecycle", "s4_lifecycle_readside",
    "a20b_gamma_mle_fit", "a20b_mle_readside",
    "analytics_player_rankings", "rankings_readside",
    "analytics_throw_calibration", "calibration_readside",
    # (b) builders changed by the r10 sources-layout fuzz fixes
    "s1_csv_roundtrip", "s10_partitioned_resume", "s16_npy_datasource",
    "stream_npy_artifacts", "s17_npy_writer_roundtrip",
    # (b2) new this round: JSONL corpus round trip + streaming ingest twin
    # (first driver rows)
    "s20_jsonl_roundtrip", "stream_jsonl_documents",
    # (c) r7-latest tier — first 6 in catalog order
    "j7_event_span", "j13_range_join", "u4_semi_anti",
    "u5_except_intersect", "w4_topk_per_group", "a26_argmax_per_group",
    # ---- 50-query cap lands here; below is the documented queue (r11):
    # the r7-latest remainder in catalog order ----
    "o2_global_topn", "a7_distinct_counts", "a24_masked_pivot", "a8_relative_freq", "a15_event_sets",
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
