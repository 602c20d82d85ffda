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


# Round-9 driver-run ordering. The driver caps each round at 50 queries, so
# emit first (a) this round's new + implementation-touched queries:
# stream_stateful_totals_eventtime_multibatch is new (8 file-per-batch
# micro-batches; mid-stream evict-then-readmit and per-key eviction counts
# oracle-checked by unrolling the per-batch watermark schedule in SQL);
# stream_stateful_totals' drain protocol now also requires unchanged
# source endOffsets across the zero-input streak; and the fuzz-driven
# fixes need fresh green rows — stream_session_windows (oracle boundary
# rule '>=' -> '>' + event_id tiebreak), the try_divide empty-doc quality
# family (text_quality, m10_quality_logit, quality_percentile_filter),
# the re-seeded fingerprint oracle (text_tokens_fingerprint), the
# try_divide cosine family (embed_knn_brute, embed_ivf_knn,
# dedup_embed_cosine, sim_recall_certify), and unpivot_features
# (try_divide tok_density). Then (b) the re-verification
# queue VERDICT r8 item 1 asked to finish: the 6 r4-latest queries, the
# full 30-query r5-latest tier (which already contains three of the
# touched quality queries), and the first 5 of the r6-latest tier
# (catalog order). Entries past position 50 are the documented queue for
# round 10: the r6 remainder in catalog order, kernel chains interleaved
# before the `*_readside` twins whose staged parquet their oracles read
# (test_entry guards that ordering).
_RUN_FIRST = (
    # (a) new + touched this round
    "stream_stateful_totals_eventtime_multibatch", "stream_stateful_totals",
    "stream_session_windows", "text_quality", "text_tokens_fingerprint",
    "embed_knn_brute", "embed_ivf_knn", "dedup_embed_cosine",
    "sim_recall_certify", "unpivot_features",
    # (b) r4-latest tier — catalog order
    "semantic_dedup", "dq_checks", "cms_heavyhitters",
    "stream_dedup", "stream_static_enrich", "stream_foreach_merge",
    # (b) r5-latest tier — catalog order (all 30; m10_quality_logit and
    # quality_percentile_filter are also touch-affected)
    "corpus_pipeline", "p11_masked_update", "p15_existence_guard",
    "j6_rejoin_computed", "j11_selfjoin_compare", "j14_label_join",
    "a27_axis_reduce", "o4_deterministic_order", "f13_flat_index",
    "f14_meshgrid", "f15_xor_flags", "f17_dot_projection",
    "s16_npy_datasource", "stream_npy_artifacts", "s17_npy_writer_roundtrip",
    "text_repetition", "mixture_sample", "token_topk",
    "f_json_props", "m10_quality_logit", "bpe_pair_counts",
    "tfidf_topterms", "chunk_documents", "quality_percentile_filter",
    "skew_salted_join", "pagerank_fixed", "pagerank_bucketed",
    "table_diff", "a7c_sketch_certify", "stream_interval_join",
    # (b) r6-latest tier — catalog order (first 4 — cap is 50)
    "a1_pricing_summary", "a12_two_level_agg", "j1_broadcast_enrich",
    "j3_region_rollup",
    # ---- 50-query cap lands here; below is the documented queue (r10) ----
    "j4_derived_scalar",
    "j5_derived_key_join", "a10_quantiles", "a16_corr_moments",
    "a19_calibration", "f_strings_keys", "f12_time_parts", "dedup_exact",
    "minhash_lsh_pairs", "dedup_clusters", "dedup_apply",
    "embed_lsh_buckets",
    "multimodal_decode", "s18_compaction_roundtrip",
    "s19_dpp_star_join", "m5_tuning_dataset", "stream_eppa_kernel",
    "m4_prior_surface", "encode_tokens", "ngram_lm_score",
    "f_variant_props",
    # r6 readside twins, each behind the kernel chain that stages its bytes
    "eppa_field_surface", "eppa_surface_readside",
    "eppa_pass_summary", "eppa_pass_readside",
    "eppa_player_stats", "eppa_player_readside",
    "m2_value_model_width", "m2_width_readside",
    "s4_prior_artifact_lifecycle", "s4_lifecycle_readside",
    "a20b_gamma_mle_fit", "a20b_mle_readside",
    "analytics_player_rankings", "rankings_readside",
    "analytics_throw_calibration", "calibration_readside",
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
