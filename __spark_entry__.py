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


# Round-12 driver-run ordering. The driver caps each round at 50 queries.
# This window is exactly the queue round 11 documented (VERDICT r11 item
# 1) — the full r8-latest tier — plus this round's touched builders and
# the start of the r9 tier:
# (a) the complete r8-latest tier — all 38 queries whose freshest driver
# row is r8, in catalog order (identical to the list r11 published past
# its cap marker);
# (b) the five builders this round's work touched —
# `dedup_clusters` (its hash-min label-propagation fixpoint now runs
# under the same superstep_shuffle_conf guard as pagerank, measured
# first; datapipe.py — and its connected-components loops now truncate
# lineage through operators/checkpointing.py), `stream_foreach_merge`
# (its versioned-state commit seam is fault-injected this round in
# tests/test_stream_faults.py),
# `stream_stateful_totals_eventtime_multibatch` (spill-probed under a
# starved RocksDB block cache in spill_probe_r12.json), and
# `pagerank_bucketed` + `pagerank_converge` (degree-aware checkpoint
# layout via round4.checkpoint_graph, degree-table reuse, and the
# reliable-checkpoint truncation path);
# (c) the first 7 of the r9-latest tier in catalog order — the
# rotation's steady-state drumbeat.
# After this round no query's latest driver row (green or rows-only) is
# older than r9. Entries past position 50 are the documented queue for
# round 13: the r9-tier remainder in catalog order (37 queries, 13
# slots spare for round-13 touched builders).
_RUN_FIRST = (
    # (a) r8-latest tier — catalog order (38)
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
    # (b) builders touched by this round's work (superstep conf on the
    # dedup fixpoint; streaming commit-seam fault injection; RocksDB
    # spill probe)
    "dedup_clusters", "stream_foreach_merge",
    "stream_stateful_totals_eventtime_multibatch",
    "pagerank_bucketed", "pagerank_converge",
    # (c) r9-latest tier — first 7 in catalog order
    "a1_pricing_summary", "a12_two_level_agg", "j1_broadcast_enrich",
    "j3_region_rollup", "text_quality", "text_tokens_fingerprint",
    "embed_knn_brute",
    # ---- 50-query cap lands here; below is the documented queue (r13):
    # the r9-tier remainder in catalog order ----
    "embed_ivf_knn", "dedup_embed_cosine",
    "corpus_pipeline", "p11_masked_update", "p15_existence_guard",
    "j6_rejoin_computed", "j11_selfjoin_compare", "j14_label_join",
    "a27_axis_reduce", "o4_deterministic_order", "f13_flat_index",
    "f14_meshgrid", "f15_xor_flags", "f17_dot_projection",
    "text_repetition", "mixture_sample", "token_topk", "f_json_props",
    "m10_quality_logit", "bpe_pair_counts", "tfidf_topterms",
    "chunk_documents", "quality_percentile_filter", "unpivot_features",
    "skew_salted_join", "pagerank_fixed",
    "semantic_dedup", "table_diff", "dq_checks", "cms_heavyhitters",
    "sim_recall_certify", "stream_session_windows", "stream_dedup",
    "stream_interval_join", "stream_stateful_totals",
    "stream_static_enrich",
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
