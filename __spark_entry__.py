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


# Round-3 driver-run ordering. The driver caps each round at 50 queries, so
# emit first the queries with no driver verdict in CORRECTNESS_r01/r02:
# (a) pack_sequences — the single r2 hash-FAIL (oracle HUGEINT type artifact,
#     now CAST to BIGINT; values verified identical at 3 SFs) — re-verify it;
# then the 11 round-3 additions (never driver-run);
# (b) the 30 catalog queries the driver never ran in r1 or r2;
# (c) the 8 rows-only kernel queries, now emitting self-certifying invariant
#     columns so the rows-only check exercises real semantics.
# That is exactly 50 entries — the full cap goes to un-verdicted queries.
# Union over r1+r2+r3 then covers all 124 catalog queries.
_RUN_FIRST = (
    # (a) r2 hash-FAIL, oracle type fixed this round
    "pack_sequences",
    # round-3 additions (never driver-run)
    "pii_redact", "url_host_agg", "stream_static_enrich",
    "rollup_hierarchy", "unpivot_features", "ntile_stratify",
    "resample_interpolate", "o7_global_rank", "funnel_steps",
    "dedup_incremental", "skew_salted_join",
    # (b) never driver-run in r1 or r2
    "tfidf_topterms", "containment_pairs", "skew_salted_agg", "stream_dedup",
    "stream_interval_join", "s14_upsert_merge", "s15_rollup_reuse",
    "o6_zorder_layout", "w8_zscore_anomaly", "quality_percentile_filter",
    "m10_quality_logit", "mixture_sample", "token_topk", "bpe_pair_counts",
    "chunk_documents", "text_repetition", "f_json_props",
    "p11_masked_update", "p15_existence_guard", "j6_rejoin_computed",
    "j11_selfjoin_compare", "j14_label_join", "a27_axis_reduce",
    "o4_deterministic_order", "f13_flat_index", "f14_meshgrid",
    "f15_xor_flags", "f17_dot_projection",
    "analytics_player_rankings", "analytics_throw_calibration",
    # (c) rows-only kernel queries, now with in-row invariant certification
    "a20b_gamma_mle_fit",
    "a7b_approx_sketches", "s4_prior_artifact_lifecycle",
    "eppa_field_surface", "eppa_pass_summary", "eppa_player_stats",
    "m2_value_model_width", "m6_optimize_defense",
    # round-4 queue (past the 50-query cap this round; in-repo oracle green)
    "mixture_temperature",
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
