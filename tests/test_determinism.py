"""Bit-determinism under partitioning changes.

The oracle gate compares value hashes, so results must be identical not
just run-to-run but across different parallelism (the driver's session
may use any shuffle width). These tests re-run float-sensitive queries
under a different spark.sql.shuffle.partitions and require identical
sorted results — catching order-dependent float folds, nondeterministic
dropDuplicates, and rand() leakage.
"""

from __future__ import annotations

import pytest

QUERIES = [
    "a1_pricing_summary",       # decimal-sum aggregates
    "a16_corr_moments",         # correlation moments
    "etl_normalize_tracking",   # window diffs + rounding chain
    "m5_tuning_dataset",        # row_number picks + sqrt features
    "dedup_clusters",           # iterative component labels
    "j15_asof_join",            # ordered-window carry-forward
    "o5_deterministic_shuffle", # seeded shuffle must be seed-stable
    "tfidf_topterms",           # micro-quantized idf rank key
    "mixture_sample",           # hash-threshold sampling
    "text_repetition",          # ratio divisions
    "token_topk",               # global top-k tie-break
    "bpe_pair_counts",          # pair top-k tie-break
    "s14_upsert_merge",         # anti-join + union
    "m10_quality_logit",        # sigmoid rounding
    # round-4 float/order-sensitive additions
    "psi_drift",                # rounded-ln products over smoothed shares
    "kmv_distinct_sketch",      # rank-window kth-hash + one division
    "time_weighted_avg",        # decimal step integral + double division
    "mad_robust_stats",         # two exact-percentile passes
    "pagerank_fixed",           # integer sums must survive re-partitioning
]


def _rows(spark, sf_dir, name):
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    df = CATALOG[name].builder(spark, sf_dir)
    cols = sorted(df.columns)
    # repr-keyed sort: rows may hold None alongside str/num (unorderable);
    # float repr round-trips exactly, so equal lists ⇔ equal multisets
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


@pytest.mark.parametrize("name", QUERIES)
def test_repartition_invariance(spark, sf_dir, name, monkeypatch):
    base = _rows(spark, sf_dir, name)
    # configure() (called by every builder) derives shuffle width from
    # SPARK_GRAFT_CPUS — patch the source, not the conf it overwrites
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "3")
    alt = _rows(spark, sf_dir, name)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "6"
    assert base == alt
