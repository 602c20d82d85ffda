"""Physical-plan quality gates (SURVEY §4, §6 scale posture).

At 100 TB the plan shape matters as much as the result: filters must reach
the parquet scan, scans must prune to the referenced columns, dimension
joins must broadcast, and operators designed to be map-side must not
shuffle. These tests pin those properties on `.explain("formatted")`
output, so a refactor that silently degrades the plan (e.g. a lost
pushdown or an accidental sort-merge join) fails even though results stay
correct.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _catalog_plan(spark, sf_dir, name) -> str:
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    return _plan(CATALOG[name].builder(spark, sf_dir))


def _read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """a1's date predicate must appear in PushedFilters, not a post-scan
    Filter only (PushDownPredicate, SURVEY §4)."""
    plan = _catalog_plan(spark, sf_dir, "a1_pricing_summary")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("l_shipdate" in p for p in pushed), plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    """a1 reads 6 of lineitem's 16 columns — the scan schema must shrink
    accordingly (ColumnPruning → parquet reader, SURVEY §4)."""
    plan = _catalog_plan(spark, sf_dir, "a1_pricing_summary")
    schemas = _read_schemas(plan)
    assert schemas, plan
    for s in schemas:
        cols = [c for c in s.split(",") if ":" in c]
        assert len(cols) <= 6, s
        assert "l_comment" not in s


def test_point_lookup_pushes_equality_filters(spark, sf_dir):
    """P1 conjunctive lookup: both equality predicates pushed to the scan."""
    plan = _catalog_plan(spark, sf_dir, "p1_conjunctive_lookup")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "EqualTo(l_returnflag" in pushed, plan
    assert "EqualTo(l_linestatus" in pushed, plan


def test_dim_join_broadcasts(spark, sf_dir):
    """J1 lineitem ⋈ part: the dimension side must hash-broadcast — a
    sort-merge join here would shuffle the fact table (SURVEY §2.3 J1)."""
    plan = _catalog_plan(spark, sf_dir, "j1_broadcast_enrich")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tracking_etl_broadcasts_all_dim_joins(spark, sf_dir):
    """The normalize lifecycle joins games/plays/LOS back to tracking —
    every one must broadcast (normalize.py:22,28,35-37 are all dim joins)."""
    plan = _catalog_plan(spark, sf_dir, "etl_normalize_tracking")
    assert "SortMergeJoin" not in plan, plan


def test_lsh_bucket_assignment_is_shuffle_free(spark, sf_dir):
    """Hyperplane bucketing is a per-row expression — the plan must contain
    no Exchange at all (the 100 TB argument for the LSH path)."""
    from bigdatabowl_spark.operators.similarity import lsh_bucket_assignments
    from bigdatabowl_spark.plans.catalog import t

    emb = t(spark, sf_dir, "embeddings")
    plan = _plan(lsh_bucket_assignments(emb, spark))
    assert "Exchange" not in plan, plan


def test_shingle_table_is_shuffle_free(spark, sf_dir):
    """Shingling + per-row dedup must stay map-side: explode over
    array_distinct, no global distinct shuffle."""
    from bigdatabowl_spark.operators.dedup import shingle_table
    from bigdatabowl_spark.plans.catalog import t

    docs = t(spark, sf_dir, "documents")
    plan = _plan(shingle_table(docs))
    assert "Exchange" not in plan, plan


def test_window_topk_single_exchange(spark, sf_dir):
    """W4 rank-per-group needs exactly one shuffle (the window partition);
    more means a redundant repartition crept in."""
    plan = _catalog_plan(spark, sf_dir, "w4_topk_per_group")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan


def test_decontaminate_broadcasts_test_ngrams(spark, sf_dir):
    """TD1: the held-out split's n-grams are benchmark-sized — they must
    broadcast so the train-side shingle scan never shuffles for the join."""
    plan = _catalog_plan(spark, sf_dir, "decontaminate_ngram")
    assert "BroadcastHashJoin" in plan, plan


def test_pack_sequences_single_window_exchange(spark, sf_dir):
    """TP1: packing is one shuffle (the per-shard window partition); the
    final groupBy reuses the same hash partitioning or collapses under AQE."""
    plan = _catalog_plan(spark, sf_dir, "pack_sequences")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 2, plan


def test_global_topn_is_take_ordered(spark, sf_dir):
    """O2 global top-10 must compile to TakeOrderedAndProject (per-partition
    local top-k), not a single-partition global sort — the unpartitioned
    row_number window funnels every group through one task at scale."""
    plan = _catalog_plan(spark, sf_dir, "o2_global_topn")
    assert "TakeOrderedAndProject" in plan, plan


def test_two_level_agg_partial_aggregation(spark, sf_dir):
    """A12 two-stage aggregation must show map-side partial aggregates
    (HashAggregate appears before its Exchange) — partial/final split is
    what bounds shuffle volume at scale."""
    plan = _catalog_plan(spark, sf_dir, "a12_two_level_agg")
    # ≥2 HashAggregates: the partial (map-side) and final (post-shuffle)
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_covers_relational_core(spark, sf_dir):
    """The relational queries must run inside WholeStageCodegen spans —
    falling out of codegen (e.g. via an interpreted expression) is a 10×
    regression at scale. AQE only materializes codegen in the executed
    plan, so run the query first and inspect that."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    for name in ["a1_pricing_summary", "j13_range_join", "w1_lag_gaps"]:
        df = CATALOG[name].builder(spark, sf_dir)
        df.collect()  # count() would execute a derived plan, not this one
        executed = df._jdf.queryExecution().executedPlan().toString()
        # codegen spans print as "*(n) Operator" in the simple plan string
        assert re.search(r"\*\(\d+\) ", executed), f"{name}:\n{executed}"


def test_asof_join_single_exchange_no_join(spark, sf_dir):
    """The as-of join's point is avoiding a range-join blowup: its plan
    must contain NO join operator and exactly one exchange (the window's
    hash partition on the key). Both sides read the same events scan."""
    plan = _catalog_plan(spark, sf_dir, "j15_asof_join")
    assert not re.search(r"Join", plan), plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan


def test_split_assign_is_map_only(spark, sf_dir):
    """Hash-bucket split assignment is a pure projection — any Exchange
    in its plan means someone added an accidental shuffle."""
    plan = _catalog_plan(spark, sf_dir, "split_assign")
    assert "Exchange" not in plan, plan


def test_multimodal_error_channel_is_map_only(spark, sf_dir):
    """The S13 decode-with-errors stage is per-payload — scan →
    mapInPandas, no Exchange, no Join: at 100 TB the error channel must
    not cost a shuffle, and the payload column must stream through one
    Arrow stage."""
    plan = _catalog_plan(spark, sf_dir, "multimodal_error_channel")
    assert "Exchange" not in plan, plan
    assert not re.search(r"\bJoin\b", plan), plan
    assert "MapInPandas" in plan, plan


def test_full_outer_reuses_aggregate_partitioning(spark, sf_dir):
    """j16: each side shuffles once for its aggregate and the full-outer
    join reuses that hash partitioning — exactly 2 exchanges, not 4."""
    plan = _catalog_plan(spark, sf_dir, "j16_full_outer")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 2, plan


def test_token_topk_is_take_ordered(spark, sf_dir):
    """Global heavy-hitters must end in TakeOrderedAndProject (partial
    per-partition top-k + driver merge), never a single-partition global
    sort of the vocabulary."""
    plan = _catalog_plan(spark, sf_dir, "token_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_mixture_sample_broadcasts_rates(spark, sf_dir):
    """The per-source rate table must broadcast back onto the corpus scan
    (J4 pattern) — a shuffled join here would reshuffle the whole corpus
    to apply a 20-row sampling table."""
    plan = _catalog_plan(spark, sf_dir, "mixture_sample")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_text_repetition_partial_aggregation(spark, sf_dir):
    """Both repetition groupBys must plan partial HashAggregates so the
    exploded token stream combines map-side before shuffling."""
    plan = _catalog_plan(spark, sf_dir, "text_repetition")
    assert len(re.findall(r"HashAggregate", plan)) >= 4, plan


def test_quality_logit_is_map_only(spark, sf_dir):
    """The logistic quality scorer is a pure projection — model application
    must not introduce any shuffle."""
    plan = _catalog_plan(spark, sf_dir, "m10_quality_logit")
    assert "Exchange" not in plan, plan


def test_zorder_key_single_exchange(spark, sf_dir):
    """Morton-key construction is map-side bit arithmetic; only the bucket
    aggregate may shuffle — exactly one Exchange in the whole plan."""
    plan = _catalog_plan(spark, sf_dir, "o6_zorder_layout")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan


def test_upsert_merge_no_cartesian(spark, sf_dir):
    """The merge must stay an equi-key anti join — a dropped equi condition
    degrades to BroadcastNestedLoop/Cartesian, which never survives scale."""
    plan = _catalog_plan(spark, sf_dir, "s14_upsert_merge")
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_runtime_bloom_filter_engages_for_fact_fact_join(spark, sf_dir):
    """At 100 TB a selective fact-fact shuffle join should inject a runtime
    bloom filter (row-level semi-join pushdown built from the small side) so
    the big side drops non-joining rows before the exchange. The thresholds
    that gate injection are sized for clusters (application side ≥ 10 GB
    scan), so scale them to the testdata here — what's pinned is that the
    session keeps the feature on and the optimizer fires it."""
    import pyspark.sql.functions as F

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized, optimized
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_tfidf_shares_doc_partitioning(spark, sf_dir):
    """Doc-length window and top-k window must share one doc_id exchange
    (doclen as a separate agg+join costs 2 more exchanges — the regression
    this guards against), and the tf lineage must sit behind a
    materialization boundary (lazy localCheckpoint) so the tokenize→
    explode→agg pass executes once, not once per consuming branch
    (ADVICE r4 item 1). localCheckpoint over persist: no session-lived
    CacheManager entry — blocks are freed when the plan is GC'd."""
    plan = _catalog_plan(spark, sf_dir, "tfidf_topterms")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    # downstream of the checkpointed tf both consumers + top-k window; the
    # tf build's own exchanges sit behind the checkpoint boundary. A
    # doclen agg+join regression would add 2+.
    assert n_exchange <= 6, plan
    assert (
        "ExistingRDD" in plan
        or "LogicalRDD" in plan
        or "InMemoryTableScan" in plan
    ), plan


def test_superstep_shuffle_conf_gates_and_restores(spark):
    """The big-graph fixpoint posture (AQE coalescing off — measured
    1.4-2.2x/superstep tax at 100M edges, bench_scale_probe_r11.json):
    no-op under the node threshold, sets+restores above it, restores even
    when the loop body raises."""
    import pytest as _pytest

    from bigdatabowl_spark.plans.round4 import (
        _SUPERSTEP_NO_COALESCE_MIN_NODES,
        superstep_shuffle_conf,
    )

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    assert prev == "true"  # session default; the gate must flip this

    with superstep_shuffle_conf(spark, _SUPERSTEP_NO_COALESCE_MIN_NODES - 1):
        assert spark.conf.get(key) == "true"  # small graph: no-op
    with superstep_shuffle_conf(spark, _SUPERSTEP_NO_COALESCE_MIN_NODES):
        assert spark.conf.get(key) == "false"  # big graph: coalescing off
    assert spark.conf.get(key) == prev

    with _pytest.raises(RuntimeError, match="boom"):
        with superstep_shuffle_conf(spark, 10**9):
            assert spark.conf.get(key) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == prev  # restored on exception


def test_pagerank_bucketed_never_broadcasts_ranks(spark, sf_dir):
    """The billion-node PageRank variant must keep every superstep join a
    shuffle join: a single BroadcastExchange anywhere in the pipeline means
    a |nodes|-sized table is being collected to the driver per superstep —
    the OOM-at-scale plan this variant exists to avoid."""
    plan = _catalog_plan(spark, sf_dir, "pagerank_bucketed")
    assert "BroadcastExchange" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_funnel_single_exchange_no_join(spark, sf_dir):
    """The funnel's three dependent stage windows share the user_id
    partitioning — one exchange total (plus the distinct's re-use of it),
    and no join operator anywhere."""
    plan = _catalog_plan(spark, sf_dir, "funnel_steps")
    assert not re.search(r"SortMergeJoin|BroadcastHashJoin", plan), plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 2, plan  # window exchange + distinct reuses hash


def test_resample_no_join_union_windows(spark, sf_dir):
    """Resampling recovers both interpolation endpoints with window scans
    over a union — the broadcast offsets in o7 aside, a Join node here
    means someone replaced the as-of pattern with a range join."""
    plan = _catalog_plan(spark, sf_dir, "resample_interpolate")
    assert not re.search(r"SortMergeJoin", plan), plan
    assert "Union" in plan, plan


def test_pii_redact_is_map_side_regex(spark, sf_dir):
    """Redaction is JVM regex inside codegen: no Python stage, and the
    only exchange is the tiny per-source rollup."""
    plan = _catalog_plan(spark, sf_dir, "pii_redact")
    assert "Python" not in plan, plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan


def test_rollup_single_exchange(spark, sf_dir):
    """Grouping-sets rollup computes all three granularities in ONE
    shuffle (Expand + single aggregate exchange), not three jobs."""
    plan = _catalog_plan(spark, sf_dir, "rollup_hierarchy")
    assert "Expand" in plan, plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan


def test_unpivot_is_single_exchange(spark, sf_dir):
    """The melt is a zero-shuffle narrow transform; only the per-feature
    rollup exchanges."""
    plan = _catalog_plan(spark, sf_dir, "unpivot_features")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan


def test_salted_join_spreads_hot_keys(spark, sf_dir):
    """The salted join must join on (key, salt) — the salt column in the
    join keys is what spreads a hot key over n reducers."""
    plan = _catalog_plan(spark, sf_dir, "skew_salted_join")
    assert "_salt" in plan, plan
    assert re.search(r"Join", plan), plan


# ---- round-4 additions (plans/round4.py) ----------------------------------


def test_repeated_ngram_no_join(spark, sf_dir):
    """DD10 is a single combining aggregation — any Join in this plan means
    someone reintroduced a self-join for what groupBy already does."""
    plan = _catalog_plan(spark, sf_dir, "repeated_ngram_spans")
    assert "Join" not in plan, plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 2, plan  # countDistinct expansion adds the 2nd


def test_scd2_windows_share_one_sort(spark, sf_dir):
    """Both SCD2 windows partition on (user_id | ts_us, event_id); the
    change-filter preserves that distribution, so the whole history build
    is ONE shuffle of the event table."""
    plan = _catalog_plan(spark, sf_dir, "scd2_history")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan


def test_bloom_prune_all_joins_broadcast(spark, sf_dir):
    """BF1's position tables and the exact build side are all bounded-small;
    every join must broadcast — a sort-merge here means the fact table
    shuffled for a membership probe, defeating the whole point."""
    plan = _catalog_plan(spark, sf_dir, "bloom_semi_prune")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_simhash_pairs_band_equi_join(spark, sf_dir):
    """SH1's candidate generation must never be a nested-loop/cartesian
    all-pairs comparison — and since r13 it must not be a join at all:
    one exchange groups each (band, value) bucket, and the hamming
    verify + first-matching-band dedup run inside the expansion lambda,
    so no candidate pair ever crosses a shuffle (the old shape exchanged
    the banded table twice for a skewed self-join plus 9.5M rows
    through a DISTINCT)."""
    plan = _catalog_plan(spark, sf_dir, "simhash_hamming_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 1, plan


def test_psi_drift_no_corpus_recompute(spark, sf_dir):
    """The totals come from a window over the 10-row histogram; an
    agg+crossJoin formulation re-executes the corpus lineage (5 exchanges,
    6 nested loops — the shape this gate exists to prevent)."""
    plan = _catalog_plan(spark, sf_dir, "psi_drift")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 3, plan


def test_oov_vocab_is_take_ordered_and_broadcast(spark, sf_dir):
    """TT5's vocabulary must come from TakeOrderedAndProject (distributed
    top-k, no global-window sort) and join the token stream by broadcast."""
    plan = _catalog_plan(spark, sf_dir, "oov_rate")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_zonemap_single_exchange(spark, sf_dir):
    """ZM1 is map-side bucket tagging + one partial-agg; the unioned dual
    layout must not add a second shuffle."""
    plan = _catalog_plan(spark, sf_dir, "zonemap_prune_stats")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan


def test_sessionize_batch_single_exchange(spark, sf_dir):
    """Both sessionization windows and the session rollup share the
    (user_id) hash partitioning — the whole query is ONE shuffle."""
    plan = _catalog_plan(spark, sf_dir, "sessionize_batch")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan


def test_blocking_pairs_equi_join_on_block_keys(spark, sf_dir):
    """ER1 candidates must come from an equi join on both block columns —
    a cartesian with post-filters is the quadratic blowup blocking exists
    to avoid."""
    plan = _catalog_plan(spark, sf_dir, "blocking_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mad_broadcasts_group_medians(spark, sf_dir):
    """RB1's median table is |groups| rows and must broadcast back to the
    facts — a shuffled join would re-shuffle the fact table for 3 rows."""
    plan = _catalog_plan(spark, sf_dir, "mad_robust_stats")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dup_span_coverage_semi_join(spark, sf_dir):
    """DD10-apply keeps only dup-gram occurrences via a semi join (or
    AQE-converted broadcast); no cartesian anywhere in the lineage."""
    plan = _catalog_plan(spark, sf_dir, "dup_span_coverage")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_time_range_rolling_single_exchange(spark, sf_dir):
    """TR1's range frame runs on the one (user_id) sort — no extra shuffle,
    no join, no self-merge formulation."""
    plan = _catalog_plan(spark, sf_dir, "time_range_rolling")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan


def test_time_weighted_avg_single_exchange(spark, sf_dir):
    """TR2's lead window and the per-user rollup share the (user_id)
    partitioning — one shuffle end-to-end."""
    plan = _catalog_plan(spark, sf_dir, "time_weighted_avg")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan


def test_triangle_count_equi_joins_only(spark, sf_dir):
    """GR1's triangle enumeration must be equi joins on edge endpoints —
    a cartesian/nested-loop means the oriented-edge convention was lost.
    The three scalar summaries (edges/wedges/triangles) combine via 1-row
    broadcast nested loops, which are exempt (the J4 pattern)."""
    plan = _catalog_plan(spark, sf_dir, "triangle_count")
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan


def test_triangle_count_single_adjacency_build(spark, sf_dir):
    """GR1's sorted-adjacency table feeds BOTH intersection sides; before
    r12 the two differently-aliased subtrees re-ran the collect_list
    aggregation over the full edge table (4 ObjectHashAggregates, zero
    ReusedExchange at runtime). The adjacency is now materialized once
    (localCheckpoint) — the query plan must contain NO collect_list
    aggregation at all, only checkpoint read-backs into the broadcasts."""
    plan = _catalog_plan(spark, sf_dir, "triangle_count")
    assert "ObjectHashAggregate" not in plan, plan
    assert "collect_list" not in plan, plan


def test_dedup_apply_broadcasts_drop_list(spark, sf_dir):
    """DD7's final keep-pass anti-joins the corpus against the (tiny) drop
    list: the drop side must broadcast so the corpus id column is never
    exchanged or sorted (was a SortMergeJoin LeftAnti that shuffled every
    corpus id, plans/r12/dedup_apply2_before.txt)."""
    plan = _catalog_plan(spark, sf_dir, "dedup_apply")
    assert re.search(r"BroadcastHashJoin LeftAnti", plan), plan
    assert "SortMergeJoin" not in plan, plan


def test_pagerank_broadcasts_ranks(spark, sf_dir):
    """GR2's per-iteration rank and degree tables are |nodes| rows and must
    broadcast into the graph join — shuffling the edge table three times
    for a 20k-row side is the regression this pins."""
    plan = _catalog_plan(spark, sf_dir, "pagerank_fixed")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_prefix_filter_candidates_from_prefix_join(spark, sf_dir):
    """DD11's candidates must come from an equi join on prefix tokens —
    no cartesian; the frequency and size tables broadcast."""
    plan = _catalog_plan(spark, sf_dir, "prefix_filter_jaccard")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_cohort_retention_broadcasts_sizes(spark, sf_dir):
    """CO1's cohort-size table is |cohorts| rows and must broadcast; the
    user-keyed retention join must not cartesian."""
    plan = _catalog_plan(spark, sf_dir, "cohort_retention")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pq_codebook_broadcasts(spark, sf_dir):
    """SIM4's per-iteration codebook is subs x k x dims rows (512) and must
    broadcast into the distance join — shuffling the point table per Lloyd
    round against a 512-row side is the regression this pins."""
    plan = _catalog_plan(spark, sf_dir, "pq_codes")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_semantic_dedup_pairs_bounded_by_cluster(spark, sf_dir):
    """DD12's similarity pairs must come from an equi join on the cluster
    id — the all-pairs term is per-cluster by construction; the centroid
    cross join is the K-row broadcast (nestedloop-exempt)."""
    plan = _catalog_plan(spark, sf_dir, "semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan


def test_table_diff_single_key_join(spark, sf_dir):
    """CDC1 diffs via ONE full-outer join on the key with map-side row
    hashes — no second join, no cartesian."""
    plan = _catalog_plan(spark, sf_dir, "table_diff")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("FullOuter") >= 1 or "full_outer" in plan.lower(), plan


def test_dq_fk_check_is_anti_join(spark, sf_dir):
    """DQ1's referential-integrity check must plan as a left-anti join,
    not an exists-subquery rewrite into something quadratic."""
    plan = _catalog_plan(spark, sf_dir, "dq_checks")
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cms_probe_broadcasts_cells(spark, sf_dir):
    """CMS1's 1024-cell sketch table must broadcast onto the top-k probe
    rows; the build side is combining aggregations with no join at all."""
    plan = _catalog_plan(spark, sf_dir, "cms_heavyhitters")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_corpus_pipeline_broadcasts_bench_shingles(spark, sf_dir):
    """The end-to-end corpus build's decontamination stage must broadcast
    the benchmark shingle set onto the exploded corpus shingles (the corpus
    side is the 100 TB side), and the anti-join back onto corpus docs must
    not be a cartesian."""
    plan = _catalog_plan(spark, sf_dir, "corpus_pipeline")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_m4_prior_surface_constant_shuffle(spark, sf_dir):
    """The M4 prior surface must stay broadcast-shaped at any scale: the
    prior tables ride BroadcastHashJoins onto the generated grid, no
    sort-merge/shuffled-hash join anywhere, and the ONLY shuffle is the
    SinglePartition exchange feeding the 1-row exact-integer total —
    constant-size regardless of grid or prior dimensions."""
    plan = _catalog_plan(spark, sf_dir, "m4_prior_surface")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # formatted mode names nodes "Exchange (n)" with partitioning in the
    # Arguments line; broadcast exchanges print as "BroadcastExchange"
    shuffles = re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan)
    assert len(shuffles) == 1, (shuffles, plan)
    assert "SinglePartition" in plan, plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, plan


def test_m1b_forest_walk_is_broadcast_only(spark, sf_dir):
    """Arbitrary-depth forest inference must broadcast the node/tree
    relations at every traversal level — never shuffle the fact side per
    level. The only shuffle is the final (row, class) margin aggregation."""
    plan = _catalog_plan(spark, sf_dir, "m1b_forest_score")
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 5, plan
    shuffles = re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan)
    assert len(shuffles) == 1, (shuffles, plan)
    assert "hashpartitioning" in plan, plan


def test_m1c_udf_scorer_is_map_only(spark, sf_dir):
    """The Pandas-UDF forest scorer must be map-only: the model loads
    inside the worker, so the plan has NO join and NO shuffle — one
    ArrowEvalPython/MapInPandas stage over the pruned orders scan."""
    plan = _catalog_plan(spark, sf_dir, "m1c_forest_udf_score")
    assert not re.search(r"Join", plan), plan
    assert not re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan), plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan


def test_m1d_compiled_scorer_is_codegen_map_only(spark, sf_dir):
    """The compiled-CASE forest scorer must run entirely JVM-side: no
    join, no shuffle, no Python stage — and the CASE cascade must sit
    inside a WholeStageCodegen span (the treelite-analogue contract)."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    df = CATALOG["m1d_forest_compiled_score"].builder(spark, sf_dir)
    plan = _plan(df)
    assert not re.search(r"Join", plan), plan
    assert not re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan), plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\*\(\d+\) ", executed), executed


def test_encode_tokens_vocab_is_takeordered_and_join_broadcasts(spark, sf_dir):
    """encode_tokens' scale contract: the vocab derivation must plan the
    top-V as TakeOrderedAndProject (per-partition top-V + driver merge,
    never a full sort of the token-frequency table — a web corpus has
    billions of unique tokens), the single-partition window runs only on
    the constant V-row result, and the encode join against the vocab is a
    BroadcastHashJoin (the token stream itself never shuffles to encode)."""
    plan = _catalog_plan(spark, sf_dir, "encode_tokens")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # no global Sort of the full counts relation: every Sort in the plan
    # must sit under the TakeOrdered/window on the V-row side, which AQE
    # prints as a local sort — assert there's no sort-merge join path
    assert "SortMergeJoin" not in plan, plan


def test_ngram_lm_score_pairs_map_only_no_window(spark, sf_dir):
    """ngram_lm_score's scale contract: bigram extraction is a map-only
    array transform (Generate over the token array — never a per-doc
    Window/lead or a positional self-join, which would shuffle the full
    token stream just to form pairs), and the only nested-loop join is the
    1-row vocab-size scalar broadcast."""
    plan = _catalog_plan(spark, sf_dir, "ngram_lm_score")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Generate" in plan, plan


def test_dpp_star_join_prunes_fact_scan(spark, sf_dir):
    """s19's scale contract: the partitioned fact scan must carry a
    dynamicpruningexpression partition filter (runtime pruning from the
    filtered dim via the reused broadcast) — without it the query reads
    every partition of the 100 TB fact and the layout buys nothing."""
    plan = _catalog_plan(spark, sf_dir, "s19_dpp_star_join")
    assert "dynamicpruning" in plan.lower(), plan
    assert "BroadcastHashJoin" in plan, plan


def test_m1_feature_expressions_are_non_null(spark, sf_dir):
    """The m1b join walk, m1d compiled CASE, and their DuckDB oracle omit
    default_left NaN routing (only m1c implements it), which is sound only
    if the 26 _FEATURES expressions over orders never produce NULL/NaN —
    the staged-forest contract asserted in round6._stage_forest (ADVICE
    r6). Pin that invariant directly."""
    from pyspark.sql import functions as F

    from bigdatabowl_spark.plans.advanced import _FEATURES
    from bigdatabowl_spark.plans.catalog import t

    orders = t(spark, sf_dir, "orders")
    bad = orders.select(
        [
            F.sum(
                (F.expr(e).isNull() | F.isnan(F.expr(e).cast("double")))
                .cast("long")
            ).alias(f"f{i}")
            for i, (e, _) in enumerate(_FEATURES)
        ]
    ).collect()[0]
    assert all(v == 0 for v in bad), bad.asDict()


def test_pagerank_converge_early_exits(spark, sf_dir):
    """The ε-stopping rule must actually FIRE before the round cap on the
    fixture graph (measured: 4 rounds at sf0.001, 5 at sf0.01) — otherwise
    the 'converge-until-delta' query silently degrades into pagerank_fixed
    with extra aggregations."""
    from bigdatabowl_spark.plans.catalog import CATALOG
    from bigdatabowl_spark.plans.round7 import PR_MAX_ROUNDS

    rows = CATALOG["pagerank_converge"].builder(spark, sf_dir).collect()
    assert rows
    rounds = {r.rounds_used for r in rows}
    assert len(rounds) == 1
    assert 1 <= rows[0].rounds_used < PR_MAX_ROUNDS, rows[0].rounds_used


def test_resume_filter_large_done_list_broadcasts(spark, tmp_path, monkeypatch):
    """Past _RESUME_ISIN_MAX the resume drop must plan as a BROADCAST left
    anti join — a shuffled anti join on the done-list would move the whole
    remaining fact table for a dimension-sized exclusion list (the 10^5-
    partition backfill case resume_filter's threshold exists for)."""
    import bigdatabowl_spark.sources.io as io_mod

    df = spark.createDataFrame(
        [(f"p{i}", i) for i in range(8)], "k string, v int"
    )
    out = str(tmp_path / "sink")
    io_mod.write_partitioned(df.filter("v < 4"), out, ["k"])
    monkeypatch.setattr(io_mod, "_RESUME_ISIN_MAX", 1)
    plan = _plan(io_mod.resume_filter(df, spark, out, "k"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_ngram_pairs_bucket_expand_no_self_join(spark, sf_dir):
    """r12: the exact-Jaccard pair generator must be bucket-and-expand —
    one groupBy on the shingle key + array-side pair fan-out — never a
    shingle self-join (which shuffles the exploded table twice and replays
    the scan per side). Sizes are map-side: no extra exploded-table agg."""
    plan = _catalog_plan(spark, sf_dir, "ngram_jaccard_pairs")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    # pair-path explode + pair fan-out explode only — the sizes branch
    # computes counts from the array without exploding
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 2, plan


def test_prefix_filter_single_pass_base(spark, sf_dir):
    """r12: prefix_filter_jaccard builds every per-doc aggregate (token
    set, size, frequency prefix) in one pass and materializes it — the
    plan must replay from the checkpoint (zero parquet re-scans) and must
    not contain the old row_number window."""
    plan = _catalog_plan(spark, sf_dir, "prefix_filter_jaccard")
    assert "Scan parquet" not in plan, plan
    assert "Window" not in plan, plan


def test_simhash_single_exchange(spark, sf_dir):
    """r12: simhash's per-doc bit-sum aggregation must be the plan's ONLY
    exchange — token dedup happens map-side (array_distinct in the scan
    projection), not as a global distinct."""
    plan = _catalog_plan(spark, sf_dir, "simhash_docs")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
