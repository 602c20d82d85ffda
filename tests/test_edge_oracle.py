"""Adversarial edge-case oracle runs: crafted event data the synthetic
testdata may never produce — same-timestamp ties, events exactly on grid
boundaries, single-event series, out-of-order funnels — run through BOTH
engines with the standard harness, so the tie-break and NULL-ordering
semantics the window queries document are pinned by execution, not prose.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import run_all

HOUR_US = 3_600_000_000
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)  # aligned exactly on an hour boundary


def _ts(us: int) -> dt.datetime:
    return T0 + dt.timedelta(microseconds=us)


EDGE_EVENTS = [
    # user 0: duplicate timestamps (distinct event_ids, different values)
    # straddling an exact-hour grid point, plus an event ON the boundary
    (0, 0, _ts(30 * 60_000_000), "view", 10.0),
    (1, 0, _ts(30 * 60_000_000), "click", 20.0),  # same ts as event 0
    (2, 0, _ts(HOUR_US), "purchase", 30.0),  # exactly on the 1 h grid line
    (3, 0, _ts(HOUR_US + 45 * 60_000_000), "view", 40.0),
    # user 1: single event — grid start > grid end, series must vanish
    (4, 1, _ts(7 * 60_000_000), "view", 5.0),
    # user 2: out-of-order funnel — purchase, then click, then view:
    # stage must be 1 (view only), not 3
    (5, 2, _ts(1 * 60_000_000), "purchase", 1.0),
    (6, 2, _ts(2 * 60_000_000), "click", 2.0),
    (7, 2, _ts(3 * 60_000_000), "view", 3.0),
    # user 3: proper funnel with a decoy click BEFORE the first view
    (8, 3, _ts(1 * 60_000_000), "click", 1.0),
    (9, 3, _ts(2 * 60_000_000), "view", 2.0),
    (10, 3, _ts(2 * 60_000_000 + 1), "click", 3.0),  # 1 µs after the view
    (11, 3, _ts(3 * 60_000_000), "purchase", 4.0),
    # user 4: span exactly two hours, endpoints on the boundary —
    # first grid point interpolates, last holds (nt IS NULL branch)
    (12, 4, _ts(0), "view", 0.0),
    (13, 4, _ts(2 * HOUR_US), "view", 100.0),
]

EDGE_QUERIES = [
    "resample_interpolate",
    "funnel_steps",
    "j15_asof_join",
    "w1_lag_gaps",
    "a25_cumulative",
    "w8_zscore_anomaly",
    # round-4: tie/boundary-sensitive event-sequence operators
    "scd2_history",
    "sessionize_batch",
    "markov_transitions",
    "time_range_rolling",
    "time_weighted_avg",
    "cohort_retention",
    "stream_foreach_merge",
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    """A tmp sf-dir: crafted events.parquet + symlinks to the sf0.001
    parquet for every other table (the harness registers views for all)."""
    d = tmp_path_factory.mktemp("edge_sf")
    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name != "events.parquet":
            os.symlink(os.path.join(src, name), os.path.join(d, name))
    ids, users, tss, types, values = zip(*EDGE_EVENTS)
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(list(tss), pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(ids), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return str(d)


def test_edge_cases_match_oracle(spark, edge_sf_dir):
    """Every edge-sensitive window query hash-matches its oracle on the
    crafted collisions — ties, boundary hits, and vanishing series resolve
    identically in both engines."""
    results = run_all(spark, edge_sf_dir, names=EDGE_QUERIES)
    assert set(results) == set(EDGE_QUERIES)
    failures = {n: p for n, p in results.items() if p}
    assert not failures, failures


def test_edge_funnel_semantics(spark, edge_sf_dir):
    """Pin the documented funnel ordering rules on the crafted rows."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    rows = {
        r["user_id"]: r
        for r in CATALOG["funnel_steps"].builder(spark, edge_sf_dir).collect()
    }
    # out-of-order user: only the view counts
    assert rows[2]["stage"] == 1 and rows[2]["t_click"] is None
    # decoy click before the first view is ignored; the +1 µs click counts
    assert rows[3]["stage"] == 3
    assert rows[3]["t_click"] == rows[3]["t_view"] + 1
    # same-timestamp click as user 0's first view is NOT strictly after it
    assert rows[0]["t_click"] is None


def test_edge_resample_semantics(spark, edge_sf_dir):
    """Pin grid-boundary and endpoint-hold behavior on the crafted rows."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    out = CATALOG["resample_interpolate"].builder(spark, edge_sf_dir).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1 (single event): grid start > end → no rows
    assert 1 not in by_user
    # user 4: grid points at 0 h, 1 h, 2 h; endpoints sit ON events
    u4 = sorted(by_user[4], key=lambda r: r["grid_us"])
    assert [r["v_interp"] for r in u4] == [0.0, 50.0, 100.0]
    # user 0: the 1 h grid point coincides with event 2 → its exact value
    # survives (an event AT a grid point is its own "previous" observation)
    vals = sorted(r["v_interp"] for r in by_user[0])
    assert 30.0 in vals


EDGE_DOCS = [
    # (doc_id, text, lang, source)  — doc_id % 5 == 0 → "new batch" in DD9
    # batch doc 0: exact twin of existing doc 1 (normalized: case/punct differ)
    (0, "The quick brown fox jumps over the lazy dog", "en", "srcA"),
    (1, "the QUICK brown fox, jumps over the lazy dog!", "en", "srcA"),
    # batch doc 5: fully contained in existing doc 2 (prefix)
    (5, "alpha beta gamma delta epsilon", "en", "srcA"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "srcA"),
    # batch doc 10: sub-shingle-length (2 tokens) — no shingles, no exact twin
    (10, "tiny doc", "en", "srcB"),
    # existing doc 3: sub-shingle-length exact twin of batch doc 15
    (3, "wee text", "en", "srcB"),
    (15, "wee text", "en", "srcB"),
    # batch doc 20: genuinely novel
    (20, "completely novel content about spark engines and parquet files", "en", "srcB"),
    # existing doc 4: overlaps doc 20 below the 0.8 containment bar
    (4, "completely novel content about duckdb oracles and arrow buffers", "en", "srcB"),
]


@pytest.fixture(scope="module")
def edge_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_docs")
    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name != "documents.parquet":
            os.symlink(os.path.join(src, name), os.path.join(d, name))
    ids, texts, langs, sources = zip(*EDGE_DOCS)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return str(d)


DOC_EDGE_QUERIES = [
    "dedup_incremental",
    "dedup_exact",
    "containment_pairs",
    "pii_redact",
    "rollup_hierarchy",
    "ntile_stratify",
    # round-4: sub-shingle docs, dup spans, tiny-corpus sketch/drift
    "repeated_ngram_spans",
    "dup_span_coverage",
    "kmv_distinct_sketch",
    "oov_rate",
    "psi_drift",
    "simhash_hamming_pairs",
    "prefix_filter_jaccard",
]


def test_doc_edge_cases_match_oracle(spark, edge_docs_dir):
    """Sub-shingle-length docs, cross-batch exact twins, and containment
    boundary cases resolve identically in both engines."""
    results = run_all(spark, edge_docs_dir, names=DOC_EDGE_QUERIES)
    assert set(results) == set(DOC_EDGE_QUERIES)
    failures = {n: p for n, p in results.items() if p}
    assert not failures, failures


def test_doc_edge_incremental_semantics(spark, edge_docs_dir):
    """Pin the documented DD9 decisions on the crafted corpus."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    rows = {
        r["doc_id"]: r
        for r in CATALOG["dedup_incremental"].builder(spark, edge_docs_dir).collect()
    }
    assert set(rows) == {0, 5, 10, 15, 20}  # exactly the batch docs
    assert rows[0]["decision"] == "exact"  # normalization catches case/punct
    assert rows[5]["decision"] == "near_dup" and rows[5]["containment"] == 1.0
    # sub-shingle docs are invisible to MinHash/containment but the exact
    # hash stage still catches their twins — the DD1-alongside-LSH rationale
    assert rows[10]["decision"] == "keep"
    assert rows[15]["decision"] == "exact"
    assert rows[20]["decision"] == "keep" and rows[20]["containment"] < 0.8


def test_edge_scd2_and_session_semantics(spark, edge_sf_dir):
    """Pin SCD2 change-compaction and the 30-minute session-gap boundary on
    the crafted rows (a gap of EXACTLY 30 min does not split a session)."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    hist = [
        r
        for r in CATALOG["scd2_history"].builder(spark, edge_sf_dir).collect()
        if r["user_id"] == 0
    ]
    hist.sort(key=lambda r: r["valid_from_us"])
    # same-ts tie broken by event_id: view(id0) then click(id1) — every
    # event changes type, so 4 intervals, chained, last one current
    assert [r["event_type"] for r in hist] == ["view", "click", "purchase", "view"]
    assert [r["is_current"] for r in hist] == [0, 0, 0, 1]
    assert hist[0]["valid_to_us"] == hist[1]["valid_from_us"]
    assert hist[-1]["valid_to_us"] is None

    sess = [
        r
        for r in CATALOG["sessionize_batch"].builder(spark, edge_sf_dir).collect()
        if r["user_id"] == 0
    ]
    sess.sort(key=lambda r: r["session_no"])
    # gaps: 0 µs (tie), exactly 30 min (NOT > gap → same session), 45 min
    # (> gap → new session): sessions of 3 events and 1 event
    assert [r["n_events"] for r in sess] == [3, 1]


def test_edge_time_weighted_semantics(spark, edge_sf_dir):
    """Zero-duration tie rows carry zero weight; the step integral over
    user 0 is (20*30 + 30*45) / 75 minutes = 26.0 exactly."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    rows = {
        r["user_id"]: r
        for r in CATALOG["time_weighted_avg"].builder(spark, edge_sf_dir).collect()
    }
    assert rows[0]["twa"] == 26.0
    assert rows[0]["span_us"] == 75 * 60_000_000
    # single-event user: zero span → filtered out
    assert 1 not in rows

    roll = {
        (r["user_id"], r["event_id"]): r
        for r in CATALOG["time_range_rolling"].builder(spark, edge_sf_dir).collect()
    }
    # at the event exactly 1 h after the first two: RANGE frame includes
    # the boundary (closed interval) → all three events
    assert roll[(0, 2)]["n_1h"] == 3 and roll[(0, 2)]["sum_1h"] == 60.0
    # 45 min later the two 0:30 events have aged out
    assert roll[(0, 3)]["n_1h"] == 2 and roll[(0, 3)]["sum_1h"] == 70.0


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    """Crafted embeddings with KNOWN near-duplicates — the shipped random
    vectors never reach cosine 0.96 inside a cluster, so without this
    fixture semantic_dedup's drop logic would only ever be tested against
    an all-zeros answer."""
    import numpy as np

    d = tmp_path_factory.mktemp("edge_emb")
    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name != "embeddings.parquet":
            os.symlink(os.path.join(src, name), os.path.join(d, name))
    vecs = []
    for i in range(16):  # orthogonal centroids (vec_id < K are the seeds)
        v = np.zeros(64, dtype=np.float32)
        v[i] = 1.0
        vecs.append((i, v))
    dup3 = np.zeros(64, dtype=np.float32); dup3[3] = 0.9
    vecs.append((16, dup3))          # scaled copy of centroid 3 → dropped
    neg3 = np.zeros(64, dtype=np.float32); neg3[3] = -1.0
    vecs.append((17, neg3))          # anti-parallel → NOT similar (dot<0)
    big3 = np.zeros(64, dtype=np.float32); big3[3] = 2.0
    vecs.append((18, big3))          # another copy of 3 → dropped
    near7 = np.zeros(64, dtype=np.float32); near7[7] = 1.0; near7[40] = 0.1
    vecs.append((19, near7))         # cos ≈ 0.995 with centroid 7 → dropped
    far8 = np.zeros(64, dtype=np.float32); far8[8] = 1.0; far8[41] = 0.6
    vecs.append((20, far8))          # cos ≈ 0.857 with centroid 8 → kept
    table = pa.table(
        {
            "vec_id": pa.array([i for i, _ in vecs], pa.int64()),
            "embedding": pa.array(
                [v.tolist() for _, v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return str(d)


def test_semantic_dedup_drops_known_near_dups(spark, edge_emb_dir):
    """Pin DD12's threshold semantics on crafted vectors: scaled copies and
    a cos≈0.995 neighbor drop; anti-parallel (negative dot) and cos≈0.857
    vectors survive — and the crafted corpus still hash-matches the
    oracle (a non-vacuous cross-engine check of the drop logic)."""
    from tests.oracle_harness import run_all

    failures = {
        n: p for n, p in run_all(spark, edge_emb_dir, names=["semantic_dedup"]).items() if p
    }
    assert not failures, failures

    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    rows = {
        r["vec_id"]: r
        for r in CATALOG["semantic_dedup"].builder(spark, edge_emb_dir).collect()
    }
    assert {v for v, r in rows.items() if r["dropped"] == 1} == {16, 18, 19}
    assert rows[17]["dropped"] == 0 and rows[20]["dropped"] == 0
    assert rows[16]["cid"] == 3 and rows[18]["cid"] == 3


@pytest.fixture(scope="module")
def edge_graph_dir(tmp_path_factory):
    """Crafted lineitem forming a KNOWN co-purchase graph:
    orders 1:{10,20,30}, 2:{20,30,40}, 3:{10,30} → edges
    {10-20,10-30,20-30,20-40,30-40}, exactly 2 triangles
    ({10,20,30},{20,30,40}) and 8 wedges → clustering 6/8 = 0.75.
    A duplicate (order,part) line pins the DISTINCT edge build."""
    d = tmp_path_factory.mktemp("edge_graph")
    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name != "lineitem.parquet":
            os.symlink(os.path.join(src, name), os.path.join(d, name))
    lines = [
        (1, 10), (1, 20), (1, 30),
        (2, 20), (2, 30), (2, 40),
        (3, 10), (3, 30),
        (3, 10),  # duplicate (order, part) — must not duplicate the edge
    ]
    n = len(lines)
    table = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in lines], pa.int64()),
            "l_partkey": pa.array([p for _, p in lines], pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([10.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
        }
    )
    pq.write_table(table, os.path.join(d, "lineitem.parquet"))
    return str(d)


def test_edge_graph_semantics(spark, edge_graph_dir):
    """Pin GR1/GR2 on the hand-computable graph: exact triangle and wedge
    counts, the 0.75 clustering coefficient, rank mass conservation — and
    both queries still hash-match their oracles on the crafted graph."""
    failures = {
        n: p
        for n, p in run_all(
            spark, edge_graph_dir, names=["triangle_count", "pagerank_fixed"]
        ).items()
        if p
    }
    assert not failures, failures

    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    tri = CATALOG["triangle_count"].builder(spark, edge_graph_dir).collect()[0]
    assert tri["n_edges"] == 5
    assert tri["n_nodes"] == 4
    assert tri["n_triangles"] == 2
    assert tri["n_wedges"] == 8
    assert tri["clustering_coeff"] == 0.75

    ranks = CATALOG["pagerank_fixed"].builder(spark, edge_graph_dir).collect()
    assert len(ranks) == 4
    # damping conserves scaled mass approximately: every rank stays within
    # the (150000, 850000 + 850000) envelope and the two degree-3 hubs
    # (20, 30) outrank the degree-2 leaves (10, 40)
    by_node = {r["node"]: r["rank_ppm"] for r in ranks}
    assert min(by_node.values()) >= 150000
    assert by_node[20] > by_node[10] and by_node[30] > by_node[40]
    # symmetric roles: {20,30} tie and {10,40} tie on this graph
    assert by_node[20] == by_node[30] and by_node[10] == by_node[40]


def test_edge_emb_sketch_family_matches_oracle(spark, edge_emb_dir):
    """The crafted near-dup embeddings also exercise the quantization
    family: PQ codes, lattice k-means, and brute cosine top-k all
    hash-match their oracles on vectors with exact-zero components and
    scaled copies (degenerate norms the random corpus never produces)."""
    failures = {
        n: p
        for n, p in run_all(
            spark, edge_emb_dir, names=["pq_codes", "kmeans_lloyd", "embed_knn_brute"]
        ).items()
        if p
    }
    assert not failures, failures


@pytest.fixture(scope="module")
def edge_cust_dir(tmp_path_factory):
    """Crafted customers pinning ER1's block and proximity boundaries:
    same block with |diff| exactly 1000 cents (inclusive), 1001 cents
    (exclusive), and an identical-balance pair split across blocks."""
    d = tmp_path_factory.mktemp("edge_cust")
    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name != "customer.parquet":
            os.symlink(os.path.join(src, name), os.path.join(d, name))
    rows = [
        # block (1, AUTO): boundary pairs
        (0, "c0", 1, 100.00, "AUTO"),
        (1, "c1", 1, 110.00, "AUTO"),   # diff exactly 1000 cents → pair
        (2, "c2", 1, 120.01, "AUTO"),   # diff to c1 = 1001 cents → no pair
        # same balances, different blocks → never a pair
        (3, "c3", 2, 100.00, "AUTO"),
        (4, "c4", 1, 100.00, "BUILDING"),
    ]
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "customer.parquet"))
    return str(d)


def test_edge_blocking_boundary_semantics(spark, edge_cust_dir):
    """Pin ER1's inclusive $10 boundary and block isolation on crafted
    customers, with the oracle agreeing on the crafted rows."""
    failures = {
        n: p
        for n, p in run_all(spark, edge_cust_dir, names=["blocking_pairs"]).items()
        if p
    }
    assert not failures, failures

    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    pairs = {
        (r["cust1"], r["cust2"]): r["diff_cents"]
        for r in CATALOG["blocking_pairs"].builder(spark, edge_cust_dir).collect()
    }
    assert pairs == {(0, 1): 1000}  # inclusive boundary in, 1001 out,
    #                                 cross-block identical balances out
