"""Unit tests for the data-pipeline operator library on tiny inline data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdatabowl_spark.operators import dedup, similarity
from bigdatabowl_spark.operators.text import bpe_token_count, fingerprint


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "ab"),  # too short for 3-shingles
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_exact_dup_groups(docs):
    groups = dedup.exact_dup_groups(docs).filter(F.col("n_docs") > 1).collect()
    assert len(groups) == 1
    assert groups[0].keep_doc_id == 1 and groups[0].max_doc_id == 2


def test_shingles_short_doc_empty(docs):
    sh = dedup.shingle_table(docs)
    assert sh.filter(F.col("doc_id") == 5).count() == 0
    assert sh.filter(F.col("doc_id") == 1).count() == 7  # 9 tokens → 7 shingles

def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.doc1, r.doc2): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert pairs[(1, 2)] == 1.0  # identical
    assert 0.1 <= pairs[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_minhash_identical_signatures(docs):
    sigs = {r.doc_id: tuple(r[f"sig_{i}"] for i in range(8)) for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_lsh_candidates_include_exact_dup(docs):
    cands = {(r.doc1, r.doc2): r.n_shared_bands for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert cands[(1, 2)] == 4  # all bands collide for identical docs


def test_simhash_near_dup_closer_than_distinct(docs):
    sims = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sims[1] == sims[2]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sims[1], sims[3]) <= ham(sims[1], sims[4])


def test_cosine_topk_self_similarity(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb, query_ids_max=1, k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert rows[0].neighbor_id == 1  # nearly parallel
    assert rows[-1].neighbor_id == 3  # anti-parallel last


def test_bpe_and_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "hello world 42!")], "doc_id long, text string")
    r1 = df.select(bpe_token_count(F.col("text")).alias("n"), fingerprint(F.col("text")).alias("fp")).first()
    r2 = df.select(bpe_token_count(F.col("text")).alias("n"), fingerprint(F.col("text")).alias("fp")).first()
    assert r1.n == 4  # hello / world / 42 / !
    assert r1.fp == r2.fp


def test_lsh_near_dups_subset_of_exact(spark, sf_dir):
    """Bucketed near-dup candidates are a subset of the exact all-pairs
    result (LSH trades recall, never precision)."""
    from bigdatabowl_spark.operators.similarity import (
        cosine_near_dups,
        lsh_cosine_near_dups,
    )
    from bigdatabowl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.drop_id, r.canonical_id)
        for r in cosine_near_dups(emb, threshold=0.3).collect()
    }
    bucketed = lsh_cosine_near_dups(emb, spark, threshold=0.3).collect()
    assert bucketed, "bucketed near-dup found nothing at sf0.001"
    exact_drops = {d for d, _ in exact}
    for r in bucketed:
        assert r.drop_id in exact_drops


def test_ivf_topk_subset_of_brute_force(spark, sf_dir):
    """IVF results must be a subset of the brute-force pair space with
    identical cosines (ANN trades recall, never correctness of returned
    scores), and per-query ranks must be contiguous from 1."""
    from bigdatabowl_spark.operators.similarity import cosine_topk, ivf_topk
    from bigdatabowl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, query_ids_max=20, k=10**6).collect()
    }
    ivf = ivf_topk(emb, k=5, n_centroids=16, nprobe=2, query_ids_max=20).collect()
    assert ivf, "IVF returned nothing at sf0.001"
    by_query: dict = {}
    for r in ivf:
        key = (r.query_id, r.neighbor_id)
        assert key in brute and brute[key] == r.cosine, key
        by_query.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_approx_sketches_close_to_exact(spark, sf_dir):
    """approx_count_distinct / percentile_approx (the 100 TB sketch path)
    must land within 5% of the exact aggregates."""
    import pyspark.sql.functions as F

    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG, t

    from bigdatabowl_spark.plans.relational import a7b_approx_sketches

    approx = {
        r.l_returnflag: r
        for r in a7b_approx_sketches(spark, sf_dir).collect()
    }
    li = t(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.approx_orders - e.n_orders) <= 0.05 * e.n_orders, flag
        assert abs(a.price_p50 - e.p50) <= 0.05 * e.p50, flag
        assert abs(a.price_p95 - e.p95) <= 0.05 * e.p95, flag


def test_connected_components_known_graph(spark):
    """Hash-min label propagation resolves a chain, a triangle, and an
    isolated pair into the right components (min id wins)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                   # pair
        "doc1 long, doc2 long",
    )
    comp = {r.node: r.comp for r in dedup.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain(spark):
    """Adversarial long-diameter graph: a 60-node path. Hash-min alone
    needs ~diameter rounds; the star phase (Kiveris et al. 2014) must take
    over after star_after rounds and still resolve every node to comp=0 —
    well inside max_iter (O(log n) star rounds)."""
    n = 60
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc1 long, doc2 long"
    )
    comp = {
        r.node: r.comp
        for r in dedup.connected_components(edges, star_after=3, max_iter=15).collect()
    }
    assert comp == {i: 0 for i in range(n)}


def test_connected_components_star_phase_multi_component(spark):
    """Star phase keeps components separate: two long chains + a clique."""
    chain1 = [(i, i + 1) for i in range(0, 19)]          # comp 0: 0..19
    chain2 = [(i, i + 1) for i in range(100, 119)]       # comp 100: 100..119
    clique = [(a, b) for a in range(200, 204) for b in range(a + 1, 204)]
    edges = spark.createDataFrame(chain1 + chain2 + clique, "doc1 long, doc2 long")
    comp = {
        r.node: r.comp
        for r in dedup.connected_components(edges, star_after=2, max_iter=15).collect()
    }
    want = {i: 0 for i in range(20)}
    want.update({i: 100 for i in range(100, 120)})
    want.update({i: 200 for i in range(200, 204)})
    assert comp == want


def test_dup_clusters_end_to_end(spark, sf_dir):
    """Cluster resolution: every doc in exactly one cluster, cluster_id is
    the min member (canonical), sizes consistent, and members of a cluster
    are pairwise-reachable in the LSH candidate graph."""
    from bigdatabowl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = dedup.dup_clusters(docs).collect()
    assert rows, "no LSH clusters at sf0.001"
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert cid == ids[0]
        assert all(m.cluster_size == len(members) for m in members)
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].doc_id == cid


def test_apply_dedup_partition(spark, sf_dir):
    """Kept ∪ dropped = corpus; every canonical cluster member is kept;
    every non-canonical member is dropped."""
    from bigdatabowl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    kept = {r.doc_id for r in dedup.apply_dedup(docs).collect()}
    assert kept <= all_ids and kept
    clusters = dedup.dup_clusters(docs).collect()
    for r in clusters:
        if r.is_canonical:
            assert r.doc_id in kept, r
        else:
            assert r.doc_id not in kept, r


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_connected_components_matches_union_find(spark):
    """Property: hash-min label propagation agrees with a sequential
    union-find on random graphs (hypothesis-generated edge lists)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=40,
        )
    )
    def check(edges):
        df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "doc1 long, doc2 long"
        )
        got = {r.node: r.comp for r in dedup.connected_components(df).collect()}
        want = _union_find_components(edges)
        # union-find roots are already the min id per component (min wins on
        # every union), so the labelings must be identical
        assert got == want

    check()


def test_asof_join_semantics(spark):
    """As-of: latest right row with ts <= left ts per key; equal-ts right
    row matches; no right row → nulls; right rows never duplicate lefts."""
    from bigdatabowl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p2"), (2, 10, "p3"), (3, 5, "p4")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 40, 4.0), (1, 100, 10.0), (1, 120, 12.0), (2, 10, 2.0)],
        "k long, rts long, v double",
    )
    out = {
        (r.k, r.ts): (r.rts_asof, r.v_asof)
        for r in asof_join(left, right, "k", "ts", "rts", ["rts", "v"]).collect()
    }
    assert out == {
        (1, 100): (100, 10.0),  # equal-ts match wins over the earlier 40
        (1, 50): (40, 4.0),
        (2, 10): (10, 2.0),     # equal-ts match
        (3, 5): (None, None),   # no right rows for key 3
    }


def test_asof_join_matches_brute_force(spark):
    """Property: union+window as-of equals the brute-force 'max right ts
    <= left ts per key' lookup on random inputs."""
    from hypothesis import given, settings, strategies as st

    from bigdatabowl_spark.operators.asof import asof_join

    @settings(max_examples=8, deadline=None)
    @given(
        lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                       min_size=1, max_size=12),
        rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                        min_size=0, max_size=12, unique=True),
    )
    def check(lefts, rights):
        # unique (key, ts) on the right — ties between right rows at the
        # same instant are tiebreak-undefined in any asof formulation
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, ts long, lid long"
        )
        rdf = spark.createDataFrame(
            [(k, t, float(k * 1000 + t)) for k, t in rights], "k long, rts long, v double"
        )
        got = {
            r.lid: (r.rts_asof, r.v_asof)
            for r in asof_join(ldf, rdf, "k", "ts", "rts", ["rts", "v"]).collect()
        }
        for i, (k, t) in enumerate(lefts):
            cand = [(rk, rt) for rk, rt in rights if rk == k and rt <= t]
            if cand:
                bt = max(rt for _, rt in cand)
                assert got[i] == (bt, float(k * 1000 + bt)), (i, k, t)
            else:
                assert got[i] == (None, None), (i, k, t)

    check()
