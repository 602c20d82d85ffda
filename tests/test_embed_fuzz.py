"""Randomized cross-engine fuzz of the embeddings-only similarity family.

Same harness pattern as tests/test_dedup_fuzz.py, aimed at the 8 catalog
queries whose Spark builder and DuckDB oracle read ONLY the embeddings
table. Seeded corpora are built on the dyadic grid k/256 (float32-exact,
products and 64-term sums exact in double, and the x1000 lattice
quantization's half-way cases land on exact .5 in both engines — both
round half away from zero), so every cross-engine comparison is
bit-deterministic BY CONSTRUCTION and any mismatch is a real semantics
bug, not an ulp.

Corpus shapes the sf embeddings never produce: exact-duplicate vectors
(cosine ties exercising the neighbor-id tiebreak), one-coordinate
near-dups, antipodal pairs (negative cosine), clustered mass with
off-cluster noise, and a zero vector (undefined cosine — both engines
yield NULL via x/0 semantics, pinned in its own test).

embed_knn_brute additionally gets a pure-Python THIRD engine replaying
the exact sequential fold: float→double widening, left-to-right
accumulation, (cosine desc, neighbor_id asc) ranking.
"""

from __future__ import annotations

import math
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import run_all

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


BASE_SF = "/root/testdata/sf0.001"
DIMS = 64

EMBED_QUERIES = [
    "embed_knn_brute",
    "embed_lsh_buckets",
    "embed_ivf_knn",
    "dedup_embed_cosine",
    "semantic_dedup",
    "sim_recall_certify",
    "kmeans_lloyd",
    "pq_codes",
]


def _gen_vectors(seed: int, n: int = 260, with_zero: bool = False) -> list[list[int]]:
    """Integer vectors on the /256 grid: clusters + planted structures."""
    rng = random.Random(seed)
    k = rng.randint(3, 8)
    centers = [[rng.randint(-384, 384) for _ in range(DIMS)] for _ in range(k)]

    def point() -> list[int]:
        c = rng.choice(centers)
        return [v + rng.randint(-48, 48) for v in c]

    vecs = [point() for _ in range(n)]
    # planted structures overwrite random slots OUTSIDE the id<20 query /
    # id<16 centroid panel so the panel stays generic
    slots = rng.sample(range(20, n), 12)
    for i in range(0, 6, 2):  # 3 exact-duplicate pairs
        vecs[slots[i + 1]] = list(vecs[slots[i]])
    for i in range(6, 9):  # 3 one-coordinate near-dups of random docs
        src = list(vecs[rng.randrange(20, n)])
        src[rng.randrange(DIMS)] += 1
        vecs[slots[i]] = src
    for i in range(9, 11):  # 2 antipodal vectors
        vecs[slots[i]] = [-v for v in vecs[rng.randrange(20, n)]]
    if with_zero:
        vecs[slots[11]] = [0] * DIMS
    return vecs


def _write_sf_dir(tmp_path, vecs, seed: int) -> str:
    rng = random.Random(seed + 7)
    n = len(vecs)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[v / 256.0 for v in vec] for vec in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([rng.randrange(10) for _ in range(n)], pa.int32()),
        },
        schema=schema,
    )
    pq.write_table(table, tmp_path / "embeddings.parquet")
    from bigdatabowl_spark.sources.tables import TABLES

    for name in TABLES:
        if name != "embeddings":
            os.symlink(f"{BASE_SF}/{name}.parquet", tmp_path / f"{name}.parquet")
    return str(tmp_path)


def test_fuzz_list_covers_every_embeddings_only_query():
    """Exhaustiveness guard: every catalog oracle reading only the
    embeddings table is in EMBED_QUERIES."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG
    from tests.oracle_harness import oracle_tables

    only_emb = {
        n
        for n, q in CATALOG.items()
        if q.oracle and oracle_tables(q.oracle) == {"embeddings"}
    }
    assert only_emb == set(EMBED_QUERIES)


@pytest.mark.parametrize("seed,with_zero", [(11, False), (22, False), (33, False), (55, True)])
def test_embed_family_fuzz_matches_oracle(spark, tmp_path, seed, with_zero):
    """with_zero plants an all-zero vector: its cosine is NULL in BOTH
    engines (try_divide / DuckDB x-over-0), ranks last under DESC, and
    fails every threshold filter — the semantics similarity.py documents."""
    vecs = _gen_vectors(seed, with_zero=with_zero)
    sf = _write_sf_dir(tmp_path, vecs, seed)
    res = run_all(spark, sf, EMBED_QUERIES)
    assert set(res) == set(EMBED_QUERIES)
    failures = {k: v for k, v in res.items() if v}
    assert not failures, f"seed {seed}: {failures}"


def _py_cosine_topk(vecs: list[list[int]], q_max: int = 20, k: int = 5):
    """Replay of similarity.cosine_topk: float32→double, sequential fold."""
    doubles = [[float(x / 256.0) for x in v] for v in vecs]  # f32-exact grid

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    norms = [math.sqrt(dot(v, v)) for v in doubles]
    out = {}
    for qi in range(min(q_max, len(vecs))):
        scored = [
            (-(dot(doubles[qi], doubles[ci]) / (norms[qi] * norms[ci])), ci)
            for ci in range(len(vecs))
            if ci != qi
        ]
        scored.sort()
        for rank, (negcos, ci) in enumerate(scored[:k], start=1):
            out[(qi, ci)] = (round(-negcos, 8), rank)
    return out


@pytest.mark.parametrize("seed", [44])
def test_embed_knn_matches_pure_python(spark, tmp_path, seed):
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    vecs = _gen_vectors(seed)
    sf = _write_sf_dir(tmp_path, vecs, seed)
    got = {
        (r.query_id, r.neighbor_id): (r.cosine, r.rank)
        for r in CATALOG["embed_knn_brute"].builder(spark, sf).collect()
    }
    assert got == _py_cosine_topk(vecs)
