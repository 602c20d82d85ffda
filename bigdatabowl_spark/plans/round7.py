"""Round-7 queries: iterative-fixpoint PageRank (converge-until-ε).

VERDICT r6 item 7: pagerank_fixed/bucketed run a FIXED number of
supersteps; real iterative graph jobs run until a convergence test passes.
`pagerank_converge` is that pattern as a first-class catalog entry: a
driver loop over the scale-safe bucketed superstep (shuffle-hash rank
join + dst partial-agg, zero broadcast — plans/round4.py pagerank_bucketed)
with an integer L1-delta stopping rule, `delta < EPS_PPM · |nodes|`,
capped at MAX_ROUNDS. The only driver-side values are one scalar delta per
round — the bounded-collect iterative-fixpoint shape (the same contract as
kmeans_lloyd's driver loop).

Cross-engine exactness: ranks are integer parts-per-million with BIGINT
floor division (round4._pagerank_iter_sql), so every superstep and every
L1 delta is order-independent and bit-equal across engines. The DuckDB
twin cannot loop, so it UNROLLS MAX_ROUNDS iterations, computes all six
deltas, picks `rounds_used = min round with delta < ε` (else MAX_ROUNDS),
and selects that round's ranks — the same stopping rule evaluated
non-iteratively. Both engines cap identically, so they agree even on a
graph that never converges within the cap.

Measured on the co-purchase fixture (ε = 100 ppm/node): sf0.001 converges
in 4 rounds, sf0.01 in 5; the integer iteration has a ~5-20 ppm/node noise
floor (rank quantization), which is why ε is per-node relative, not zero.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.plans.catalog import register
from bigdatabowl_spark.plans.round4 import _EDGE_SQL, _pagerank_iter_sql

PR_EPS_PPM = 100  # converged when L1 delta < EPS_PPM * |nodes|
PR_MAX_ROUNDS = 6

# Set by the builder on every run: the stopping rule's decision, readable
# without re-running the iterative query (bench reports it as a headline
# field after its sweep already executed the builder once).
last_rounds_used: int | None = None


def _converge_sql() -> str:
    iters = ",\n    ".join(
        _pagerank_iter_sql(f"r{i}", f"r{i + 1}") for i in range(PR_MAX_ROUNDS)
    )
    deltas = "\n        UNION ALL\n".join(
        f"""        SELECT {i + 1} AS round,
               SUM(ABS(COALESCE(a.rank, 0) - COALESCE(b.rank, 0))) AS delta
        FROM r{i} a FULL JOIN r{i + 1} b USING (node)"""
        for i in range(PR_MAX_ROUNDS)
    )
    allr = "\n        UNION ALL\n".join(
        f"        SELECT {i + 1} AS round, node, rank FROM r{i + 1}"
        for i in range(PR_MAX_ROUNDS)
    )
    return f"""
    WITH e AS ({_EDGE_SQL}),
    sym AS (
        SELECT pa AS src, pb AS dst FROM e
        UNION ALL
        SELECT pb AS src, pa AS dst FROM e
    ),
    degs AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
    graph AS (
        SELECT s.src, s.dst, d.deg AS deg_src
        FROM sym s JOIN degs d ON d.node = s.src
    ),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM degs),
    {iters},
    deltas AS (
{deltas}
    ),
    ru AS (
        SELECT COALESCE(MIN(round), {PR_MAX_ROUNDS}) AS rounds_used
        FROM deltas
        WHERE delta < {PR_EPS_PPM} * (SELECT COUNT(*) FROM degs)
    ),
    allr AS (
{allr}
    )
    SELECT a.node, CAST(a.rank AS BIGINT) AS rank_ppm,
           CAST(ru.rounds_used AS BIGINT) AS rounds_used
    FROM allr a, ru
    WHERE a.round = ru.rounds_used
    ORDER BY a.rank DESC, a.node
    LIMIT 100
    """


@register("pagerank_converge", "GR2,J1,A1,A9,U1,O1", _converge_sql())
def pagerank_converge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Until-converged PageRank: the bucketed no-broadcast superstep in a
    driver loop that stops when the integer L1 rank delta drops under
    ε·|nodes| (or at PR_MAX_ROUNDS). Emits the converged top-100 with the
    `rounds_used` the stopping rule selected — oracle-checked against the
    unrolled DuckDB twin, so the TERMINATION DECISION itself is
    cross-engine certified, not just the final ranks.

    Scale posture: per round, one shuffle-hash rank join + one dst
    aggregation + one full-outer delta aggregation — all O(|edges| or
    |nodes| / cluster); the driver sees exactly one BIGINT per round.
    localCheckpoint between rounds truncates the iterative lineage
    (pagerank_bucketed precedent)."""
    from bigdatabowl_spark.plans.round4 import (
        _pr_graph,
        _pr_superstep,
        superstep_shuffle_conf,
    )

    from bigdatabowl_spark.operators.checkpointing import truncate_lineage

    degs, graph = _pr_graph(spark, sf_dir)
    ranks = truncate_lineage(
        degs.select("node", F.lit(1000000).cast("long").alias("rank"))
    )
    n_nodes = ranks.count()  # one scalar; the ε threshold is per-node relative

    rounds_used = PR_MAX_ROUNDS
    # big graphs: AQE partition coalescing off for the loop — measured
    # ~2x/superstep tax at 100M edges (round4.superstep_shuffle_conf);
    # no-op at sf-catalog node counts
    with superstep_shuffle_conf(spark, n_nodes):
        for rnd in range(1, PR_MAX_ROUNDS + 1):
            # local truncation per round; every K-th round durable when a
            # checkpoint dir is configured (bounded redo window — see
            # operators/checkpointing.py)
            nxt = truncate_lineage(_pr_superstep(graph, ranks), rnd=rnd)
            delta = (
                ranks.select("node", F.col("rank").alias("rank_prev"))
                .join(
                    nxt.select("node", F.col("rank").alias("rank_next")),
                    "node",
                    "full",
                )
                .agg(
                    F.sum(
                        F.abs(
                            F.coalesce(F.col("rank_prev"), F.lit(0))
                            - F.coalesce(F.col("rank_next"), F.lit(0))
                        )
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            ranks = nxt
            if delta is None:  # empty graph: SUM over zero rows — fixed
                delta = 0
            if delta < PR_EPS_PPM * n_nodes:
                rounds_used = rnd
                break

    global last_rounds_used
    last_rounds_used = rounds_used
    return (
        ranks.select(
            "node",
            F.col("rank").cast("long").alias("rank_ppm"),
            F.lit(rounds_used).cast("long").alias("rounds_used"),
        )
        .orderBy(F.col("rank_ppm").desc(), F.col("node").asc())
        .limit(100)
    )
