"""Durability posture of lineage truncation (operators/checkpointing).

Default path: with no checkpoint dir configured, `truncate_lineage` IS
`localCheckpoint` — plans and results byte-identical to the
pre-module engine (the local[...] reality every other test runs in).

Opt-in path: with `SparkContext.setCheckpointDir` configured, build
artifacts and every K-th fixpoint round go to the RELIABLE checkpoint
dir, bounding the redo window after an executor loss. That session-wide
switch can't be unset through the public API, so the with-dir leg runs
in its own subprocess JVM and reports results for cross-comparison —
the durable run must produce bit-identical output to the local run.
"""

from __future__ import annotations

import pytest
import json
import os
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

# fixed undirected edge list: two components {1,2,3,4} (clique-ish) and a
# chain {10..15} that needs several propagation rounds, plus a self-loop
EDGES = [
    (1, 2), (2, 3), (3, 4), (1, 4),
    (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
    (20, 20),
]

_WITH_DIR_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .appName("bdb-ckpt-durable")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.bigdatabowl.checkpoint.interval", "1")
    .getOrCreate()
)
ckpt_dir = sys.argv[1]
spark.sparkContext.setCheckpointDir(ckpt_dir)

import bigdatabowl_spark.plans  # populates CATALOG
from bigdatabowl_spark.plans.catalog import query_fns
from bigdatabowl_spark.operators.dedup import connected_components

pr = query_fns()["pagerank_converge"](spark, sys.argv[2]).collect()
edges = spark.createDataFrame(
    json.loads(sys.argv[3]), "doc1 long, doc2 long"
)
cc = connected_components(edges).collect()

# the reliable path must actually have been taken: Spark writes
# rdd-*/part-* files under the configured dir
written = []
for root, _dirs, files in os.walk(ckpt_dir):
    written += [os.path.join(root, f) for f in files]
out = {
    "pagerank": sorted([r.asDict() for r in pr], key=lambda r: r["node"]),
    "cc": sorted([(r["node"], r["comp"]) for r in cc]),
    "n_checkpoint_files": len(written),
}
print("RESULT:" + json.dumps(out))
"""


def test_reliable_round_decision():
    from bigdatabowl_spark.operators.checkpointing import reliable_round

    # no dir -> never reliable, whatever the round
    assert not reliable_round(None, 10, False)
    assert not reliable_round(10, 10, False)
    # dir set: one-shots always durable, loop rounds every K-th
    assert reliable_round(None, 10, True)
    assert not reliable_round(1, 10, True)
    assert not reliable_round(9, 10, True)
    assert reliable_round(10, 10, True)
    assert reliable_round(20, 10, True)
    assert reliable_round(3, 1, True)  # interval=1: every round durable
    assert not reliable_round(3, 0, True)  # degenerate interval: never


def test_no_dir_means_local_checkpoint(spark):
    from bigdatabowl_spark.operators.checkpointing import truncate_lineage

    assert spark.sparkContext.getCheckpointDir() is None, (
        "shared test session must not have a checkpoint dir — "
        "the with-dir leg runs in its own subprocess"
    )
    df = truncate_lineage(spark.range(100).selectExpr("id", "id * 2 AS y"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, plan
    assert df.count() == 100


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_durable_run_bit_identical_to_local(spark, tmp_path):
    """pagerank_converge and connected_components under a reliable
    checkpoint dir (interval=1 — every round durable, the worst case)
    return exactly the rows the localCheckpoint path returns, and the
    reliable path demonstrably wrote checkpoint files."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import query_fns
    from bigdatabowl_spark.operators.dedup import connected_components

    proc = subprocess.run(
        [sys.executable, "-c", _WITH_DIR_SCRIPT,
         str(tmp_path / "ckpt"), SF_DIR, json.dumps(EDGES)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    durable = json.loads(line[0][len("RESULT:"):])
    assert durable["n_checkpoint_files"] > 0, (
        "reliable checkpoint dir stayed empty — the durable path never ran"
    )

    local_pr = sorted(
        (r.asDict() for r in query_fns()["pagerank_converge"](
            spark, SF_DIR).collect()),
        key=lambda r: r["node"],
    )
    assert durable["pagerank"] == local_pr

    edges = spark.createDataFrame(EDGES, "doc1 long, doc2 long")
    local_cc = sorted(
        (r["node"], r["comp"]) for r in connected_components(edges).collect()
    )
    assert [tuple(p) for p in durable["cc"]] == local_cc
    # sanity on the fixture itself: the chain collapses to one component
    comp_of = dict(local_cc)
    assert comp_of[15] == comp_of[10] == 10
    assert comp_of[4] == 1
