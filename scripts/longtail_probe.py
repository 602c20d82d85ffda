"""Decompose the relational long tail's ~0.4 s/query fixed cost.

VERDICT r12 item 8: ~140 relational catalog queries x ~0.4 s ~= 56 s of
suite wall. Is that Spark's per-job submission floor, or per-query plan
compile (analyze/optimize/codegen), or real execution? This probe times a
10-query sample in three windows per query, same session and settings as
the bench sweep:

  build_s  - Python-side DataFrame construction (builder call)
  plan_s   - analysis + optimization + physical planning + codegen
             (forced via df.queryExecution().executedPlan(), no job)
  action_s - the bench's own timed action (.count()) on the pre-planned
             df MINUS the planning already paid above is job submit +
             execute

plus two floors measured once: an empty-stage job (spark.range(1).count())
and a 32-partition no-compute job. Writes longtail_probe_r{N}.json.

Usage: python scripts/longtail_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE = [
    "a1_pricing_summary",
    "a12_two_level_agg",
    "j1_broadcast_enrich",
    "j13_range_join",
    "w1_lag_gaps",
    "w4_topk_per_group",
    "a16_corr_moments",
    "p1_conjunctive_lookup",
    "o2_global_topn",
    "f_kinematics",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bigdatabowl_spark.session import get_spark
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    spark = get_spark("bdb-longtail-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as the bench sweep: JVM, parquet footers, Python workers
    CATALOG["a1_pricing_summary"].builder(spark, sf_dir).collect()

    floors = {}
    t0 = time.perf_counter()
    spark.range(1).count()
    floors["single_task_job_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    spark.range(0, 32, 1, 32).count()
    floors["job_32_tasks_s"] = round(time.perf_counter() - t0, 4)

    rows = {}
    for name in SAMPLE:
        q = CATALOG.get(name)
        if q is None:
            continue
        per = {"build_s": [], "plan_s": [], "action_s": []}
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            t1 = time.perf_counter()
            # force the full driver-side compile chain without a job
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            per["build_s"].append(round(t1 - t0, 4))
            per["plan_s"].append(round(t2 - t1, 4))
            per["action_s"].append(round(t3 - t2, 4))
        # min over 3: the bench's own discipline (best of n)
        rows[name] = {k: min(v) for k, v in per.items()}
        rows[name]["runs"] = per
        print(f"[probe] {name}: {rows[name]['build_s']:.3f} build / "
              f"{rows[name]['plan_s']:.3f} plan / "
              f"{rows[name]['action_s']:.3f} action", file=sys.stderr)

    n = len(rows)
    summary = {
        "n_sample": n,
        "mean_build_s": round(sum(r["build_s"] for r in rows.values()) / n, 4),
        "mean_plan_s": round(sum(r["plan_s"] for r in rows.values()) / n, 4),
        "mean_action_s": round(sum(r["action_s"] for r in rows.values()) / n, 4),
    }
    out = {"floors": floors, "summary": summary, "queries": rows,
           "sf_dir": sf_dir}
    path = "longtail_probe_r13.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"floors": floors, "summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
