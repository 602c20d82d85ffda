"""Dump `.explain("formatted")` for catalog queries into a directory.

Round-12 measurement tooling (guide §1/§7.2): capture the physical plan of
every (or a named subset of) catalog queries so before/after plan diffs are
committed evidence, not claims. Kernel-chain / streaming queries that
execute side effects at build time are skipped with a marker file — their
"plan" would be the staged-parquet read-back, not the work.

Run: PYTHONPATH=. python scripts/dump_plans.py <out_dir> [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.plan_report import plan_text  # noqa: E402

# queries whose builder executes side effects (kernel staging, streaming
# sinks) — same set plan_report.py documents
SKIP = {
    "stream_dedup", "stream_interval_join", "stream_stateful_totals",
    "m6_optimize_defense", "eppa_field_surface", "eppa_pass_summary",
    "eppa_player_stats", "m2_value_model_width", "a20b_gamma_mle_fit",
    "analytics_player_rankings", "analytics_throw_calibration",
    "m5_tuning_dataset", "s13_error_channel", "s4_prior_artifact_lifecycle",
    "s1_csv_roundtrip", "s10_partitioned_resume", "s15_rollup_reuse",
    "stream_static_enrich", "stream_foreach_merge", "stream_npy_artifacts",
    "stream_eppa_kernel", "stream_jsonl_documents", "s20_jsonl_roundtrip",
    "stream_tumbling_counts_stream", "stream_sliding_counts",
    "stream_session_windows", "stream_stateful_totals_eventtime",
    "stream_stateful_totals_eventtime_multibatch", "stream_stateful_totals_tws",
    "multimodal_error_channel",
}


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    names = sys.argv[3:]

    from bigdatabowl_spark.session import get_spark
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    targets = names or sorted(CATALOG)
    for name in targets:
        q = CATALOG.get(name)
        if q is None:
            print(f"[dump_plans] unknown query: {name}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}.txt")
        if name in SKIP and not names:
            continue
        try:
            txt = plan_text(q.builder(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {e}\n"
        with open(path, "w") as f:
            f.write(txt)
        print(f"[dump_plans] {name} -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
