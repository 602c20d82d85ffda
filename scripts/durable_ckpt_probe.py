"""Durable-checkpoint premium probe: one leg per invocation in a fresh
warmed JVM — `python scripts/durable_ckpt_probe.py local|durable` — each
printing one JSON line; pairs are assembled into
durable_ckpt_probe_r{N}.json (SCALE.md 6l quotes it). durable =
checkpoint dir set + spark.bigdatabowl.checkpoint.interval=1, i.e.
EVERY fixpoint round reliable — the worst case."""
import sys, json, shutil
sys.path.insert(0, "/root/repo")
from bench import _warmup_session, _ambient_cpu_frac, bench_pagerank_scale
from bigdatabowl_spark.session import get_spark

mode = sys.argv[1]
ambient = _ambient_cpu_frac()
spark = get_spark(f"bdb-durable-probe-{mode}")
spark.sparkContext.setLogLevel("ERROR")
_warmup_session(spark)
if mode == "durable":
    shutil.rmtree("/tmp/bdb_reliable_ckpt", ignore_errors=True)
    spark.conf.set("spark.bigdatabowl.checkpoint.interval", "1")
    spark.sparkContext.setCheckpointDir("/tmp/bdb_reliable_ckpt")
g_sec, s_sec, per_step, g_cpu, s_cpu = bench_pagerank_scale(
    spark, n_edges=10_000_000, n_nodes=1_000_000)
print(json.dumps({"mode": mode, "graph_build": g_sec, "supersteps": s_sec,
                  "per_step": per_step, "graph_cpu": g_cpu,
                  "steps_cpu": s_cpu, "ambient": ambient}))
