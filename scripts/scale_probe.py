"""10x scale probe for the five heaviest families (VERDICT r7 item 2).

SCALE.md argues the 100 TB posture from sf0.1 plus two at-size synthetic
legs; this probe MEASURES the scaling exponent of each heavy family one
order of magnitude up, so the linearity claim is a number, not prose:

    exponent = log(T_10x / T_1x) / log(10)

~1.0 = linear in input size, <1 = sublinear (fixed overheads amortizing),
>1 = superlinear (the responsible knob is named in SCALE.md). Wall time
is paired with process-tree CPU seconds (bench.py's sampler) so host
contention is attributable; each leg is min-of-2.

Families and their 10x axes:
- eppa_kernel   : 32 plays x 4 frames -> 32 x 40 (same task count, 10x
                  frames/task — isolates per-frame kernel linearity from
                  task-parallelism effects on this 32-core box)
- pagerank      : 1M -> 10M edges (sec per superstep; graph build apart)
- text_encode   : 1M -> 10M docs through bench_text_scale (vocab agg +
                  broadcast-join encode, corpus staged outside the timing)
- prefix_filter : 20k -> 200k synthetic log-uniform docs (ppjoin prefix
                  candidates + verify; the catalog's template-cluster
                  corpus is deliberately pathological, so the probe uses
                  a Zipf-ish corpus — the regime prefix filtering targets)
- dedup_clusters: same corpora through minhash-LSH banding + hash-min
                  label propagation (operators/dedup.py)

Usage: PYTHONPATH=/root/repo python scripts/scale_probe.py
Writes bench_scale_probe_r{N}.json at the repo root (round-stamped like
bench_full_r{N}.json) — commit it; SCALE.md quotes the exponents.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/bdb_scale_probe")


def _timed(fn, runs: int = 2):
    """(min wall, paired cpu, last result) over `runs` executions."""
    from bench import _cpu_delta_sec, _subtree_cpu_sample

    best = best_cpu = None
    res = None
    for _ in range(runs):
        c0 = _subtree_cpu_sample()
        t0 = time.perf_counter()
        res = fn()
        dt = time.perf_counter() - t0
        dc = _cpu_delta_sec(c0, _subtree_cpu_sample())
        if best is None or dt < best:
            best, best_cpu = dt, dc
    return best, best_cpu, res


def _stage_docs(spark, tag: str, n_docs: int, toks_per_doc: int = 40,
                vocab: int = 50_000) -> str:
    """Synthetic log-uniform ('w' || floor(V^u)) corpus staged as a
    documents.parquet dir — Zipf-ish frequencies (hot head, long rare
    tail), fully distributed generation, nothing driver-side.

    Every doc with id % 100 == 5 is a NEAR-DUP TWIN of id-5 (all but the
    last token drawn from the twin's seed), so the similarity-join probes
    have a planted pair population that scales linearly with the corpus
    (Jaccard ≈ 39/41 > 0.9); both twins sit on prefix_filter_jaccard's
    deterministic doc_id % 5 slice by construction."""
    out = os.path.join(PROBE_DIR, tag)
    marker = os.path.join(out, "_STAGED")
    if os.path.exists(marker):
        return out
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.expr(
                f"transform(sequence(1, {toks_per_doc}), j -> concat('w',"
                f" cast(pow({vocab}.0, pmod(hash("
                f" (CASE WHEN id % 100 = 5 AND j < {toks_per_doc}"
                f"       THEN id - 5 ELSE id END) * 37 + j),"
                f" 1000000) / 1000000.0) as bigint)))"
            ),
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    with open(marker, "w") as f:
        f.write(f"{n_docs} {toks_per_doc} {vocab}\n")
    return out


def probe_eppa(spark) -> dict:
    from bench import _synthetic_play
    from bigdatabowl_spark.kernels.eppa import eppa_field_surface

    # warm the per-worker kernel workspaces once (bench_eppa_kernel's note)
    eppa_field_surface(_synthetic_play(spark, 1, 32)).count()
    t1, c1, n1 = _timed(lambda: eppa_field_surface(_synthetic_play(spark, 4, 32)).count())
    t10, c10, n10 = _timed(lambda: eppa_field_surface(_synthetic_play(spark, 40, 32)).count())
    return {"small": {"sec": round(t1, 3), "cpu_sec": round(c1, 3), "rows": n1,
                      "knob": "32 plays x 4 frames"},
            "large": {"sec": round(t10, 3), "cpu_sec": round(c10, 3), "rows": n10,
                      "knob": "32 plays x 40 frames"}}


def probe_pagerank(spark) -> dict:
    from bench import _release_persistent_rdds, bench_pagerank_scale

    _, _, per_step_1 = bench_pagerank_scale(spark, n_edges=1_000_000,
                                            n_nodes=100_000)
    _release_persistent_rdds(spark)
    _, _, per_step_10 = bench_pagerank_scale(spark, n_edges=10_000_000,
                                             n_nodes=1_000_000)
    _release_persistent_rdds(spark)
    out = {"small": {"sec": per_step_1, "knob": "1M edges, sec/superstep"},
           "large": {"sec": per_step_10, "knob": "10M edges, sec/superstep"}}
    # The 1M→10M exponent is latency-bound (~0.3): a 1M-edge superstep is
    # dominated by fixed shuffle round-trips. The optional 100M point
    # (SPARK_GRAFT_PROBE_DEEP=1) shows the data-bound regime — and NAMES
    # THE KNOB: at 32 shuffle partitions the 100M superstep goes
    # superlinear (per-partition hash join outgrows executor memory
    # comfort → spill; measured 37 s/superstep, exponent ~1.26 vs 10M),
    # while at 256 partitions — per-partition bytes held constant, the
    # posture SCALE.md §6 prescribes and a real cluster gets by scaling
    # executors — it returns to linear (20 s, exponent ~0.99).
    if os.environ.get("SPARK_GRAFT_PROBE_DEEP"):
        for parts, label in ((None, "fixed_32_partitions"),
                             (256, "scaled_256_partitions")):
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            if parts:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                _, _, per_step_100 = bench_pagerank_scale(
                    spark, n_edges=100_000_000, n_nodes=10_000_000)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            _release_persistent_rdds(spark)
            ratio = per_step_100 / max(per_step_10, 1e-9)
            out[f"xlarge_{label}"] = {
                "sec": per_step_100,
                "knob": f"100M edges, sec/superstep, {label}",
                "exponent_vs_large": round(math.log(ratio) / math.log(10.0), 3),
            }
    return out


def probe_text(spark) -> dict:
    from bench import bench_text_scale

    e1, _, tps1 = bench_text_scale(spark, n_docs=1_000_000)
    e10, _, tps10 = bench_text_scale(spark, n_docs=10_000_000)
    return {"small": {"sec": e1, "tokens_per_sec": tps1, "knob": "1M docs"},
            "large": {"sec": e10, "tokens_per_sec": tps10, "knob": "10M docs"}}


def _prefix_filter(spark, sf_dir: str) -> int:
    """The catalog prefix_filter_jaccard plan verbatim (its deterministic
    doc_id%5 slice applies identically at both probe sizes, so the 10x
    ratio is unaffected); the probe corpus is Zipf-ish — the regime
    ppjoin's frequency-sorted prefixes target — unlike the deliberately
    pathological template-cluster fixture."""
    from bigdatabowl_spark.plans.catalog import CATALOG

    df = CATALOG["prefix_filter_jaccard"].builder(spark, sf_dir)
    return df.count()


def probe_prefix(spark, d1: str, d10: str) -> dict:
    t1, c1, n1 = _timed(lambda: _prefix_filter(spark, d1))
    t10, c10, n10 = _timed(lambda: _prefix_filter(spark, d10))
    return {"small": {"sec": round(t1, 3), "cpu_sec": round(c1, 3),
                      "pairs": n1, "knob": "20k docs"},
            "large": {"sec": round(t10, 3), "cpu_sec": round(c10, 3),
                      "pairs": n10, "knob": "200k docs"}}


def probe_dedup(spark, d1: str, d10: str) -> dict:
    from bench import _release_persistent_rdds
    from bigdatabowl_spark.plans.catalog import CATALOG

    def run(sf_dir):
        n = CATALOG["dedup_clusters"].builder(spark, sf_dir).count()
        _release_persistent_rdds(spark)  # label-prop checkpoints
        return n

    t1, c1, n1 = _timed(lambda: run(d1))
    t10, c10, n10 = _timed(lambda: run(d10))
    return {"small": {"sec": round(t1, 3), "cpu_sec": round(c1, 3),
                      "rows": n1, "knob": "20k docs"},
            "large": {"sec": round(t10, 3), "cpu_sec": round(c10, 3),
                      "rows": n10, "knob": "200k docs"}}


def main() -> None:
    from bigdatabowl_spark.session import get_spark
    import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG

    spark = get_spark("bdb-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    loads = {"start": round(os.getloadavg()[0], 2)}

    d1 = _stage_docs(spark, "docs_x1", 20_000)
    d10 = _stage_docs(spark, "docs_x10", 200_000)

    # SPARK_GRAFT_PROBE_ONLY=fam1,fam2 re-measures just those families and
    # merges into the existing round artifact (heavy legs run back-to-back
    # contend with each other's shuffle/page-cache cleanup — a solo rerun
    # on an idle box is the honest number for a disputed family)
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    only_set = set(only.split(",")) if only else None

    out: dict = {}
    for fam, fn in [
        ("eppa_kernel", lambda: probe_eppa(spark)),
        ("pagerank_superstep", lambda: probe_pagerank(spark)),
        ("text_encode", lambda: probe_text(spark)),
        ("prefix_filter_jaccard", lambda: probe_prefix(spark, d1, d10)),
        ("dedup_clusters", lambda: probe_dedup(spark, d1, d10)),
    ]:
        if only_set is not None and fam not in only_set:
            continue
        r = fn()
        ratio = r["large"]["sec"] / max(r["small"]["sec"], 1e-9)
        r["ratio_10x"] = round(ratio, 2)
        r["exponent"] = round(math.log(ratio) / math.log(10.0), 3)
        out[fam] = r
        loads[f"after_{fam}"] = round(os.getloadavg()[0], 2)
        print(f"[probe] {fam}: {r['small']['sec']}s -> {r['large']['sec']}s "
              f"(x{r['ratio_10x']}, exponent {r['exponent']})",
              file=sys.stderr, flush=True)

    # round-stamp like bench.py
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        import glob
        import re

        recorded = [int(m.group(1)) for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
                    if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
        rnd = str(max(recorded, default=0) + 1)
    path = os.path.join(ROOT, f"bench_scale_probe_r{int(rnd):02d}.json")
    families = out
    if only_set is not None and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        families = {**prior.get("families", {}), **out}
    payload = {"metric": "scale_probe_10x", "families": families,
               "load_avg": loads, "cpus": os.cpu_count()}
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v["exponent"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
