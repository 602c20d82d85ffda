"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Per-query time = plan build + execution
to a count/collect (results are small aggregates by design).
"""

from __future__ import annotations

import json
import os
import re
import time

BENCH_QUERIES = [
    "a1_pricing_summary",
    "a12_two_level_agg",
    "j1_broadcast_enrich",
    "j13_range_join",
    "w1_lag_gaps",
    "w3_rolling_mean",
    "w4_topk_per_group",
    "a16_corr_moments",
    "a18_histogram_2d",
    "a25_cumulative",
    "dedup_exact",
    "text_tokens_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_docs",
    "embed_knn_brute",
    "embed_lsh_buckets",
    "multimodal_decode",
    "stream_tumbling_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from bigdatabowl_spark.session import get_spark
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    spark = get_spark("bdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once
    CATALOG["a1_pricing_summary"].builder(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = CATALOG.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
