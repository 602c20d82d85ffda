"""Time individual catalog queries at a given SF with the noop sink.

Round-12 measurement tool (guide §1.4): builds each named query and times
plan-build + execution to the noop sink (computes every column of every
row, discards the result) — min of N runs, jobs labelled per query.

Run: PYTHONPATH=. python scripts/time_queries.py <sf_dir> [-n runs] name ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    runs = 2
    if args and args[0] == "-n":
        args.pop(0)
        runs = int(args.pop(0))
    names = args

    from bigdatabowl_spark.session import get_spark
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("time-queries", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        q = CATALOG[name]
        walls = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.monotonic()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        print(f"{name}: min {min(walls):.3f}s  runs {[round(w, 3) for w in walls]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
