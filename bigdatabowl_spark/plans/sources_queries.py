"""Source/sink queries (SURVEY §2.1 S1-S13) as oracle-checked round trips.

Each query writes to a scratch sink under /tmp, reads the data back through
the corresponding scan operator, and aggregates — the oracle computes the
same aggregate from the original parquet, so a hash match proves the sink
and scan are lossless. Scratch paths are keyed by scale factor so runs at
different scales don't collide.

Sink/scan pairs exercised:
- s1_csv_roundtrip: schema'd delimited-text sink + scan (S1 header scan,
  S2 Catalyst column pruning, S7 TSV dialect, S9 CSV sink);
- s10_partitioned_resume: partitioned parquet sink with dynamic partition
  overwrite + resume-skip of existing partitions + file provenance
  (S5 artifact re-materialization, S8, S10, S11, S12);
- s13_error_channel: per-group kernel with try/except surfaced as a status
  column and split into ok/error tables (S13).
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from bigdatabowl_spark.functions.scalar import dec_sum
from bigdatabowl_spark.plans.catalog import register, t, dsum
from bigdatabowl_spark.sources.io import (
    read_csv_schema,
    resume_filter,
    split_error_channel,
    with_provenance,
    write_partitioned,
)

_SCRATCH = "/tmp/bigdatabowl_io"


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return f"{_SCRATCH}/{tag}/{name}"


@register(
    "s1_csv_roundtrip",
    "S1,S2,S7,S9,A1",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {dsum('c_acctbal')} AS total_acctbal,
           COUNT(c_name) AS n_named
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str):
    """Delimited-text sink → schema'd scan round trip.

    Reference: pd.read_csv week CSVs (normalize.py:13-15) and the remote
    TSV scan (visualize.py:46-47). The read declares an explicit StructType
    (no inference job) and only the grouped columns survive — Catalyst
    prunes the projection into the text reader (S2/usecols,
    comb_model_big_run_cpu.py:17-20)."""
    c = t(spark, sf_dir, "customer")
    path = _scratch(sf_dir, "customer_tsv")
    c.write.mode("overwrite").option("sep", "\t").option("header", True).csv(path)
    back = read_csv_schema(spark, path, c.schema, sep="\t")
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        dec_sum("c_acctbal").alias("total_acctbal"),
        F.count("c_name").alias("n_named"),
    )


@register(
    "s10_partitioned_resume",
    "S5,S8,S10,S11,S12,A1",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {dsum('o_totalprice')} AS total_price,
           0 AS n_resumed
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def s10_partitioned_resume(spark: SparkSession, sf_dir: str):
    """Partitioned parquet sink + idempotent resume + provenance scan.

    Reference: per-play pickle dirs (play_eppa_cpu.py:670-677) with the
    driver's skip-if-exists resume loop (comb_model_big_run_cpu.py:31-33).
    Here: partitionBy parquet with dynamic partition overwrite; a second
    pass through resume_filter sees every partition materialized and
    contributes 0 rows (n_resumed); the read-back carries file provenance
    (input_file_name, S8). At scale the partition column is the job's
    natural key (gameId) so re-runs touch only missing partitions."""
    o = t(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "orders_by_status")
    write_partitioned(o, path, ["o_orderstatus"])
    remaining = resume_filter(o, spark, path, "o_orderstatus")
    n_resumed = remaining.count()  # all partitions exist → 0
    back = with_provenance(spark.read.parquet(path))
    return (
        back.filter(F.col("source_file").isNotNull())
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_price"),
            F.lit(n_resumed).cast("int").alias("n_resumed"),
        )
    )


_S13_SCHEMA = "user_id long, status string, n long"


def _s13_kernel(it):
    """Partition-batched kernel with an error channel: groups with fewer
    than 3 events 'fail' (stand-in for the reference's per-play exceptions)
    and are caught into status='error' instead of aborting the job.

    One Python invocation per PARTITION, not per group — with thousands of
    tiny groups, per-group applyInPandas overhead (~1.5 ms/call) dominates;
    repartition("user_id") colocates each group's rows and the counts
    accumulate across Arrow batches, so a group straddling batch boundaries
    within the partition is still counted once."""
    from collections import Counter

    counts: Counter = Counter()
    for pdf in it:
        counts.update(pdf["user_id"].value_counts().to_dict())
    uids, statuses, ns = [], [], []
    for uid, n in counts.items():
        try:
            if n < 3:
                raise ValueError("group too small")
            status = "ok"
        except ValueError:
            status = "error"
        uids.append(int(uid))
        statuses.append(status)
        ns.append(int(n))
    yield pd.DataFrame({"user_id": uids, "status": statuses, "n": ns})


@register(
    "s13_error_channel",
    "S13,M8,A7",
    """
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n,
               CASE WHEN COUNT(*) < 3 THEN 'error' ELSE 'ok' END AS status
        FROM events GROUP BY user_id
    )
    SELECT status, COUNT(*) AS n_groups, CAST(SUM(n) AS BIGINT) AS n_rows
    FROM per_user GROUP BY status
    """,
)
def s13_error_channel(spark: SparkSession, sf_dir: str):
    """Error-channel sink: try/except inside the kernel → status column →
    split into ok/errors tables (comb_model_big_run_cpu.py:27-45). No
    driver-side errors.txt; failures stay distributed and queryable."""
    ev = t(spark, sf_dir, "events")
    out = ev.select("user_id").repartition("user_id").mapInPandas(_s13_kernel, _S13_SCHEMA)
    ok, errors = split_error_channel(out)
    census = out.groupBy("status").agg(
        F.count("*").alias("n_groups"), F.sum("n").alias("n_rows")
    )
    return census
