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
  column and split into ok/error tables (S13);
- s20_jsonl_roundtrip / stream_jsonl_documents: JSONL corpus sink +
  declared-schema scan, batch and streaming (S20 — the LLM-corpus
  interchange format; line-splittable in both directions).
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
    # nullValue=\N: the delimited sink's default writes NULL as an empty
    # field, which the scan cannot tell from an empty STRING — an explicit
    # null token round-trips both (found by tests/test_sources_fuzz.py:
    # COUNT(c_name) dropped empty-string names). Known sentinel collision:
    # a field whose VALUE is the two-character string \N is written
    # unquoted and reads back as NULL — inherent to any in-band null token
    # (pinned by test_sources_fuzz.py::test_csv_null_token_collision);
    # data that can legitimately contain the sentinel belongs in parquet,
    # not delimited text. multiLine on the read
    # side parses the quoted embedded newlines the writer legitimately
    # emits — at the cost of per-file (not per-split) parallelism, which
    # is the standard CSV trade; newline-bearing exports belong in parquet.
    (
        c.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("nullValue", "\\N")
        .csv(path)
    )
    back = read_csv_schema(
        spark, path, c.schema, sep="\t", nullValue="\\N", multiLine=True
    )
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
    # explicit schema: a ZERO-ROW partitioned write materializes no data
    # files, and a schema-less read of the empty layout fails with
    # UNABLE_TO_INFER_SCHEMA (found by tests/test_sources_fuzz.py); the
    # declared schema also pins the partition column to its real type
    # instead of path-string inference
    back = with_provenance(spark.read.schema(o.schema).parquet(path))
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


@register(
    "s14_upsert_merge",
    "S12,J2,U1,P12",
    """
    WITH updates AS (
        SELECT o_orderkey, 'UPDATED' AS o_orderstatus, CAST(1 AS BIGINT) AS version
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 2000000000, 'NEW', CAST(1 AS BIGINT)
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT b.o_orderkey, b.o_orderstatus, CAST(0 AS BIGINT) AS version
    FROM orders b ANTI JOIN updates u ON b.o_orderkey = u.o_orderkey
    UNION ALL
    SELECT o_orderkey, o_orderstatus, version FROM updates
    """,
)
def s14_upsert_merge(spark: SparkSession, sf_dir: str):
    """CDC-style upsert (MERGE) without a table format: updates override
    matching base rows, unmatched updates insert — expressed as
    anti-join(base, updates) ∪ updates, the merge-on-read compaction every
    incremental ingest needs. The delta here is derived deterministically
    from the base (keys ≡ 0 mod 10 update; keys ≡ 0 mod 97 insert at a
    shifted key) so the oracle reproduces it exactly.

    Scale: one shuffle per side on the merge key (or broadcast when the
    delta is small — Catalyst/AQE decides from stats); with both sides
    bucketed on the key the anti join is exchange-free, which is the 100 TB
    layout for a nightly-merge table.
    """
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus", F.lit(0).cast("long").alias("version")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("UPDATED").alias("o_orderstatus"),
            F.lit(1).cast("long").alias("version"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 2_000_000_000).alias("o_orderkey"),
                F.lit("NEW").alias("o_orderstatus"),
                F.lit(1).cast("long").alias("version"),
            )
        )
    )
    merged = base.join(updates, "o_orderkey", "left_anti").unionByName(updates)
    return merged


def _zorder_oracle(bits: int = 8) -> str:
    interleave = " + ".join(
        f"(((a >> {i}) & 1) << {2 * i}) + (((b >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
    WITH keyed AS (
        SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b FROM lineitem
    ),
    z AS (SELECT a, b, ({interleave}) AS zval FROM keyed)
    SELECT zval >> 8 AS zbucket,
           COUNT(*) AS n,
           MIN(a) AS a_min, MAX(a) AS a_max,
           MIN(b) AS b_min, MAX(b) AS b_max
    FROM z GROUP BY zbucket
    """


@register("o6_zorder_layout", "O6,F13,S10,A1", _zorder_oracle())
def o6_zorder_layout(spark: SparkSession, sf_dir: str):
    """Z-order (Morton) clustering key: interleave the bits of two join/filter
    dimensions so sorting by the key co-locates rows that are close in BOTH —
    the multi-dimensional file-clustering trick (Delta OPTIMIZE ZORDER,
    Hudi/Iceberg sort orders) that makes min/max file pruning work for two
    predicates at once. The aggregate proves the property the optimizer
    relies on: every 256-key z-bucket bounds a narrow range of each dimension.

    Scale: the key is pure integer bit arithmetic (codegen'd, map-only);
    at ingest you'd `repartitionByRange(zkey).sortWithinPartitions(zkey)`
    before the parquet sink so each file covers a tight (a, b) rectangle.
    """
    li = t(spark, sf_dir, "lineitem")
    a = (F.col("l_partkey") % 256).cast("long")
    b = (F.col("l_suppkey") % 256).cast("long")
    zval = None
    for i in range(8):
        term = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i) + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        zval = term if zval is None else zval + term
    keyed = li.select(a.alias("a"), b.alias("b"), zval.alias("zval"))
    return keyed.groupBy(F.shiftright(F.col("zval"), 8).alias("zbucket")).agg(
        F.count("*").alias("n"),
        F.min("a").alias("a_min"),
        F.max("a").alias("a_max"),
        F.min("b").alias("b_min"),
        F.max("b").alias("b_max"),
    )


@register(
    "s15_rollup_reuse",
    "S15,S10,A1,ST1",
    """
    SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
    FROM events
    GROUP BY 1, 2
    """,
)
def s15_rollup_reuse(spark: SparkSession, sf_dir: str):
    """Continuous-aggregate / materialized-rollup reuse: persist a 10-minute
    rollup of the event stream once, then answer the 1-hour query FROM THE
    ROLLUP — never rescanning raw events. The oracle aggregates raw events
    directly, so a hash match proves the rollup is losslessly composable
    (decimal partial sums are associative and 10 min divides 1 h exactly —
    the algebraic-aggregate rule that makes hypertable-style rollup
    hierarchies correct).

    Scale: this is the pattern that turns a 100 TB raw scan into a GB-scale
    rollup scan for every coarser-grained dashboard query; refresh cost is
    one partial aggregation of the new raw partitions (idempotent per
    window, same resume story as s10).
    """
    ev = t(spark, sf_dir, "events")
    rollup_path = _scratch(sf_dir, "rollup_10min")
    # partial sums stay DECIMAL in the stored rollup (exact, associative —
    # the property that makes re-aggregation lossless)
    rollup = ev.groupBy(
        F.floor(F.col("ts_us") / F.lit(600_000_000)).cast("long").alias("window_id"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_val"),
    )
    rollup.write.mode("overwrite").parquet(rollup_path)
    stored = spark.read.parquet(rollup_path)
    return stored.groupBy(
        F.floor(F.col("window_id") / F.lit(6)).cast("long").alias("hour_id"),
        "event_type",
    ).agg(
        F.sum("n").alias("n"),
        F.sum("dec_val").cast("double").alias("hour_value"),
    )


def _flag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag (decimal-exact revenue, count) — the shared artifact
    payload of the S16/ST9/S17 round-trip queries."""
    from bigdatabowl_spark.functions.scalar import dec

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        F.count("*").cast("double").alias("n_items"),
    )


def _build_npy_artifacts(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Driver-side artifact build shared by the S16 batch scan and the ST9
    stream scan: one [revenue, n_items] .npy per returnflag in a scratch
    dir (cleared first so reruns are idempotent). Bounded: |groups| tiny
    files — the S4 contract."""
    import numpy as np

    from bigdatabowl_spark.sources.npy_source import stem_encode

    out_dir = _scratch(sf_dir, name)
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".npy"):
            os.remove(os.path.join(out_dir, f))
    # stem_encode: flag values are DATA — '/', '=', '', NULL must each
    # stay one flat filename (the reader decodes the stem back)
    for row in _flag_stats(spark, sf_dir).collect():
        np.save(
            os.path.join(out_dir, f"{stem_encode(row['l_returnflag'])}.npy"),
            np.array([row["revenue"], row["n_items"]], dtype=np.float64),
        )
    return out_dir



@register(
    "s16_npy_datasource",
    "S4,S11,A1",
    """
    SELECT l_returnflag, 0 AS idx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 1 AS idx, CAST(COUNT(*) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    """,
)
def s16_npy_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ndarray artifacts through a custom Python DataSource (Spark 4 API):
    per-returnflag [revenue, count] vectors are np.save-d as one ``.npy``
    per flag (the S11 sink), then read back with
    ``spark.read.format("npy_artifact")`` — a registered
    ``pyspark.sql.datasource.DataSource`` that plans one InputPartition
    per file and loads on the EXECUTORS (sources/npy_source.py). This is
    the partition-planned twin of the S4 driver-broadcast artifact path:
    the reference loads its ndarray priors on one process
    (play_eppa_cpu.py:72); a directory of artifacts here scans in
    parallel like any other source.

    Cross-engine exactness: the values are decimal-exact aggregates cast
    to float64 once, and ``.npy`` round-trips float64 bit-for-bit, so the
    scan output hash-matches the plain SQL oracle.

    Scale: the artifact build is a driver-side write of |groups| tiny
    files (bounded, the S4 contract); the READ side is the part that
    scales — one task per artifact file, no driver materialization.
    """
    from bigdatabowl_spark.sources.npy_source import NpyArtifactDataSource

    out_dir = _build_npy_artifacts(spark, sf_dir, "npy_artifacts")
    spark.dataSource.register(NpyArtifactDataSource)
    return (
        spark.read.format("npy_artifact")
        .option("path", out_dir)
        .load()
        .withColumnRenamed("file", "l_returnflag")
    )


@register(
    "stream_npy_artifacts",
    "ST9,S16,S4,A1",
    """
    SELECT l_returnflag, 0 AS idx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 1 AS idx, CAST(COUNT(*) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stream_npy_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING Python data source (ST9): the S16 artifact
    directory consumed through ``spark.readStream`` with a registered
    ``SimpleDataSourceStreamReader`` — offsets are counts into the sorted
    file listing, committed ranges replay via readBetweenOffsets, so a
    restarted query re-emits identical rows (sources/npy_source.py). This
    is the engine's "artifact dirs that fill over time" ingestion path:
    new model/prior files become micro-batch rows without a bespoke
    poller.

    Run to completion on a static dir (processAllAvailable + stop), the
    emitted rows equal the batch S16 scan, which is the oracle.

    Scale: one offset range per micro-batch; the prefetch-cache row volume
    per batch is bounded by artifact sizes (model tables, not fact
    tables). Fact-scale streams stay on the native file/Kafka sources.
    """
    from bigdatabowl_spark.sources.npy_source import NpyArtifactStreamSource

    out_dir = _build_npy_artifacts(spark, sf_dir, "npy_stream_artifacts")
    spark.dataSource.register(NpyArtifactStreamSource)
    name = f"npy_stream_{os.path.basename(out_dir)}_{abs(hash(sf_dir)) % 10000}"
    q = (
        spark.readStream.format("npy_artifact_stream")
        .option("path", out_dir)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .withColumnRenamed("file", "l_returnflag")
        # the memory sink table dies with the query; pin the rows
        .localCheckpoint()
    )


@register(
    "s17_npy_writer_roundtrip",
    "S17,S11,S16,A1",
    """
    SELECT l_returnflag, 0 AS idx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 1 AS idx, CAST(COUNT(*) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    """,
)
def s17_npy_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER (S17): the S11 ndarray sink in its
    Spark-native form — per-flag stat rows flow through
    ``df.write.format("npy_sink")`` where each task stages hidden
    ``.tmp-<taskAttemptId>.npy`` files and the driver's commit renames
    winners into place (two-phase commit: a failed or speculative task
    never publishes a partial artifact; sources/npy_source.py). Unlike
    S16's driver-side np.save build, the WRITE itself is distributed:
    rows repartition by artifact stem so one task owns one file.

    Read back through the S16 scan, the values hash-match the plain SQL
    oracle — decimal-exact aggregates survive the npy float64 round-trip
    bit-for-bit.

    Scale: one writer task per artifact; artifact count is the
    parallelism. This is how model/prior tables leave the cluster for
    kernel consumers without a driver bottleneck.
    """
    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactDataSource,
        NpyArtifactSink,
    )

    out_dir = _scratch(sf_dir, "npy_writer_artifacts")
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".npy"):
            os.remove(os.path.join(out_dir, f))
    stats = _flag_stats(spark, sf_dir)
    rows = stats.select(
        F.col("l_returnflag").alias("file"),
        F.lit(0).cast("long").alias("idx"),
        F.col("revenue").alias("value"),
    ).unionAll(
        stats.select(
            F.col("l_returnflag").alias("file"),
            F.lit(1).cast("long").alias("idx"),
            F.col("n_items").alias("value"),
        )
    )
    spark.dataSource.register(NpyArtifactSink)
    spark.dataSource.register(NpyArtifactDataSource)
    (
        rows.repartition("file")
        .write.format("npy_sink")
        .option("path", out_dir)
        .mode("append")
        .save()
    )
    return (
        spark.read.format("npy_artifact")
        .option("path", out_dir)
        .load()
        .withColumnRenamed("file", "l_returnflag")
    )


@register(
    "s18_compaction_roundtrip",
    "S10,ZM1,A1",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MIN(epoch_us(ts)) AS ts_min_us,
           MAX(epoch_us(ts)) AS ts_max_us
    FROM events
    GROUP BY event_type
    """,
)
def s18_compaction_roundtrip(spark: SparkSession, sf_dir: str):
    """Small-file compaction: stage the events table as a fragmented
    64-file ingest (the nightly micro-batch pathology — at 100 TB the
    metadata and open() cost of millions of tiny files dominates the
    scan), then rewrite it size-targeted and time-clustered:
    repartitionByRange(ts) → sortWithinPartitions(ts) →
    maxRecordsPerFile. The returned aggregate reads ONLY the compacted
    copy while the oracle reads the raw table, so a hash match proves the
    rewrite is lossless; the layout properties (file count collapses,
    per-file ts ranges are disjoint → min/max zone-map pruning works for
    time predicates) are pinned by
    tests/test_io.py::test_compaction_collapses_files_with_disjoint_ranges.

    Scale: the rewrite is one range shuffle of the new partitions (sampled
    boundaries, no driver data), embarrassingly incremental per ingest
    window — the OPTIMIZE/compact loop every table format (Delta, Iceberg,
    Hudi) schedules, expressed as plain Spark.
    """
    from bigdatabowl_spark.functions.scalar import dec
    from bigdatabowl_spark.sources.tables import epoch_us_col

    ev = t(spark, sf_dir, "events")
    frag_dir = _scratch(sf_dir, "s18_fragmented")
    comp_dir = _scratch(sf_dir, "s18_compacted")
    # stage: the pathological ingest layout (64 unordered shards)
    ev.drop("ts_us", "ts_ns").repartition(64).write.mode("overwrite").parquet(
        frag_dir
    )
    raw = spark.read.parquet(frag_dir)
    (
        raw.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .parquet(comp_dir)
    )
    compacted = spark.read.parquet(comp_dir)
    compacted = compacted.withColumn("us", epoch_us_col(compacted, "ts"))
    return compacted.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
        F.min("us").alias("ts_min_us"),
        F.max("us").alias("ts_max_us"),
    )


@register(
    "s19_dpp_star_join",
    "S10,J1,P1,A1",
    """
    WITH dim(l_returnflag, flag_class) AS (
        VALUES ('A', 'archive'), ('N', 'live'), ('R', 'archive')
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem l JOIN dim USING (l_returnflag)
    WHERE flag_class = 'archive'
    GROUP BY l.l_returnflag
    """,
)
def s19_dpp_star_join(spark: SparkSession, sf_dir: str):
    """Dynamic partition pruning: the fact table is laid out
    partitionBy(l_returnflag) and joined to a tiny dimension filtered on a
    NON-partition attribute — Spark pushes the dim's surviving keys into
    the fact scan AT RUNTIME (dynamicpruningexpression reusing the
    broadcast), so only the matching partition directories are read. This
    is the star-schema scan optimization that turns a 100 TB
    date-partitioned fact scan into just the days the dimension filter
    selects, without the query author naming any partition.

    The executed-plan gate
    (tests/test_plan_quality.py::test_dpp_star_join_prunes_fact_scan)
    asserts the dynamic-pruning partition filter is present in the fact
    scan; the oracle recomputes from the raw table, proving the
    partitioned layout is content-lossless.

    Scale: staging is one partitionBy write (here per run; in production
    the layout IS the table); the query itself is a broadcast join whose
    scan reads 2 of 3 partitions.
    """
    from bigdatabowl_spark.functions.scalar import dec
    from bigdatabowl_spark.sources.io import partition_decode, partition_encode

    li = t(spark, sf_dir, "lineitem")
    fact_dir = _scratch(sf_dir, "s19_fact_by_flag")
    # staged through write_partitioned with the partition VALUE codec: a
    # raw partitionBy write silently aliases a '' l_returnflag into the
    # hive default partition (round-10 review) and the guard would refuse
    # it — encoding keeps the layout content-lossless for every value.
    # The DIM side is encoded too (not the fact decoded) so the join key
    # stays the raw partition column and dynamic partition pruning still
    # fires; the tiny decode happens AFTER the aggregation.
    proj = li.select(
        partition_encode(F.col("l_returnflag")).alias("l_returnflag"),
        "l_orderkey",
        "l_extendedprice",
    )
    write_partitioned(proj, fact_dir, ["l_returnflag"])
    # explicit schema: a zero-row partitioned layout has no data files to
    # infer from, and the partition column stays string-typed by
    # declaration (found by tests/test_sources_fuzz.py)
    fact = spark.read.schema(proj.schema).parquet(fact_dir)
    dim = spark.createDataFrame(
        [("A", "archive"), ("N", "live"), ("R", "archive")],
        "l_returnflag string, flag_class string",
    ).select(
        partition_encode(F.col("l_returnflag")).alias("l_returnflag"),
        "flag_class",
    )
    return (
        fact.join(
            F.broadcast(dim.where(F.col("flag_class") == "archive")),
            "l_returnflag",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        )
        .select(
            partition_decode(F.col("l_returnflag")).alias("l_returnflag"),
            "n",
            "revenue",
        )
    )


@register(
    "s20_jsonl_roundtrip",
    "S20,S9,S2,A1",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT text) AS n_texts,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    GROUP BY lang
    """,
)
def s20_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines corpus sink → schema'd scan round trip (S20).

    JSONL is the interchange format LLM training corpora actually move in
    (one document object per line); this query writes the documents table
    through the JSON sink, reads it back with a DECLARED schema (no
    inference job — at 100 TB schema-on-read over JSONL is a full extra
    pass), and aggregates per language with text-sensitive distincts. The
    oracle computes the same aggregate from the ORIGINAL parquet, so a
    hash match proves the sink/scan pair is lossless — including unicode
    text, embedded control characters (JSON-escaped by the writer), and
    empty-vs-distinct documents (COUNT(DISTINCT text) moves if any text
    mutates in transit).

    Reference: the reference moves corpora as CSVs (normalize.py:13-15);
    JSONL is the §2.11 extension surface for document pipelines.

    Scale: the sink shards one JSONL file per task; the scan is
    line-splittable (unlike multiLine JSON or quoted-newline CSV), so
    both directions parallelize per split — this is why JSONL, not CSV,
    is the corpus interchange posture at 100 TB.
    """
    docs = t(spark, sf_dir, "documents")
    path = _scratch(sf_dir, "documents_jsonl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("text").alias("n_texts"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("doc_id").alias("id_checksum"),
    )


@register(
    "stream_jsonl_documents",
    "S20,S5,A1",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
                AS BIGINT) AS text_hash_sum,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    GROUP BY lang
    """,
)
def stream_jsonl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JSONL corpus ingest (S20 × S5): the documents table staged
    as a JSONL directory and consumed through ``spark.readStream.json``
    with a declared schema — the continuous-crawl arrival pattern for LLM
    corpora (new shard files become micro-batch rows; no bespoke poller).
    Complete-mode per-language aggregate over an availableNow run equals
    the batch aggregate over the original parquet, which is the oracle —
    certifying the streaming scan is as lossless as s20's batch scan. The
    text-sensitivity witness is an order-free SUM of md5_long(text)
    (COUNT(DISTINCT ...) is not streamable): any byte mutated in transit
    moves the hash sum.

    Scale: the file source checkpoints per-file offsets (restart-safe, the
    recovery contract tests/test_streaming.py pins for parquet streams);
    per-batch volume is bounded by maxFilesPerTrigger at real scale. The
    aggregate state is one row per language — O(groups), not O(corpus).
    """
    from bigdatabowl_spark.operators.dedup import md5_long

    docs = t(spark, sf_dir, "documents")
    path = _scratch(sf_dir, "documents_jsonl_stream")
    docs.write.mode("overwrite").json(path)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_") or "sf"
    name = f"jsonl_stream_{tag}"
    q = (
        spark.readStream.schema(docs.schema)
        .json(path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(md5_long(F.col("text"))).alias("text_hash_sum"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the memory sink table dies with the query; pin the rows
    return spark.table(name).localCheckpoint()
