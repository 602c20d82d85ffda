"""Seeded batch-vs-stream equivalence fuzzing (VERDICT r5 item 8).

The streaming catalog twins (ST1-ST3) are checked against one fixed event
table; this fuzzes the dimension those checks can't enumerate — MICRO-BATCH
COMPOSITION. Each seed generates a random event table, scatters it over a
random number of files in random row order, and runs a windowed streaming
aggregation with maxFilesPerTrigger=1 (so every file boundary is a
micro-batch boundary). The result must equal the same aggregation computed
by DuckDB over the same parquet bytes: stream row-order and batch-split
invariance, certified cross-engine.

Determinism by construction: grouping keys are integers derived by floor
division (identical in both engines), aggregates are COUNT and SUM of small
integers (CAST to BIGINT — DuckDB widens to HUGEINT), and the sink runs in
complete mode with trigger(availableNow) so every window is emitted exactly
once regardless of how files were batched. Seeds are fixed; any failure is
reproducible from its printed layout.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from tests.oracle_harness import compare

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


N_SEEDS = 6
EVENT_TYPES = ["click", "view", "purchase", "scroll"]


def _gen_rows(rng: random.Random, n: int):
    """Random event rows: unique event_id, timestamps clustered enough that
    windows overlap file boundaries whichever way the scatter falls."""
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choice(EVENT_TYPES),
                rng.randrange(0, 4 * 3600) * 1_000_000,  # ts_us within 4h
                rng.randrange(-50, 200),  # small int value: exact sums
            )
        )
    rng.shuffle(rows)
    return rows


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_stream_agg_matches_duckdb_batch(spark, tmp_path, seed):
    import duckdb

    rng = random.Random(1000 + seed)
    n = rng.randrange(200, 500)
    n_files = rng.randrange(1, 8)
    window_us = rng.choice([60, 300, 600]) * 1_000_000
    rows = _gen_rows(rng, n)
    src = str(tmp_path / "events_src")
    (
        spark.createDataFrame(
            rows, "event_id long, event_type string, ts_us long, value long"
        )
        .repartition(n_files)  # random file count = random micro-batching
        .write.parquet(src)
    )

    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agged = stream.groupBy(
        F.floor(F.col("ts_us") / window_us).cast("long").alias("window_id"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("value_sum"),
    )
    sink = f"stream_fuzz_{seed}"
    q = (
        agged.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT * FROM {sink}")

    want = duckdb.connect().execute(
        f"""
        SELECT CAST(floor(ts_us / {window_us}) AS BIGINT) AS window_id,
               event_type, COUNT(*) AS n,
               CAST(SUM(value) AS BIGINT) AS value_sum
        FROM read_parquet('{src}/*.parquet')
        GROUP BY 1, 2
        """
    ).df()
    problems = compare(got, want)
    assert not problems, (seed, n, n_files, window_us, problems)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_stream_dedup_matches_duckdb_batch(spark, tmp_path, seed):
    """dropDuplicates across micro-batches (keyed state) equals batch
    DISTINCT-on-key aggregation, whatever the file split — duplicates are
    injected so the cross-batch state path is actually exercised."""
    import duckdb

    rng = random.Random(2000 + seed)
    n = rng.randrange(150, 350)
    n_files = rng.randrange(2, 8)
    rows = _gen_rows(rng, n)
    # duplicate ~30% of event_ids with different payloads: the stream must
    # keep exactly one row per key no matter which micro-batch sees it first
    dupes = [
        (r[0], rng.choice(EVENT_TYPES), r[2] + 7_000_000, r[3] + 1)
        for r in rng.sample(rows, k=n // 3)
    ]
    allrows = rows + dupes
    rng.shuffle(allrows)
    src = str(tmp_path / "events_src")
    (
        spark.createDataFrame(
            allrows, "event_id long, event_type string, ts_us long, value long"
        )
        .repartition(n_files)
        .write.parquet(src)
    )

    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # keep one row per key, then fold to a key-count summary: WHICH row
    # survives depends on arrival order, so only key-level facts are
    # deterministic — exactly what the batch twin checks
    deduped = stream.dropDuplicates(["event_id"]).groupBy().agg(
        F.count("*").alias("n_keys"),
        F.sum("event_id").alias("key_sum"),
    )
    sink = f"stream_fuzz_dedup_{seed}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT * FROM {sink}")

    want = duckdb.connect().execute(
        f"""
        SELECT COUNT(DISTINCT event_id) AS n_keys,
               CAST(SUM(DISTINCT event_id) AS BIGINT) AS key_sum
        FROM read_parquet('{src}/*.parquet')
        """
    ).df()
    problems = compare(got, want)
    assert not problems, (seed, n, n_files, problems)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_stream_interval_join_matches_duckdb_batch(spark, tmp_path, seed):
    """ST6 stream-stream interval join under RANDOM watermark lags and
    join widths (VERDICT r6 item 8): random event tables scattered over
    random file splits, both sides watermarked with a random lag drawn
    ABOVE the event-time span — so no row is ever late-dropped and the
    join must equal DuckDB's batch interval join exactly, whatever the
    micro-batch composition or retention horizon. (Tight lags are
    deliberately out of scope: which rows drop then depends on file
    arrival order, which the file source does not contract — the
    deterministic surface is lag ≥ span, and the lag still sizes the
    state-retention window the join actually maintains.)"""
    import duckdb

    rng = random.Random(3000 + seed)
    n = rng.randrange(150, 400)
    n_files = rng.randrange(2, 8)
    width_sec = rng.choice([60, 300, 900])
    span_sec = 4 * 3600  # _gen_rows timestamps live in [0, 4h)
    lag_sec = rng.randrange(span_sec, 3 * span_sec)
    base = _gen_rows(rng, n)
    # re-key onto a small user domain so the equi-join side actually matches
    rows = [
        (eid, eid % 37, et, ts, val) for (eid, et, ts, val) in base
    ]
    src = str(tmp_path / "events_src")
    (
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts_us long, "
            "value long",
        )
        .repartition(n_files)
        .write.parquet(src)
    )
    sch = spark.read.parquet(src).schema

    def side(prefix, et):
        return (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .filter(F.col("event_type") == et)
            .select(
                F.col("event_id").alias(f"{prefix}_event"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.timestamp_micros(F.col("ts_us")).alias(f"{prefix}_time"),
            )
            .withWatermark(f"{prefix}_time", f"{lag_sec} seconds")
        )

    left, right = side("c", "click"), side("p", "purchase")
    joined = left.join(
        right,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_time") >= F.col("c_time") - F.expr(f"INTERVAL {width_sec} SECONDS"))
        & (F.col("p_time") < F.col("c_time")),
        "inner",
    ).select("c_event", "p_event")
    sink = f"stream_fuzz_ij_{seed}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT * FROM {sink}")

    want = duckdb.connect().execute(
        f"""
        SELECT a.event_id AS c_event, b.event_id AS p_event
        FROM read_parquet('{src}/*.parquet') a
        JOIN read_parquet('{src}/*.parquet') b
          ON b.user_id = a.user_id
         AND b.ts_us >= a.ts_us - {width_sec * 1_000_000}
         AND b.ts_us < a.ts_us
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        """
    ).df()
    problems = compare(got, want)
    assert not problems, (seed, n, n_files, width_sec, lag_sec, problems)
