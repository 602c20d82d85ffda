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
