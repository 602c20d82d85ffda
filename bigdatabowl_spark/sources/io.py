"""Scan/sink operators (SURVEY §2.1 S1-S13) beyond plain parquet reads.

The reference's IO layer is pandas read_csv with manual usecols, per-week
file globs, pickle/npy sinks, and a hand-rolled resumable driver loop
(comb_model_big_run_cpu.py:16-45). Spark-first equivalents:

- S1/S2: schema'd CSV scan — column pruning happens in Catalyst, not usecols;
- S3: multi-path / glob scan is native to the reader;
- S8: directory-walk provenance via input_file_name();
- S9/S10/S11: columnar parquet sinks, partitioned by the job's natural keys
  (pickle/npy artifacts are re-materialized as parquet tables);
- S12: idempotent resume = partition-overwrite semantics + existing-partition
  pruning, replacing the reference's "skip if output dir exists" loop;
- S13: error-channel = try/except inside the kernel surfaced as a status
  column, filtered into an errors table — no driver-side errors.txt.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_schema(spark: SparkSession, path: str, schema: StructType | str, **options) -> DataFrame:
    """S1: CSV scan with explicit schema (no inference job at scale).

    Reference: pd.read_csv(..., low_memory=False) (normalize.py:13-15) —
    schema-on-read is replaced by a declared StructType so the scan is a
    single pass and Catalyst can prune columns into the reader (S2).
    """
    return spark.read.csv(path, header=True, schema=schema, **options)


def read_multi(spark: SparkSession, paths: list[str], fmt: str = "parquet") -> DataFrame:
    """S3: multi-file union scan (weeks 1-17 glob,
    completion_probability_torch.py:29-34). One reader, N files — Spark
    plans one scan with file-level parallelism, no unionByName needed."""
    return spark.read.format(fmt).load(paths)


def with_provenance(df: DataFrame) -> DataFrame:
    """S8: attach source-file provenance (directory-walk-as-table,
    eppa_analysis.ipynb · cell 3)."""
    return df.withColumn(
        "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


# Hive-layout directory name for a NULL partition value. An EMPTY-STRING
# value writes the SAME directory (verified against Spark 4.1) and reads
# back as NULL — silent data corruption — so write_partitioned refuses it.
NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """S10: partitioned columnar sink (per-play pickle dirs →
    partitionBy parquet; play_eppa_cpu.py:670-677). Dynamic partition
    overwrite keeps re-runs idempotent per partition (S12).

    NULL partition values are fine (hive default-partition dir, round-trips
    as NULL); EMPTY-STRING values — and a genuine string value equal to the
    NULL_PARTITION marker itself — are REFUSED: Spark writes both into the
    hive default-partition directory, so they'd silently read back as NULL
    and resume_filter would conflate them with the NULL partition (found by
    tests/test_sources_fuzz.py; marker case flagged by round-10 review).

    Single-pass guard: each STRING-typed partition column is wrapped in a
    raise_error CASE inside the written projection itself, so validation
    rides the write's only pass over the input. (The first cut ran a
    pre-write `df.filter(...).count()` — for a *computed* input, the
    normal case at scale, that executed the whole upstream plan twice.)
    Non-string partition columns never cast to '' and stay unwrapped; a
    violation aborts the job before any partition is committed (the
    committer discards staged task output) and surfaces as ValueError."""
    from pyspark.sql.types import StringType

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    guarded, wrapped = [], False
    for name in df.columns:
        if name in partition_cols and isinstance(dtypes[name], StringType):
            c = F.col(name)
            msg = F.concat(
                F.lit(
                    f"write_partitioned: partition column '{name}' carries "
                ),
                F.when(c == "", F.lit("an EMPTY-STRING value")).otherwise(
                    F.lit(f"the literal '{NULL_PARTITION}' marker string")
                ),
                F.lit(
                    " — hive-style layouts cannot represent it distinct "
                    f"from NULL (both map to the {NULL_PARTITION} "
                    "directory); map it to a sentinel before partitioning"
                ),
            )
            guarded.append(
                F.when((c == "") | (c == NULL_PARTITION), F.raise_error(msg))
                .otherwise(c)
                .alias(name)
            )
            wrapped = True
        else:
            guarded.append(F.col(name))
    out = df.select(*guarded) if wrapped else df
    try:
        (
            out.write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    except Exception as e:  # surface the guard as the API's ValueError
        text = str(e)
        marker = "write_partitioned: partition column"
        if marker in text:
            start = text.index(marker)
            raise ValueError(text[start:].splitlines()[0]) from e
        raise


def partition_encode(c: "F.Column") -> "F.Column":
    """Injective, hive-representable encoding for a string partition-VALUE
    column — the companion that makes write_partitioned's refusal of
    ''/NULL_PARTITION actionable without dropping data:

    - NULL passes through (hive's default partition round-trips NULL);
    - ''            → '%E'   (unrepresentable raw: aliases to NULL);
    - NULL_PARTITION → '%H'  (a genuine marker-valued string aliases to
                              NULL in the directory name, unescaped);
    - any value starting with '%' gets one '%' prepended, which makes the
      two markers unreachable by real data ('%E' → '%%E');
    - everything else is identity — Spark's own layout escaping handles
      '=', '/', unicode, etc., and round-trips them.

    partition_decode is the exact inverse; both are pure column
    expressions (no UDF). Injectivity is property-tested in
    tests/test_sources_fuzz.py against a plain-Python twin."""
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c == "", F.lit("%E"))
        .when(c == NULL_PARTITION, F.lit("%H"))
        .when(c.startswith("%"), F.concat(F.lit("%"), c))
        .otherwise(c)
    )


def partition_decode(c: "F.Column") -> "F.Column":
    """Inverse of partition_encode ('%E' → '', '%H' → NULL_PARTITION,
    '%…' → drop one leading '%', else identity)."""
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c == "%E", F.lit(""))
        .when(c == "%H", F.lit(NULL_PARTITION))
        .when(c.startswith("%"), F.substring(c, 2, 2147483647))
        .otherwise(c)
    )


def partition_encode_value(v):
    """Plain-Python twin of partition_encode (driver-side done-lists,
    property tests)."""
    if v is None:
        return None
    if v == "":
        return "%E"
    if v == NULL_PARTITION:
        return "%H"
    if v.startswith("%"):
        return "%" + v
    return v


def partition_decode_value(v):
    """Plain-Python twin of partition_decode."""
    if v is None:
        return None
    if v == "%E":
        return ""
    if v == "%H":
        return NULL_PARTITION
    if v.startswith("%"):
        return v[1:]
    return v


def existing_partitions(spark: SparkSession, path: str, key: str) -> list[str]:
    """S12: enumerate already-materialized partition VALUES (the
    reference's os.path.exists play-skip, comb_model_big_run_cpu.py:31-33).

    Directory names are Spark-escaped (%XX for '=', '/', '%', control
    chars — verified: 'a=b' → 'a%3Db'); unquote restores the value so the
    comparison in resume_filter happens in VALUE space, not path space
    (raw names made resume_filter re-write every special-charactered
    partition forever — found by tests/test_sources_fuzz.py). A NULL
    partition surfaces as the NULL_PARTITION marker string; Spark writes a
    GENUINE string value equal to that marker into the same directory name
    unescaped, which is why write_partitioned refuses such values at write
    time — layouts produced by this library can't reach the ambiguity."""
    from urllib.parse import unquote

    if not os.path.exists(path):
        return []
    vals = []
    for d in os.listdir(path):
        if d.startswith(f"{key}=") and not d.startswith("_"):
            raw = d.split("=", 1)[1]
            vals.append(raw if raw == NULL_PARTITION else unquote(raw))
    return vals


# Above this many materialized partitions the done-list leaves the plan
# literal and becomes a broadcast anti-join: a year of hourly partitions
# (~9k) still folds fine as an isin, but a real resumable backfill can
# carry 10^5-10^6 done values, and a filter expression that large chokes
# plan construction long before execution.
_RESUME_ISIN_MAX = 1000


def resume_filter(df: DataFrame, spark: SparkSession, path: str, key: str) -> DataFrame:
    """S12: drop rows whose partition already exists at the sink — combined
    with write_partitioned this gives restartable long jobs.

    Null-aware: rows with a NULL key are remaining only while the default
    partition is missing (the old `~isin(done)` silently dropped them from
    `remaining` FOREVER — a null-keyed partition could never resume).

    Scale: small done-lists stay a literal isin (folds to nothing in the
    plan); past _RESUME_ISIN_MAX values the list becomes a one-column
    DataFrame and the drop is a broadcast LEFT ANTI join — the plan shape
    that survives a million materialized partitions."""
    done = existing_partitions(spark, path, key)
    if not done:
        return df
    null_done = NULL_PARTITION in done
    values_done = [d for d in done if d != NULL_PARTITION]
    k = F.col(key).cast("string")
    keep_null = k.isNull() & F.lit(not null_done)
    if len(values_done) <= _RESUME_ISIN_MAX:
        keep_nonnull = k.isNotNull() & (
            ~k.isin(values_done) if values_done else F.lit(True)
        )
        return df.filter(keep_nonnull | keep_null)
    done_df = spark.createDataFrame(
        [(v,) for v in values_done], f"__done_{key} string"
    )
    nonnull_remaining = df.filter(k.isNotNull()).join(
        F.broadcast(done_df),
        k == F.col(f"__done_{key}"),
        "left_anti",
    )
    return nonnull_remaining.unionByName(df.filter(keep_null))


def split_error_channel(df: DataFrame, status_col: str = "status") -> tuple[DataFrame, DataFrame]:
    """S13: split a kernel output carrying a status column into
    (ok, errors) tables — the reference's errors.txt + failed-key list
    (comb_model_big_run_cpu.py:27-45) as first-class DataFrames."""
    ok = df.filter(F.col(status_col) == "ok").drop(status_col)
    errors = df.filter(F.col(status_col) != "ok")
    return ok, errors


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed table sink: pre-shuffles once at write time so every later
    join/aggregation on the bucket key is exchange-free (co-located).

    The 100 TB pattern for the tracking fact table: bucket by gameId so
    play-grain joins (tracking ⋈ per-play aggregates, SURVEY J6) and the
    kernel's play grouping read co-located data. Local runs use the
    session's spark_warehouse dir.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior run can leave the managed location behind
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        import shutil

        shutil.rmtree(loc)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
