"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
(order-insensitive, columns sorted by name — like the driver). Used by
tests/test_catalog_oracle.py and runnable standalone:

    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

from bigdatabowl_spark.sources.tables import TABLES


def oracle_tables(oracle_sql: str) -> set[str]:
    """Base-table footprint of an oracle SQL string, for the fuzz files'
    exhaustiveness guards: any whole-word occurrence of a base-table name
    counts (ADVICE r9 — the earlier `(?:FROM|JOIN)\\s+name` form missed
    comma-style joins `FROM a, b` and newline-separated table lists, which
    would silently misclassify a future oracle and dodge its data fuzz).
    Over-matching is the safe direction: a stray word match can only ADD a
    table to the footprint, pushing the query out of a single-table family
    and into the (manually curated) cross-family set, where the guard
    assert fails loudly instead of skipping the query. Verified identical
    to the old classification over the whole live catalog at switch time."""
    import re

    return {t for t in TABLES if re.search(rf"\b{t}\b", oracle_sql)}


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir.rstrip('/')}/{name}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns), ignore_index=True)


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(sp) != len(duck_df):
        problems.append(f"rowcount: spark={len(sp)} duck={len(duck_df)}")
    a, b = _canon(sp), _canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av_f = pd.to_numeric(av, errors="coerce").astype(float)
                bv_f = pd.to_numeric(bv, errors="coerce").astype(float)
                exact = (
                    (av_f == bv_f) | (av_f.isna() & bv_f.isna())
                ).all()
                if not exact:
                    diff = (av_f - bv_f).abs()
                    problems.append(
                        f"col {c}: max |Δ|={diff.max():.3e} at {int(diff.idxmax())} "
                        f"(spark={av_f[diff.idxmax()]!r} duck={bv_f[diff.idxmax()]!r})"
                    )
            else:
                if not (av.astype(str).values == bv.astype(str).values).all():
                    neq = (av.astype(str).values != bv.astype(str).values)
                    i = int(neq.argmax())
                    problems.append(f"col {c}: first diff row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return problems


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name, q in CATALOG.items():
        if names and name not in names:
            continue
        if q.oracle is None:
            continue
        # Builder first: kernel-chain readside queries stage their source
        # parquet from inside the builder, and the oracle reads that same
        # staged file (plans/round5.py) — so the Spark side must run before
        # the DuckDB side on a cold staging dir.
        try:
            spark_df = q.builder(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"SPARK ERROR: {type(e).__name__}: {str(e)[:500]}"]
            continue
        try:
            duck_df = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"ORACLE SQL ERROR: {e}"]
            continue
        try:
            results[name] = compare(spark_df, duck_df)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"SPARK ERROR: {type(e).__name__}: {str(e)[:500]}"]
    return results


if __name__ == "__main__":
    from bigdatabowl_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark("oracle-harness", master="local[8]")
    res = run_all(spark, sf, names)
    n_fail = 0
    for name, probs in sorted(res.items()):
        status = "PASS" if not probs else "FAIL"
        n_fail += bool(probs)
        print(f"{status} {name}")
        for p in probs:
            print(f"     {p}")
    print(f"\n{len(res) - n_fail}/{len(res)} queries match")
    sys.exit(1 if n_fail else 0)
