"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import pytest
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema.fieldNames()


def test_queries_and_oracles_aligned(spark):
    mod = _load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "no queries declared"
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)
    # every query has an oracle except the declared non-SQL-expressible
    # kernel entries (driver records a rows-only check for those)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        # a7b_approx_sketches folded into a7c_sketch_certify (r8): sketch
        # VALUES are engine-specific, the oracle-checked booleans in a7c
        # carry the certification; the a7b helper remains tolerance-tested
        "eppa_field_surface",
        "eppa_pass_summary",
        "eppa_player_stats",
        "s4_prior_artifact_lifecycle",  # kernel consumer; bitexact in-query
        "a20b_gamma_mle_fit",  # digamma-Newton MLE; self-certifies vs moments
        "m2_value_model_width",  # kernel path; envelope property in tests
        "m6_optimize_defense",
        "analytics_player_rankings",
        "analytics_throw_calibration",
    }, f"unexpected oracle-less queries: {rows_only}"


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_kernel_queries_from_foreign_cwd():
    """Python workers must import bigdatabowl_spark via the shipped package
    zip (session._ship_package), not via the driver's cwd — the driver's
    correctness harness runs a bare SparkSession from its own directory.
    Regression: applyInPandas kernels raised ModuleNotFoundError on workers
    when the driver cwd was not the repo root."""
    import subprocess
    import sys

    code = """
import importlib.util
spec = importlib.util.spec_from_file_location('__spark_entry__', '/root/repo/__spark_entry__.py')
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
# bare session: default conf, non-UTC timezone, foreign cwd — exactly the
# environment the correctness driver provides. Events-table queries and a
# kernel query must all work with zero repo build-conf.
spark = (SparkSession.builder.master('local[2]')
         .config('spark.sql.session.timeZone', 'America/New_York')
         .config('spark.ui.enabled','false').getOrCreate())
qs = mod.queries()
for name in ('w1_lag_gaps', 'j7_event_span', 'a25_cumulative', 'm7_grouped_matrix'):
    n = qs[name](spark, '/root/testdata/sf0.001').count()
    assert n > 0, (name, n)
print('FOREIGN_CWD_OK')
"""
    env = {
        k: v
        for k, v in __import__("os").environ.items()
        if k not in ("PYTHONPATH",)
    }
    out = subprocess.run(
        [sys.executable, "-c", code], cwd="/tmp", env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert "FOREIGN_CWD_OK" in out.stdout, out.stdout + out.stderr


def test_run_first_queue_is_valid():
    """Guard the driver's run queue: every _RUN_FIRST name must exist in
    the catalog (the `if k in mapping` reorder silently SWALLOWS typos,
    dropping a query from the driver's 50-run window), names must be
    unique, exactly 50 must sit above the documented cap marker, and every
    kernel chain must run before the `*_readside` twin whose staged
    parquet its oracle reads."""
    import re

    import __spark_entry__ as entry_mod
    from bigdatabowl_spark.plans.catalog import CATALOG

    names = list(entry_mod._RUN_FIRST)
    assert len(names) == len(set(names)), "duplicate _RUN_FIRST entries"
    unknown = [n for n in names if n not in CATALOG]
    assert not unknown, f"_RUN_FIRST names not in CATALOG: {unknown}"

    src = open(entry_mod.__file__).read()
    block = src.split("_RUN_FIRST = (")[1].split("\n)")[0]
    pre = block.split("50-query cap lands here")[0]
    assert len(re.findall(r'"([a-z0-9_]+)"', pre)) == 50

    idx = {n: i for i, n in enumerate(names)}
    pairs = [
        ("eppa_field_surface", "eppa_surface_readside"),
        ("eppa_pass_summary", "eppa_pass_readside"),
        ("eppa_player_stats", "eppa_player_readside"),
        ("m2_value_model_width", "m2_width_readside"),
        ("analytics_player_rankings", "rankings_readside"),
        ("analytics_throw_calibration", "calibration_readside"),
        ("a20b_gamma_mle_fit", "a20b_mle_readside"),
        ("s4_prior_artifact_lifecycle", "s4_lifecycle_readside"),
        ("m6_optimize_defense", "m6_defense_readside"),
    ]
    for kernel, readside in pairs:
        if readside in idx:
            # a listed readside needs its kernel listed EARLIER — the
            # kernel's builder stages the parquet the readside's oracle
            # reads; an unlisted kernel would be appended AFTER the list
            assert kernel in idx and idx[kernel] < idx[readside], (
                kernel,
                readside,
            )
        # neither-listed (or kernel-only) pairs are safe: _ordered appends
        # the remainder in catalog registration order, kernel before twin
