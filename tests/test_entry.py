"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib.util
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
        "a7b_approx_sketches",  # engine-specific sketches, tolerance-tested
        "eppa_field_surface",
        "eppa_pass_summary",
        "eppa_player_stats",
        "m5_tuning_dataset",
        "m6_optimize_defense",
        "analytics_player_rankings",
        "analytics_throw_calibration",
    }, f"unexpected oracle-less queries: {rows_only}"
