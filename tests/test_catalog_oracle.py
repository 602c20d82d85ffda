"""The local replica of the driver's correctness gate (t2).

Every catalog query's Spark result must match its DuckDB oracle exactly
(row count + columns + values) at sf0.001. sf0.01 is covered by running
tests/oracle_harness.py standalone (slower; the driver does it per-round).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import run_all


def test_every_query_has_oracle_or_doc():
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    assert CATALOG, "catalog is empty"
    for name, q in CATALOG.items():
        assert q.survey, f"{name} missing SURVEY ids"
        assert q.doc or q.builder.__doc__, f"{name} missing docstring"


def test_catalog_matches_duckdb_oracle(spark, sf_dir):
    results = run_all(spark, sf_dir)
    failures = {k: v for k, v in results.items() if v}
    assert not failures, f"oracle mismatches: {failures}"
