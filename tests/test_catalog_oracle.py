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


def test_kernel_staging_is_sf_keyed(spark, sf_dir):
    """A staged kernel table carries a _STAGED_FROM marker and only
    satisfies readside checks for the sf_dir that built it — a readside
    sweep at another scale must re-stage, never silently validate stale
    bytes (the round-5 review's staleness hole)."""
    from bigdatabowl_spark.plans.catalog import CATALOG
    from bigdatabowl_spark.plans.round5 import _staged

    import bigdatabowl_spark.plans  # noqa: F401

    name = "a20b_gamma_mle_fit"  # cheapest staging kernel
    CATALOG[name].builder(spark, sf_dir)
    assert _staged(name, sf_dir)
    assert _staged(name, sf_dir + "/")  # trailing slash is normalized
    assert not _staged(name, "/root/testdata/sf-other")


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_no_oracle_emits_hugeint(spark, sf_dir):
    """Driver-hash-safety gate: DuckDB HUGEINT/UBIGINT columns convert to a
    different pandas kind (float/object) than Spark's BIGINT (int64), so a
    type-tagged hash mismatches even when every value is identical — the
    round-2 pack_sequences failure class. DESCRIBE-only, so it's cheap and
    catches any oracle whose window/plain SUM arithmetic escapes un-CAST.
    """
    import duckdb

    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG
    from bigdatabowl_spark.plans.round5 import ensure_kernel_staged
    from tests.oracle_harness import duck_connection

    # The round-5 readside oracles DESCRIBE staged kernel parquet — make
    # sure it exists before asking DuckDB for schemas on a cold machine.
    ensure_kernel_staged(spark, sf_dir)
    from bigdatabowl_spark.plans.round6 import _stage_forest, _stage_priors

    _stage_priors(spark, sf_dir)  # m4_prior_surface's oracle reads these
    _stage_forest(spark, sf_dir)  # m1b/m1c/m1d oracles walk these nodes
    con = duck_connection(sf_dir)
    offenders = []
    for name, q in CATALOG.items():
        if q.oracle is None:
            continue
        try:
            desc = con.execute("DESCRIBE " + q.oracle).fetchall()
        except duckdb.IOException:
            # Any other oracle that reads bytes its builder stages (the dart
            # forest, defense placements, IO-scratch roundtrips, ...) fails
            # DESCRIBE on a cold machine: run the builder once — every
            # staged-reading builder self-heals its stage — then retry.
            # Warm machines never take this path.
            q.builder(spark, sf_dir)
            desc = con.execute("DESCRIBE " + q.oracle).fetchall()
        for col, dtyp, *_ in desc:
            if "HUGEINT" in dtyp.upper() or "UBIGINT" in dtyp.upper():
                offenders.append((name, col, dtyp))
    assert not offenders, f"oracle columns need CAST(... AS BIGINT): {offenders}"


def test_harness_detects_mutations(spark, sf_dir):
    """Non-vacuity gate for the harness ITSELF: `compare` must flag every
    mutation class the cross-engine check exists to catch — dropped rows,
    renamed columns, perturbed numeric values, perturbed strings. A
    harness that silently passes corrupted results would make all 156
    green rows meaningless, so the detector is pinned alongside them."""
    import pandas as pd

    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(sf_dir)
    q = CATALOG["a1_pricing_summary"]
    sdf = q.builder(spark, sf_dir)
    clean = con.execute(q.oracle).fetchdf()
    assert not compare(sdf, clean), "clean baseline must match"

    assert compare(sdf, clean.iloc[:-1]), "dropped row not detected"
    assert compare(
        sdf, clean.rename(columns={clean.columns[0]: "zz_mutated"})
    ), "renamed column not detected"

    num = [c for c in clean.columns if pd.api.types.is_numeric_dtype(clean[c])]
    val = clean.copy()
    val[num[0]] = val[num[0]] + 1
    assert compare(sdf, val), "numeric perturbation not detected"

    strs = [c for c in clean.columns if clean[c].dtype == object]
    sv = clean.copy()
    sv[strs[0]] = sv[strs[0]].astype(str) + "_x"
    assert compare(sdf, sv), "string perturbation not detected"


def test_catalog_matches_duckdb_oracle(spark, sf_dir):
    results = run_all(spark, sf_dir)
    failures = {k: v for k, v in results.items() if v}
    assert not failures, f"oracle mismatches: {failures}"


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_catalog_matches_duckdb_oracle_sf001(spark, sf_dir):
    """Driver-scale sweep in the pytest cadence (VERDICT r6 item 8): the
    full catalog vs DuckDB at sf0.01 — mismatches that only appear at
    larger group counts (decimal-sum widths, quantile boundaries, LIMIT
    tie-breaks) surface here instead of in the driver artifact. Skipped
    when the session already targets a non-default sf_dir, and opt-out via
    SPARK_GRAFT_FAST_TESTS=1 for quick local iteration."""
    import os

    import pytest as _pytest

    if os.environ.get("SPARK_GRAFT_FAST_TESTS"):
        _pytest.skip("SPARK_GRAFT_FAST_TESTS set")
    if sf_dir.rstrip("/").endswith("sf0.01"):
        _pytest.skip("session sf_dir already sf0.01")
    results = run_all(spark, "/root/testdata/sf0.01")
    failures = {k: v for k, v in results.items() if v}
    assert not failures, f"sf0.01 oracle mismatches: {failures}"
