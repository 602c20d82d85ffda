"""Seeded cross-engine query fuzzing: randomly generated relational
queries (typed predicates, group-bys, exact-by-construction aggregates)
run through BOTH Spark and DuckDB from the SAME SQL string, compared with
the standard harness rules. The catalog pins 156 hand-written queries;
this pins the long tail the hand-written set can't enumerate — random
predicate/group/agg combinations over every scalar column type we ship,
plus FK equi-joins pooling both tables' columns (80 seeded queries:
~19 joined, ~51 grouped, ~1/8 legitimately empty-result).

The generator only emits constructs that are bit-exact across engines by
the repo's established cross-engine rules (plans/catalog.py):
  - integer aggregates CAST to BIGINT (DuckDB widens to HUGEINT),
  - double sums via DECIMAL(18,2) partials (all double columns in the
    testdata are 2-decimal money/metric values),
  - MIN/MAX only for raw doubles (exact bits, no accumulation order),
  - byte-wise string comparison, no timestamps (covered elsewhere via
    epoch_us arithmetic).

Seeds are fixed: every failure is reproducible by its printed SQL.
"""

from __future__ import annotations

import random

import pytest

from tests.oracle_harness import compare, duck_connection

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


# table -> (int cols, 2-decimal double cols, string cols)
SCHEMAS = {
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        ["l_returnflag", "l_linestatus"],
    ),
    "orders": (
        ["o_orderkey", "o_custkey"],
        ["o_totalprice"],
        ["o_orderstatus", "o_orderpriority"],
    ),
    "customer": (
        ["c_custkey", "c_nationkey"],
        ["c_acctbal"],
        ["c_name", "c_mktsegment"],
    ),
    "part": (
        ["p_partkey", "p_size"],
        ["p_retailprice"],
        ["p_name", "p_brand", "p_type"],
    ),
    "events": (
        ["event_id", "user_id"],
        ["value"],
        ["event_type"],
    ),
    "documents": (
        ["doc_id", "n_chars"],
        [],
        ["lang", "source"],
    ),
}

# child table -> (parent table, child fk, parent key)
FKS = {
    "lineitem": [("orders", "l_orderkey", "o_orderkey"), ("part", "l_partkey", "p_partkey")],
    "orders": [("customer", "o_custkey", "c_custkey")],
    "customer": [("nation", "c_nationkey", "n_nationkey")],
}
SCHEMAS["nation"] = (["n_nationkey", "n_regionkey"], [], ["n_name"])

N_QUERIES = 80


def _pred(rng: random.Random, ints, dbls, strs) -> str:
    kind = rng.choice(["mod", "lt", "len", "lex", "like"])
    if kind == "mod" and ints:
        c = rng.choice(ints)
        k = rng.randint(2, 13)
        return f"{c} % {k} <= {rng.randint(0, k - 1)}"
    if kind == "lt" and ints:
        c = rng.choice(ints)
        # keys are 1-based and dense enough that a small modulus-scaled
        # threshold keeps selectivity away from 0/100%
        return f"{c} % 1000 < {rng.randint(50, 950)}"
    if kind == "len" and strs:
        return f"length({rng.choice(strs)}) >= {rng.randint(1, 12)}"
    if kind == "lex" and strs:
        return f"{rng.choice(strs)} >= '{rng.choice('ABFKMPRSabefmprs')}'"
    if strs:
        return f"{rng.choice(strs)} LIKE '%{rng.choice('aeiorstn')}%'"
    return "1 = 1"


def _agg(rng: random.Random, i: int, ints, dbls, strs) -> str:
    choices = ["count"]
    if ints:
        choices += ["sum_int", "min_int", "max_int", "cdist_int"]
    if dbls:
        choices += ["sum_dec", "min_dbl", "max_dbl"]
    if strs:
        choices += ["min_str", "max_str", "cdist_str"]
    kind = rng.choice(choices)
    a = f"a{i}"
    if kind == "count":
        return f"COUNT(*) AS {a}"
    if kind == "sum_int":
        return f"CAST(SUM({rng.choice(ints)}) AS BIGINT) AS {a}"
    if kind == "min_int":
        return f"CAST(MIN({rng.choice(ints)}) AS BIGINT) AS {a}"
    if kind == "max_int":
        return f"CAST(MAX({rng.choice(ints)}) AS BIGINT) AS {a}"
    if kind == "cdist_int":
        return f"CAST(COUNT(DISTINCT {rng.choice(ints)}) AS BIGINT) AS {a}"
    if kind == "sum_dec":
        return (
            f"CAST(SUM(CAST({rng.choice(dbls)} AS DECIMAL(18,2))) AS DOUBLE) AS {a}"
        )
    if kind == "min_dbl":
        return f"MIN({rng.choice(dbls)}) AS {a}"
    if kind == "max_dbl":
        return f"MAX({rng.choice(dbls)}) AS {a}"
    if kind == "min_str":
        return f"MIN({rng.choice(strs)}) AS {a}"
    if kind == "max_str":
        return f"MAX({rng.choice(strs)}) AS {a}"
    return f"CAST(COUNT(DISTINCT {rng.choice(strs)}) AS BIGINT) AS {a}"


def gen_query(rng: random.Random) -> str:
    table = rng.choice(sorted(SCHEMAS))
    ints, dbls, strs = SCHEMAS[table]
    frm = table
    # half the time, inner-join a parent over a real FK and pool both
    # tables' columns — join order/dialect is where engines diverge
    if table in FKS and rng.random() < 0.5:
        parent, fk, pk = rng.choice(FKS[table])
        frm = f"{table} JOIN {parent} ON {table}.{fk} = {parent}.{pk}"
        p_ints, p_dbls, p_strs = SCHEMAS[parent]
        ints = ints + p_ints
        dbls = dbls + p_dbls
        strs = strs + p_strs
    # group keys: strings as-is; ints bucketed by modulus to keep group
    # counts bounded at any sf
    keys = []
    for i in range(rng.randint(0, 2)):
        if strs and rng.random() < 0.6:
            keys.append((f"k{i}", rng.choice(strs)))
        elif ints:
            keys.append((f"k{i}", f"{rng.choice(ints)} % {rng.randint(2, 20)}"))
    aggs = [_agg(rng, i, ints, dbls, strs) for i in range(rng.randint(1, 3))]
    preds = [_pred(rng, ints, dbls, strs) for _ in range(rng.randint(0, 2))]

    select = [f"{expr} AS {alias}" for alias, expr in keys] + aggs
    sql = f"SELECT {', '.join(select)} FROM {frm}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if keys:
        sql += " GROUP BY " + ", ".join(expr for _, expr in keys)
    return sql


def gen_rollup_query(rng: random.Random) -> str:
    """Multi-level aggregation: GROUP BY ROLLUP / CUBE / GROUPING SETS.

    Keys are non-null by construction (raw string columns, bucketed
    ints), so a NULL key in the output unambiguously means "rolled up"
    — the one place both engines agree without needing GROUPING()
    disambiguation. Aggregates follow the same exactness rules as
    gen_query.

    No WHERE clause on purpose: fuzzing found that on an EMPTY input the
    engines genuinely diverge — DuckDB emits the SQL-standard grand-total
    row for the () grouping set (an ungrouped aggregate over zero rows is
    one row), while Spark's Expand-based rewrite turns every set into a
    keyed group-by and returns zero rows. Predicate selectivity is
    already fuzzed by gen_query; here the full table keeps the input
    non-empty so the multi-level semantics themselves are what's pinned.
    """
    table = rng.choice(sorted(SCHEMAS))
    ints, dbls, strs = SCHEMAS[table]
    keys = []
    for i in range(2):
        if strs and rng.random() < 0.5:
            keys.append((f"k{i}", rng.choice(strs)))
        else:
            keys.append((f"k{i}", f"{rng.choice(ints)} % {rng.randint(2, 10)}"))
    kind = rng.choice(["ROLLUP", "CUBE", "SETS"])
    exprs = ", ".join(expr for _, expr in keys)
    if kind == "SETS":
        grp = (
            f"GROUPING SETS (({keys[0][1]}), ({keys[1][1]}), "
            f"({exprs}), ())"
        )
    else:
        grp = f"{kind}({exprs})"
    aggs = [_agg(rng, i, ints, dbls, strs) for i in range(rng.randint(1, 2))]
    select = [f"{expr} AS {alias}" for alias, expr in keys] + aggs
    return f"SELECT {', '.join(select)} FROM {table} GROUP BY {grp}"


def gen_setop_query(rng: random.Random) -> str:
    """Set operations: two predicated projections of the same table
    combined with UNION / UNION ALL / EXCEPT / INTERSECT, folded through
    an outer exact aggregate so result sizes stay bounded at any sf.
    Projections are integer/string only (set membership on doubles would
    hinge on bit-equality across engines — true for raw columns, but the
    int/string space already covers the operator semantics)."""
    table = rng.choice(sorted(SCHEMAS))
    ints, dbls, strs = SCHEMAS[table]
    cols = [f"{rng.choice(ints)} % {rng.randint(2, 50)} AS v0"]
    if strs and rng.random() < 0.5:
        cols.append(f"{rng.choice(strs)} AS v1")
    proj = ", ".join(cols)

    def side() -> str:
        preds = [_pred(rng, ints, dbls, strs) for _ in range(rng.randint(0, 2))]
        s = f"SELECT {proj} FROM {table}"
        if preds:
            s += " WHERE " + " AND ".join(preds)
        return s

    op = rng.choice(["UNION", "UNION ALL", "EXCEPT", "INTERSECT"])
    inner = f"{side()} {op} {side()}"
    checks = "COUNT(*) AS n_rows, CAST(SUM(v0) AS BIGINT) AS s0"
    if len(cols) > 1:
        checks += ", CAST(COUNT(DISTINCT v1) AS BIGINT) AS d1"
    return f"SELECT {checks} FROM ({inner}) t"


@pytest.fixture(scope="module")
def fuzz_env(spark, sf_dir):
    for name in SCHEMAS:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    return duck_connection(sf_dir)


def _sweep(spark, env, gen, rng, n_queries: int) -> None:
    failures = []
    for n in range(n_queries):
        sql = gen(rng)
        try:
            problems = compare(spark.sql(sql), env.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001 — record and keep fuzzing
            problems = [f"{type(e).__name__}: {str(e)[:300]}"]
        if problems:
            failures.append(f"[{n}] {sql}\n      {problems}")
    assert not failures, "\n".join(failures)


def test_random_queries_match_duckdb(spark, sf_dir, fuzz_env):
    _sweep(spark, fuzz_env, gen_query, random.Random(0xBDB5), N_QUERIES)


def test_random_rollup_queries_match_duckdb(spark, sf_dir, fuzz_env):
    _sweep(spark, fuzz_env, gen_rollup_query, random.Random(0xBDB5 + 2), 40)


def test_random_setop_queries_match_duckdb(spark, sf_dir, fuzz_env):
    _sweep(spark, fuzz_env, gen_setop_query, random.Random(0xBDB5 + 3), 40)


def gen_outer_join_query(rng: random.Random) -> str:
    """Outer/semi/anti join semantics over real FKs — the join types
    gen_query's inner-FK branch never reaches. LEFT JOIN filters the
    PARENT side pre-join (a derived-table filter, so null-extension
    semantics — not WHERE-clause demotion to inner — are what's pinned);
    EXISTS/NOT EXISTS pin semi/anti with a correlated predicate. Results
    fold through exact aggregates: row count, matched/unmatched split,
    and a BIGINT checksum of the child key so misrouted rows can't
    cancel."""
    child = rng.choice(sorted(FKS))
    parent, fk, pk = rng.choice(FKS[child])
    c_ints, c_dbls, c_strs = SCHEMAS[child]
    p_ints, p_dbls, p_strs = SCHEMAS[parent]
    kind = rng.choice(["left", "left", "exists", "not_exists"])
    parent_pred = _pred(rng, p_ints, p_dbls, p_strs)
    child_pred = _pred(rng, c_ints, c_dbls, c_strs)
    if kind == "left":
        return (
            f"SELECT COUNT(*) AS n_rows, "
            f"CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched, "
            f"CAST(SUM(c.{fk} % 10007) AS BIGINT) AS key_checksum "
            f"FROM {child} c LEFT JOIN "
            f"(SELECT * FROM {parent} WHERE {parent_pred}) p ON c.{fk} = p.{pk} "
            f"WHERE {child_pred.replace(child + '.', 'c.')}"
        )
    neg = "NOT " if kind == "not_exists" else ""
    return (
        f"SELECT COUNT(*) AS n_rows, "
        f"CAST(SUM({child}.{fk} % 10007) AS BIGINT) AS key_checksum "
        f"FROM {child} WHERE {child_pred} AND {neg}EXISTS "
        f"(SELECT 1 FROM {parent} WHERE {parent}.{pk} = {child}.{fk} "
        f"AND {parent_pred})"
    )


def test_random_outer_join_queries_match_duckdb(spark, sf_dir, fuzz_env):
    _sweep(spark, fuzz_env, gen_outer_join_query, random.Random(0xBDB5 + 4), 40)


def gen_quantile_query(rng: random.Random) -> str:
    """Discrete order-statistic fuzz (the a7c_sketch_certify pattern,
    generalized): random table, random low-cardinality group column,
    random value column, 1-3 random percentiles — the k-th value per
    group selected by explicit ROW_NUMBER at rank ceil(p*n). Ordering is
    by the value alone: under ties rn ASSIGNMENT is ambiguous, but the
    value AT rank k is the k-th order statistic — well-defined whatever
    tie permutation each engine picks — so the emitted VALUE is exact
    cross-engine with no unique-tuple requirement. This is the exact
    (non-interpolating) quantile shape the engine certifies sketches
    against; interpolated percentiles are deliberately never emitted
    (ulp-level divergence)."""
    table = rng.choice(["lineitem", "orders", "customer", "events"])
    ints, dbls, strs = SCHEMAS[table]
    grp = rng.choice(strs) if strs and rng.random() < 0.7 else None
    val = rng.choice(dbls + ints)
    where = ""
    if rng.random() < 0.4:
        where = "WHERE " + _pred(rng, ints, dbls, strs)
    ps = sorted(
        rng.sample([round(0.05 * k, 2) for k in range(1, 20)],
                   rng.randint(1, 3))
    )
    picks = ", ".join(
        f"MAX(CASE WHEN rn = CAST(ceil({p} * n) AS BIGINT)"
        f" THEN val END) AS q{i}"
        for i, p in enumerate(ps)
    )
    gcol = f"{grp} AS grp," if grp else "'all' AS grp,"
    gsel = "grp"
    return f"""
    WITH ranked AS (
        SELECT {gcol} {val} AS val,
               ROW_NUMBER() OVER (PARTITION BY {grp if grp else '1'}
                                  ORDER BY {val} ASC) AS rn,
               COUNT(*) OVER (PARTITION BY {grp if grp else '1'}) AS n
        FROM {table} {where}
    )
    SELECT {gsel}, {picks} FROM ranked GROUP BY {gsel}
    """


def test_random_quantile_queries_match_duckdb(spark, sf_dir, fuzz_env):
    _sweep(spark, fuzz_env, gen_quantile_query, random.Random(0xBDB5 + 8), 40)
