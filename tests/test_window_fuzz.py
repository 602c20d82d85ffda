"""Seeded cross-engine WINDOW-function fuzzing: randomly generated
ranking / lag-lead / cumulative / framed / partition-aggregate window
queries run through BOTH Spark and DuckDB from the SAME SQL string.
`test_query_fuzz.py` pins the grouped-aggregate long tail; this pins the
window long tail (SURVEY §2 W1–W7) — frame composition, partition-key
shapes, and order tiebreaks the 166 hand-written catalog queries can't
enumerate.

Determinism by construction (the generator emits nothing else):
  - every ORDER BY ends in a tiebreak column list verified UNIQUE at
    sf0.001/0.01/0.1 (lineitem needs all six int/string columns — the
    synthetic (l_orderkey, l_linenumber) is NOT unique, 1161 dup groups
    at sf0.001), so ROW_NUMBER/LAG/LEAD/FIRST_VALUE and running frames
    are row-order-independent;
  - RANK/DENSE_RANK order by a possibly-tied raw int column — fine,
    their output depends only on order-key VALUES, never row order;
    likewise value-based RANGE frames (all peers included by value);
  - window inputs for SUM-kinds are bucketed (`col % 1009`) so the
    worst-case cumulative × weight × outer-sum product stays far inside
    BIGINT even at sf0.1;
  - only integer-valued window outputs (exact in both engines); the
    outer query folds them through a position-sensitive checksum
    SUM(w * (1 + pk % 97)) — misaligned rows can't cancel out —
    grouped by a bounded key, CAST to BIGINT (DuckDB widens to HUGEINT).

Seeds are fixed: every failure is reproducible by its printed SQL.
"""

from __future__ import annotations

import random

import pytest

from tests.oracle_harness import compare, duck_connection
from tests.test_query_fuzz import SCHEMAS, _pred

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


# table -> ORDER BY column list whose tuple is unique at every shipped sf
# (verified by COUNT(DISTINCT concat) == COUNT(*) at sf0.001/0.01/0.1)
ORDER_KEYS = {
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus",
    ],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}

N_QUERIES = 60


def _win(rng: random.Random, pp: str, okey: str, ints) -> str:
    """One integer-valued, deterministic-by-construction window expr."""
    kind = rng.choice(
        ["rn", "rnk", "drnk", "lag", "lead", "cum", "frame", "vrange",
         "pagg", "fv"]
    )
    c = rng.choice(ints)
    small = f"{c} % 1009"  # bounded input for sum-kinds (overflow headroom)
    if kind == "rn":
        return f"ROW_NUMBER() OVER ({pp}ORDER BY {okey})"
    if kind == "rnk":
        return f"RANK() OVER ({pp}ORDER BY {c})"
    if kind == "drnk":
        return f"DENSE_RANK() OVER ({pp}ORDER BY {c})"
    if kind == "lag":
        return f"LAG({small}, {rng.randint(1, 3)}, 0) OVER ({pp}ORDER BY {okey})"
    if kind == "lead":
        return f"LEAD({small}, {rng.randint(1, 3)}, 0) OVER ({pp}ORDER BY {okey})"
    if kind == "cum":
        return f"SUM({small}) OVER ({pp}ORDER BY {okey})"
    if kind == "frame":
        n = rng.randint(1, 20)
        return (
            f"SUM({small}) OVER ({pp}ORDER BY {okey} "
            f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW)"
        )
    if kind == "vrange":
        # value-based RANGE frame over a single (possibly tied) int order
        # key — deterministic even with ties, because the frame is defined
        # by order-key VALUES (all peers included), never row position
        n = rng.randint(1, 1000)
        return (
            f"SUM({small}) OVER ({pp}ORDER BY {c} "
            f"RANGE BETWEEN {n} PRECEDING AND CURRENT ROW)"
        )
    if kind == "pagg":
        fn = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
        arg = small if fn == "SUM" else c
        return f"{fn}({arg}) OVER ({pp.rstrip()})" if pp else f"{fn}({arg}) OVER ()"
    return f"FIRST_VALUE({c}) OVER ({pp}ORDER BY {okey})"


def gen_window_query(rng: random.Random) -> str:
    table = rng.choice(sorted(ORDER_KEYS))
    ints, dbls, strs = SCHEMAS[table]
    okey = ", ".join(ORDER_KEYS[table])
    pk = ints[0]  # dense-ish int key for the position-sensitive weight

    # partition: string col / bucketed int / global
    roll = rng.random()
    if roll < 0.45 and strs:
        pp = f"PARTITION BY {rng.choice(strs)} "
    elif roll < 0.85:
        pp = f"PARTITION BY {rng.choice(ints)} % {rng.randint(2, 8)} "
    else:
        pp = ""

    wins = [_win(rng, pp, okey, ints) for _ in range(rng.randint(1, 3))]
    preds = [_pred(rng, ints, dbls, strs) for _ in range(rng.randint(0, 1))]

    inner_cols = [f"(1 + {pk} % 97) AS wt"]
    inner_cols += [f"{w} AS w{i}" for i, w in enumerate(wins)]

    # outer group key keeps result sizes bounded at any sf
    if rng.random() < 0.6:
        if strs and rng.random() < 0.5:
            gexpr = rng.choice(strs)
        else:
            gexpr = f"{rng.choice(ints)} % {rng.randint(2, 12)}"
        inner_cols.append(f"{gexpr} AS grp")
        group = " GROUP BY grp"
        sel_grp = "grp, "
    else:
        group = ""
        sel_grp = ""

    inner = f"SELECT {', '.join(inner_cols)} FROM {table}"
    if preds:
        inner += " WHERE " + " AND ".join(preds)

    checks = ", ".join(
        f"CAST(SUM(w{i} * wt) AS BIGINT) AS c{i}" for i in range(len(wins))
    )
    return (
        f"SELECT {sel_grp}{checks}, COUNT(*) AS n_rows "
        f"FROM ({inner}) t{group}"
    )


@pytest.fixture(scope="module")
def win_fuzz_env(spark, sf_dir):
    for name in ORDER_KEYS:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    return duck_connection(sf_dir)


def test_random_window_queries_match_duckdb(spark, sf_dir, win_fuzz_env):
    rng = random.Random(0xBDB5 + 1)
    failures = []
    for n in range(N_QUERIES):
        sql = gen_window_query(rng)
        try:
            problems = compare(spark.sql(sql), win_fuzz_env.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001 — record and keep fuzzing
            problems = [f"{type(e).__name__}: {str(e)[:300]}"]
        if problems:
            failures.append(f"[{n}] {sql}\n      {problems}")
    assert not failures, "\n".join(failures)
