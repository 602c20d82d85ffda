"""Scale-pattern tests: bucketed co-located joins, skew salting.

These assert on the PHYSICAL PLAN (no exchange on bucketed joins) and on
result equivalence (salted == unsalted), because the behaviors they protect
only matter at cluster scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdatabowl_spark.operators.skew import salted_count_sum, salted_join
from bigdatabowl_spark.sources.io import write_bucketed
from bigdatabowl_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "orders_b", ["o_orderkey"])
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"]
    )
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    # at testdata scale the planner prefers broadcast (which would bypass
    # the bucketed scan entirely); force the at-scale shuffle join shape
    joined = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    # co-located: neither side shuffles (bucketed scans line up)
    assert "Exchange hashpartitioning" not in plan
    # and the join result is right
    assert joined.count() == li.count()


def test_salted_agg_matches_unsalted(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type): (r.n, round(r.total, 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.total, 6))
        for r in salted_count_sum(ev, "event_type", "value", "event_id").collect()
    }
    assert salted == plain


def test_salted_join_matches_unsalted(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", big_id_col="l_linenumber", n_salts=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(*plain.columns).collect()}
    assert a == b


def test_cpu_delta_is_reap_aware():
    """bench._cpu_delta_sec (ADVICE r7): a worker reaped between samples
    must contribute its CPU via the parent's cutime/cstime roll-up, with
    the vanished pid's pre-window CPU subtracted back out — not silently
    dropped (the old undercount) and not double-counted."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from bench import _cpu_delta_sec

    # live-only growth: two pids each gain 2s self CPU
    start = {1: (10.0, 0.0), 2: (5.0, 0.0)}
    end = {1: (12.0, 0.0), 2: (7.0, 0.0)}
    assert _cpu_delta_sec(start, end) == 4.0

    # pid 2 reaped mid-window after burning 3 more seconds: it vanishes
    # from `end`, its 8s lifetime rolls into pid 1's reaped column; the
    # correct attribution is 2s (pid 1) + 3s (pid 2 post-start) = 5s
    start = {1: (10.0, 0.0), 2: (5.0, 0.0)}
    end = {1: (12.0, 8.0)}
    assert _cpu_delta_sec(start, end) == 5.0

    # a pid spawned AND reaped inside the window contributes fully
    start = {1: (10.0, 0.0)}
    end = {1: (10.0, 6.0)}
    assert _cpu_delta_sec(start, end) == 6.0

    # orphaned-to-init vanish (no roll-up anywhere): the vanished pid's
    # pre-window CPU must NOT be subtracted (nothing rolled up to double
    # count) — live processes' genuine work survives
    start = {1: (10.0, 0.0), 2: (5.0, 0.0)}
    end = {1: (10.0, 0.0)}
    assert _cpu_delta_sec(start, end) == 0.0

    # the m6 case that motivated the cap: the driver burns 2s while idle
    # workers (5s pre-window CPU each) are killed un-waited — the uncapped
    # rule reported 0.0, erasing the driver's work
    start = {1: (10.0, 0.0), 2: (5.0, 0.0), 3: (5.0, 0.0)}
    end = {1: (12.0, 0.0)}
    assert _cpu_delta_sec(start, end) == 2.0

    # mixed: one worker properly reaped mid-window (8s lifetime rolls into
    # pid 1's cutime), one killed un-waited. Which vanished pid rolled up
    # is unknowable from /proc, so the cap subtracts min(vanished, rolled)
    # = 8 — a conservative LOWER bound (true in-window CPU here is 5: the
    # reaped worker's post-start 3s is under-credited), never negative and
    # never erasing live work like the uncapped rule did
    start = {1: (10.0, 0.0), 2: (5.0, 0.0), 3: (4.0, 0.0)}
    end = {1: (12.0, 8.0)}
    assert _cpu_delta_sec(start, end) == 2.0
