"""Randomized cross-engine fuzz of the events-table query family.

tests/test_query_fuzz.py randomizes the SQL over fixed sf data;
tests/test_stream_fuzz.py randomizes data for three stream shapes. This
file randomizes the DATA under the hand-written events catalog: seeded
event tables with the structures the sf generator never emits —
timestamp TIES (several events on the same microsecond, within and
across users: the window-ordering tiebreak stress), single-event users,
burst/gap session shapes, microsecond-adjacent events, heavy user skew,
event types missing entirely, and min/max-boundary values — then re-run
every events-only catalog query through the same builder-vs-DuckDB
harness the driver uses.

Schema contract honored (TESTDATA.md): event_id unique int64, ts
timestamp[us], user_id int64, event_type in {click,view,signup,
purchase,error}, value positive round-2 double (DECIMAL(18,2)-exact in
both engines; a20's gamma fit needs positivity), props = '{"k": <int>}'.

The 9 streaming queries run on one seed (each spins a real
availableNow stream, ~2-10 s apiece) — randomized watermark/eviction
arithmetic against the unrolled SQL oracles, incl. the multibatch
event-time TTL schedule.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_harness import run_all

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


BASE_SF = "/root/testdata/sf0.001"

BATCH_QUERIES = [
    "j7_event_span", "j13_range_join", "w1_lag_gaps", "w3_rolling_mean",
    "w5_share_of_total", "a26_argmax_per_group", "a7_distinct_counts",
    "a24_masked_pivot", "a8_relative_freq", "a15_event_sets",
    "a18_histogram_2d", "a25_cumulative", "j15_asof_join", "j16_full_outer",
    "resample_interpolate", "funnel_steps", "f_kinematics", "a17_autocorr",
    "a20_gamma_moments_fit", "a21_adaptive_window_fit", "a22_histogram_smooth",
    "a23_group_product", "a28_weighted_expectation", "j10_prior_weighted_rank",
    "w2_first_event_offset", "p11_masked_update", "p15_existence_guard",
    "a27_axis_reduce", "f13_flat_index", "f15_xor_flags", "f17_dot_projection",
    "m7_grouped_matrix", "s13_error_channel", "s15_rollup_reuse",
    "s18_compaction_roundtrip", "m5_tuning_dataset", "etl_normalize_tracking",
    "f_json_props", "skew_salted_agg", "w8_zscore_anomaly", "scd2_history",
    "markov_transitions", "sessionize_batch", "time_range_rolling",
    "time_weighted_avg", "cohort_retention", "f_variant_props",
]

STREAM_QUERIES = [
    "stream_tumbling_counts", "stream_sliding_counts", "stream_session_windows",
    "stream_dedup", "stream_interval_join", "stream_stateful_totals",
    "stream_stateful_totals_eventtime", "stream_stateful_totals_eventtime_multibatch",
    "stream_foreach_merge",
]

# events × customer — the one cross-family catalog query; runs with the
# stream seed (random events against the symlinked sf customer dim) but
# sits outside the events-only exhaustiveness guard by construction.
CROSS_FAMILY_QUERIES = ["stream_static_enrich"]

_TYPES = ["click", "view", "signup", "purchase", "error"]
_EPOCH = dt.datetime(2024, 1, 1)


def _gen_events(seed: int, n: int = 800) -> dict[str, list]:
    rng = random.Random(seed)
    n_users = rng.randint(5, 20)
    # per-seed type domain: sometimes a type is entirely absent
    types = _TYPES if rng.random() < 0.5 else rng.sample(_TYPES, rng.randint(3, 4))

    rows = []  # (us, user, type, value, k)
    us_cursor = rng.randint(0, 10**6)
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            pass  # tie: reuse cursor exactly
        elif r < 0.25:
            us_cursor += 1  # microsecond-adjacent
        elif r < 0.35:
            us_cursor += rng.randint(25, 40) * 60_000_000  # session-gap jump
        else:
            us_cursor += rng.randint(1_000, 120_000_000)
        user = rng.randint(0, n_users - 1) if rng.random() < 0.9 else 0  # skew→user 0
        value = rng.randint(1, 20000) / 100.0  # positive, 2-dec
        rows.append((us_cursor, user, rng.choice(types), value, rng.randint(0, 99)))
    # single-event user at the far end of the id space
    rows.append((us_cursor + 3_600_000_000, n_users, "view", 0.01, 0))
    # a cross-user tie bomb: every user fires on one shared microsecond
    bomb = us_cursor + 7_200_000_000
    for u in range(n_users):
        rows.append((bomb, u, rng.choice(types), 200.0, 50))
    rng.shuffle(rows)  # event_id order decorrelated from ts order
    return {
        "event_id": list(range(len(rows))),
        "ts": [_EPOCH + dt.timedelta(microseconds=r[0]) for r in rows],
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "value": [r[3] for r in rows],
        "props": ['{"k": %d}' % r[4] for r in rows],
    }


def _write_sf_dir(tmp_path, cols) -> str:
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(pa.table(cols, schema=schema), tmp_path / "events.parquet")
    from bigdatabowl_spark.sources.tables import TABLES

    for name in TABLES:
        if name != "events":
            os.symlink(f"{BASE_SF}/{name}.parquet", tmp_path / f"{name}.parquet")
    return str(tmp_path)


def test_fuzz_list_covers_every_events_only_query():
    """Exhaustiveness guard: every catalog oracle reading only the events
    table is in BATCH_QUERIES or STREAM_QUERIES."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG
    from tests.oracle_harness import oracle_tables

    only_ev = {
        n
        for n, q in CATALOG.items()
        if q.oracle and oracle_tables(q.oracle) == {"events"}
    }
    assert only_ev == set(BATCH_QUERIES) | set(STREAM_QUERIES)


@pytest.mark.parametrize("seed", [1201, 1202, 1203])
def test_events_family_fuzz_matches_oracle(spark, tmp_path, seed):
    sf = _write_sf_dir(tmp_path, _gen_events(seed))
    res = run_all(spark, sf, BATCH_QUERIES)
    assert set(res) == set(BATCH_QUERIES)
    failures = {k: v for k, v in res.items() if v}
    assert not failures, f"seed {seed}: {failures}"


@pytest.mark.parametrize("seed", [1301])
def test_events_stream_fuzz_matches_oracle(spark, tmp_path, seed):
    names = STREAM_QUERIES + CROSS_FAMILY_QUERIES
    sf = _write_sf_dir(tmp_path, _gen_events(seed))
    res = run_all(spark, sf, names)
    assert set(res) == set(names)
    failures = {k: v for k, v in res.items() if v}
    assert not failures, f"seed {seed}: {failures}"
