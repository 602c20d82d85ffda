"""Structured Streaming twin agrees with the batch tumbling-window query."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdatabowl_spark.streaming.events import tumbling_counts_batch, tumbling_counts_stream, WINDOW_US


def _atomic_write_parquet(pdf, dest) -> None:
    """Write a feed file OUTSIDE the streaming source's visible namespace,
    then rename into place. A parquet written in-place can be listed by
    FileStreamSource mid-write: the truncated footer kills the query, and
    the test's wait_for then polls a dead stream to timeout (observed
    once in-suite for the dedup readmission test — the row 'never
    arrived' because the query had died on the partial file). Dot-prefixed
    names are invisible to Spark's file index; os.replace is atomic on
    the same filesystem."""
    import os

    dest = str(dest)
    d, base = os.path.split(dest)
    tmp = os.path.join(d, f".tmp_{base}")
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, dest)


def test_stream_matches_batch(spark, sf_dir):
    batch = (
        tumbling_counts_batch(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.sum("n").alias("total"))
    )
    batch_counts = {r.event_type: r.total for r in batch.collect()}

    stream_df = tumbling_counts_stream(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, SUM(n) AS total FROM tumbling_test GROUP BY event_type"
    ).collect()
    stream_counts = {r.event_type: r.total for r in got}
    assert stream_counts == batch_counts

    # window ids line up with the batch epoch arithmetic
    win = spark.sql("SELECT DISTINCT window_start_us FROM tumbling_test").collect()
    assert all(r.window_start_us % WINDOW_US == 0 for r in win)


def test_session_stream_matches_batch(spark, sf_dir, tmp_path):
    """The stateful MERGING-window operator: streaming session_window under
    a watermark must emit exactly the batch operator's sessions, row for
    row — on sf data AND on fuzz data with exact whole-minute gap jumps
    and tie bombs (the boundary class test_events_fuzz pinned on the batch
    side: an event exactly gap after the last MERGES)."""
    from bigdatabowl_spark.sources.tables import load_table
    from bigdatabowl_spark.streaming.events import (
        SESSION_GAP_US,
        session_windows_batch,
        session_windows_stream,
    )
    from tests.test_events_fuzz import _gen_events, _write_sf_dir

    def run_twin(tag, data_dir, mode):
        q = (
            session_windows_stream(spark, data_dir)
            .writeStream.format("memory")
            .queryName(f"session_twin_{tag}")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.user_id, r.session_start_us, r.n_events)
            for r in spark.sql(f"SELECT * FROM session_twin_{tag}").collect()
        )

    for tag, data_dir in (
        ("sf", sf_dir),
        ("fuzz", _write_sf_dir(tmp_path, _gen_events(777))),
    ):
        want = sorted(
            (r.user_id, r.session_start_us, r.n_events)
            for r in session_windows_batch(spark, data_dir).collect()
        )
        assert want, f"{tag}: no sessions produced"
        got = run_twin(f"{tag}_complete", data_dir, "complete")
        assert got == want, f"{tag}: complete-mode stream diverges from batch"

    # Append mode emits exactly the sessions the final watermark closes:
    # end (= last event + gap) <= max_ts - delay. Sessions whose last
    # event falls within (gap + delay) of the global max stay in state —
    # correct unbounded semantics, pinned here via a python islands
    # replay that recomputes each session's last-event time. sf data
    # only: its microsecond-random stamps can't tie the eviction
    # boundary, so the <= vs < edge can't flap the assertion.
    rows = sorted(
        (r.user_id, r.ts_us, r.event_id)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "ts_us", "event_id")
        .collect()
    )
    max_ts = max(ts for _, ts, _ in rows)
    sessions: dict[tuple, tuple] = {}  # (user, start) -> (n, last)
    cur: dict[int, tuple] = {}  # user -> (start, n, last)
    for user, ts, _eid in rows:
        if user in cur and ts - cur[user][2] <= SESSION_GAP_US:
            start, n, _ = cur[user]
            cur[user] = (start, n + 1, ts)
        else:
            if user in cur:
                start, n, last = cur[user]
                sessions[(user, start)] = (n, last)
            cur[user] = (ts, 1, ts)
    for user, (start, n, last) in cur.items():
        sessions[(user, start)] = (n, last)
    delay_us = 1_800_000_000  # the twin's 30-minute watermark
    expected_append = sorted(
        (user, start, n)
        for (user, start), (n, last) in sessions.items()
        if last + SESSION_GAP_US <= max_ts - delay_us
    )
    got_append = run_twin("sf_append", sf_dir, "append")
    assert got_append == expected_append, "append-mode watermark-closure set diverges"
    assert len(got_append) < len(sessions), "tail session unexpectedly flushed"


def test_sliding_stream_matches_batch(spark, sf_dir, tmp_path):
    """Sliding-window twin: the streaming window(10m, 5m) operator must
    reproduce the batch query's explicit explode-2-windows expansion
    row-for-row — on sf data and on fuzz data with tie bombs and
    whole-minute jumps (window-boundary-exact timestamps)."""
    from bigdatabowl_spark.streaming.events import (
        sliding_counts_batch,
        sliding_counts_stream,
    )
    from tests.test_events_fuzz import _gen_events, _write_sf_dir

    for tag, data_dir in (
        ("sf", sf_dir),
        ("fuzz", _write_sf_dir(tmp_path, _gen_events(999))),
    ):
        want = sorted(
            (r.window_start_us, r.event_type, r.n, r.window_value)
            for r in sliding_counts_batch(spark, data_dir).collect()
        )
        assert want, f"{tag}: no windows produced"
        q = (
            sliding_counts_stream(spark, data_dir)
            .writeStream.format("memory")
            .queryName(f"sliding_twin_{tag}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.window_start_us, r.event_type, r.n, r.window_value)
            for r in spark.sql(f"SELECT * FROM sliding_twin_{tag}").collect()
        )
        assert got == want, f"{tag}: sliding stream diverges from batch"


@pytest.mark.parametrize(
    "seed,n_files,rocksdb",
    [(888, 5, False), (889, 3, True), (890, 7, False)],
)
def test_session_multibatch_merge(spark, tmp_path, seed, n_files, rocksdb):
    """Cross-batch session merging: fuzz events split ts-sorted into
    `n_files` feed files, streamed one file per micro-batch. Sessions
    spanning file boundaries live in the state store between merges; the
    sorted split keeps every later batch ahead of the earlier watermark
    (no late drops), so the final complete-mode result must equal the
    one-shot batch operator exactly — under the default heap provider AND
    under RocksDB (the 100 TB state posture; session-merge state
    semantics must be provider-independent)."""
    import pandas as pd

    from bigdatabowl_spark.streaming.events import (
        session_windows_batch,
        session_windows_stream,
    )
    from tests.test_events_fuzz import _gen_events, _write_sf_dir

    data_dir = _write_sf_dir(tmp_path, _gen_events(seed))
    want = sorted(
        (r.user_id, r.session_start_us, r.n_events)
        for r in session_windows_batch(spark, data_dir).collect()
    )

    stage = tmp_path / "session_feed"
    stage.mkdir()
    pdf = pd.read_parquet(f"{data_dir}/events.parquet").sort_values(
        ["ts", "event_id"], ignore_index=True
    )
    for i in range(n_files):
        chunk = pdf.iloc[i * len(pdf) // n_files : (i + 1) * len(pdf) // n_files]
        _atomic_write_parquet(chunk, stage / f"feed_{i:02d}.parquet")

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    if rocksdb:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        q = (
            session_windows_stream(
                spark, data_dir, stage=str(stage), max_files_per_trigger=1
            )
            .writeStream.format("memory")
            .queryName(f"session_multibatch_{seed}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if rocksdb:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    got = sorted(
        (r.user_id, r.session_start_us, r.n_events)
        for r in spark.sql(f"SELECT * FROM session_multibatch_{seed}").collect()
    )
    assert n_batches >= n_files, f"expected >= {n_files} data batches, got {n_batches}"
    assert got == want, "multibatch session merge diverges from batch operator"


def _run_session_feed(spark, tmp_path, batches, name):
    """Stage one file per batch (mtime-ordered) and run the session twin
    append-mode to a memory sink. Returns (sorted rows, total rows dropped
    by watermark across batches)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq_
    from bigdatabowl_spark.streaming.events import session_windows_stream

    schema = pa.schema(
        [
            ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()), ("event_type", pa.string()),
            ("value", pa.float64()), ("props", pa.string()),
        ]
    )
    stage = tmp_path / f"feed_{name}"
    stage.mkdir()
    now = time.time()
    eid = 0
    for i, rows in enumerate(batches):
        dest = str(stage / f"feed_{i:02d}.parquet")
        pq_.write_table(
            pa.table(
                {
                    "event_id": list(range(eid, eid + len(rows))),
                    "ts": [r[0] for r in rows],
                    "user_id": [r[1] for r in rows],
                    "event_type": ["click"] * len(rows),
                    "value": [1.0] * len(rows),
                    "props": ['{"k": 1}'] * len(rows),
                },
                schema=schema,
            ),
            dest,
        )
        eid += len(rows)
        os.utime(dest, (now - 100 + i, now - 100 + i))
    q = (
        session_windows_stream(
            spark, str(tmp_path), stage=str(stage), max_files_per_trigger=1
        )
        .writeStream.format("memory")
        .queryName(f"session_late_{name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = sorted(
        (r.user_id, r.session_start_us, r.n_events)
        for r in spark.sql(f"SELECT * FROM session_late_{name}").collect()
    )
    return rows, dropped


def test_session_late_data_drop_semantics(spark, tmp_path):
    """Pin the measured LATE-DROP rule for streaming session windows: the
    watermark that FILTERS input lags one batch behind the one progress
    displays (Spark's classic rule — batch N filters with the watermark
    computed after batch N-2's data). Two handcrafted feeds, one file per
    micro-batch, 30-min gap = 30-min delay:

    LAG-ADMIT: [u1@10:00] [u5@13:00] [u1@10:05] [u7@23:00] — the 10:05
    row is 'late' vs the displayed 12:30 watermark, but the filter
    watermark during its batch is still 9:30, so it is ADMITTED and
    merges into u1's still-unevicted session (eviction lags identically).
    No rows dropped; no duplicate or overlapping session is ever emitted.

    TRUE-DROP: [u1@10:00] [u5@13:00] [u6@14:00] [u1@10:05] [u7@23:00] —
    one extra batch advances the filter watermark to 12:30 before the
    late row arrives; its session end (10:35) is below that, so it is
    DROPPED (numRowsDroppedByWatermark = 1) and u1's already-emitted
    session stays at 1 event — the drop is what PREVENTS an overlapping
    duplicate session in append mode.

    Both feeds leave the sentinel u7 session (end 23:30 > final watermark
    22:30) unflushed — the append-tail rule test_session_stream_matches_
    batch pins on sf data."""
    import datetime as dt

    D = dt.datetime(2024, 1, 5)
    t = lambda h, m: D + dt.timedelta(hours=h, minutes=m)  # noqa: E731
    to_us = lambda d: int((d - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)  # noqa: E731

    got, dropped = _run_session_feed(
        spark, tmp_path,
        [[(t(10, 0), 1)], [(t(13, 0), 5)], [(t(10, 5), 1)], [(t(23, 0), 7)]],
        "lag_admit",
    )
    assert dropped == 0
    assert got == sorted(
        [(1, to_us(t(10, 0)), 2), (5, to_us(t(13, 0)), 1)]
    ), f"lag-admit semantics changed: {got}"

    got, dropped = _run_session_feed(
        spark, tmp_path,
        [[(t(10, 0), 1)], [(t(13, 0), 5)], [(t(14, 0), 6)],
         [(t(10, 5), 1)], [(t(23, 0), 7)]],
        "true_drop",
    )
    assert dropped == 1, f"expected exactly the late row dropped, got {dropped}"
    assert got == sorted(
        [(1, to_us(t(10, 0)), 1), (5, to_us(t(13, 0)), 1), (6, to_us(t(14, 0)), 1)]
    ), f"true-drop semantics changed: {got}"


def test_stateful_running_totals(spark, sf_dir):
    """applyInPandasWithState running totals equal the batch aggregate
    after one availableNow pass."""
    from bigdatabowl_spark.sources.tables import load_table
    from bigdatabowl_spark.streaming.events import (
        drain_available_now,
        stateful_user_totals,
    )

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    expected = {r.user_id: r.n for r in batch.collect()}

    q = (
        stateful_user_totals(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    got = spark.sql(
        "SELECT user_id, MAX(n_events) AS n FROM stateful_test GROUP BY user_id"
    ).collect()
    assert {r.user_id: r.n for r in got} == expected


def test_drain_survives_zero_row_file_mid_queue(spark, tmp_path):
    """ADVICE r7: a single completed zero-input batch is NOT proof of
    drain — with maxFilesPerTrigger=1 and a ZERO-ROW parquet file in the
    middle of the queue, one batch legitimately processes 0 rows while a
    later file still holds data. drain_available_now must keep going
    (it requires two consecutive distinct zero-input batches) and the
    final totals must include the post-empty-file rows."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.streaming.events import (
        STATEFUL_SCHEMA,
        _STATE_SCHEMA,
        _running_totals,
        drain_available_now,
    )

    src = tmp_path / "src"
    src.mkdir()
    # lexicographic file order = processing order under maxFilesPerTrigger=1
    pd.DataFrame({"user_id": [1, 1], "value": [1.25, 2.0]}).to_parquet(
        str(src / "a.parquet"), index=False
    )
    pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                  "value": pd.Series([], dtype="float64")}).to_parquet(
        str(src / "b_empty.parquet"), index=False
    )
    pd.DataFrame({"user_id": [1], "value": [0.75]}).to_parquet(
        str(src / "c.parquet"), index=False
    )

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _running_totals(key, pdfs, state),
            outputStructType=STATEFUL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("drain_midqueue_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    rows = spark.sql(
        "SELECT MAX(n_events) AS n, MAX(total_value) AS v"
        " FROM drain_midqueue_test"
    ).collect()[0]
    # all three data rows counted — a drain that stopped at the empty
    # file's zero-input batch would report n=2, v=3.25
    assert (rows.n, rows.v) == (3, 4.0), rows


def test_drain_survives_adjacent_zero_row_files(spark, tmp_path):
    """ADVICE r8: TWO ADJACENT zero-row files mid-queue each complete a
    distinct 0-row batch under maxFilesPerTrigger=1 — a drain signal based
    only on 'two consecutive zero-input batches' would false-drain between
    them while a later file still holds data. The strengthened protocol
    also requires the sources' endOffset to be UNCHANGED across the
    streak; consuming an empty file advances the log offset, so neither
    empty-file batch counts, and the post-empties rows must land."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.streaming.events import (
        STATEFUL_SCHEMA,
        _STATE_SCHEMA,
        _running_totals,
        drain_available_now,
    )

    src = tmp_path / "src2"
    src.mkdir()
    empty = {
        "user_id": pd.Series([], dtype="int64"),
        "value": pd.Series([], dtype="float64"),
    }
    pd.DataFrame({"user_id": [7], "value": [1.5]}).to_parquet(
        str(src / "a.parquet"), index=False
    )
    pd.DataFrame(empty).to_parquet(str(src / "b_empty.parquet"), index=False)
    pd.DataFrame(empty).to_parquet(str(src / "c_empty.parquet"), index=False)
    pd.DataFrame({"user_id": [7, 7], "value": [2.25, 0.25]}).to_parquet(
        str(src / "d.parquet"), index=False
    )

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _running_totals(key, pdfs, state),
            outputStructType=STATEFUL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("drain_adjacent_empties_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    rows = spark.sql(
        "SELECT MAX(n_events) AS n, MAX(total_value) AS v"
        " FROM drain_adjacent_empties_test"
    ).collect()[0]
    # a false-drain between the two empty-file batches reports n=1, v=1.5
    assert (rows.n, rows.v) == (3, 4.0), rows


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """Kill/restart robustness: a checkpointed file-source stream that dies
    mid-stream and is restarted over a grown input directory must emit every
    input row exactly once (no loss from the first run, no reprocessing on
    resume). This is the recovery contract a 6-hour 100 TB ingest relies on."""
    import pyspark.sql.functions as F

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.write.mode("overwrite").parquet(str(src / "batch1"))

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # first run sees only half1, then "dies"
    half2.write.mode("overwrite").parquet(str(src / "batch2"))
    run_once()  # restart from checkpoint over the grown directory

    got = spark.read.parquet(str(sink))
    assert got.count() == events.count()  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == events.count()


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """Late-data contract: an aggregate row whose window closed (watermark
    passed end-of-window) must not change when a too-late event arrives in
    a later micro-batch — bounded state depends on actually dropping late
    rows. Uses append mode, where only finalized windows are emitted."""
    import pandas as pd
    import pyspark.sql.functions as F

    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, rows):
        _atomic_write_parquet(
            pd.DataFrame(rows, columns=["event_time", "k"]).astype(
                {"event_time": "datetime64[us]"}
            ),
            src / f"{name}.parquet",
        )

    # batch 1: two events in window [00:00, 00:10) + one at 01:00 that
    # advances the watermark (10 min) far past that window's end
    write_batch(
        "b1",
        [("2026-01-01 00:01:00", 1), ("2026-01-01 00:02:00", 1),
         ("2026-01-01 01:00:00", 1)],
    )

    def run_once():
        stream = spark.readStream.schema("event_time timestamp_ntz, k int").parquet(
            str(src)
        )
        q = (
            stream.withColumn("event_time", F.col("event_time").cast("timestamp"))
            .withWatermark("event_time", "10 minutes")
            .groupBy(F.window("event_time", "10 minutes"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").cast("string").alias("w"), "n")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: a LATE event for the closed [00:00, 00:10) window
    write_batch("b2", [("2026-01-01 00:03:00", 1)])
    run_once()

    got = {
        r.w: r.n
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    assert got.get("2026-01-01 00:00:00") == 2, got  # late row NOT counted


def test_npy_stream_source_incremental_discovery(spark, tmp_path):
    """ST9 source: files appearing between micro-batches are picked up by
    the next offset range, and already-consumed files are not re-emitted."""
    import numpy as np

    from bigdatabowl_spark.sources.npy_source import NpyArtifactStreamSource

    spark.dataSource.register(NpyArtifactStreamSource)
    d = tmp_path / "arts"
    d.mkdir()
    np.save(d / "a.npy", np.array([1.5, 2.5]))
    q = (
        spark.readStream.format("npy_artifact_stream")
        .option("path", str(d))
        .load()
        .writeStream.format("memory")
        .queryName("npy_stream_inc")
        .start()
    )
    import time

    try:
        q.processAllAvailable()
        assert spark.table("npy_stream_inc").count() == 2
        np.save(d / "b.npy", np.array([9.0]))
        # the simple-reader prefetch thread may have cached a pre-b offset
        # range just before the save; drain until the new file lands
        for _ in range(30):
            q.processAllAvailable()
            if spark.table("npy_stream_inc").count() >= 3:
                break
            time.sleep(0.5)
        rows = sorted(
            (r["file"], r["idx"], r["value"])
            for r in spark.table("npy_stream_inc").collect()
        )
    finally:
        q.stop()
    assert rows == [("a", 0, 1.5), ("a", 1, 2.5), ("b", 0, 9.0)]


def test_interval_join_across_micro_batches(spark, sf_dir, tmp_path):
    """The stream-stream interval join must not drop matches that span
    micro-batches: purchases and errors are split into SEPARATE files and
    fed one file per trigger, so every join pair crosses a micro-batch
    boundary — the buffered side must survive in state until its partner
    arrives (the edge VERDICT r4 flagged; the wide verification watermark
    is what keeps state alive here)."""
    import shutil

    from bigdatabowl_spark.session import configure
    from bigdatabowl_spark.sources.tables import epoch_us_col

    configure(spark)
    ev = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    d = tmp_path / "ev_split"
    d.mkdir()
    for i, etype in enumerate(["purchase", "error"]):
        staged = tmp_path / f"stage_{etype}"
        ev.filter(F.col("event_type") == etype).coalesce(1).write.parquet(str(staged))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, d / f"{i:02d}_{etype}.parquet")

    # batch expectation over the same split files
    b = spark.read.parquet(str(d))
    bt = b.withColumn("t", epoch_us_col(b, "ts"))
    be = bt.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_event"), F.col("user_id").alias("u"), F.col("t").alias("et")
    )
    bp = bt.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event"), F.col("user_id").alias("pu"), F.col("t").alias("pt")
    )
    expected = sorted(
        (r.err_event, r.p_event)
        for r in be.join(
            bp,
            (F.col("pu") == F.col("u"))
            & (F.col("pt") >= F.col("et") - 7_200_000_000)
            & (F.col("pt") < F.col("et")),
        ).select("err_event", "p_event").collect()
    )
    assert expected, "split produced no join pairs — test data assumption broken"

    def _side(event_type: str, prefix: str):
        stream = (
            spark.readStream.schema(b.schema)
            .option("maxFilesPerTrigger", 1)  # force one file per micro-batch
            .parquet(str(d))
        )
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
            .withWatermark(f"{prefix}_time", "3650 days")
        )

    err, pur = _side("error", "err"), _side("purchase", "p")
    joined = err.join(
        pur,
        (F.col("p_user") == F.col("err_user"))
        & (F.col("p_time") >= F.col("err_time") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("p_time") < F.col("err_time")),
        "inner",
    ).select("err_event", "p_event")
    q = (
        joined.writeStream.format("memory")
        .queryName("ivjoin_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    got = sorted(
        (r.err_event, r.p_event)
        for r in spark.table("ivjoin_multibatch").collect()
    )
    assert n_batches >= 2, "join never split into multiple micro-batches"
    assert got == expected


def test_foreach_merge_replay_idempotent(spark, sf_dir, tmp_path):
    """The versioned-dir merge sink's exactly-once claim under retry: a
    replayed batch (same batch_id, same input — what Spark re-delivers
    after a driver restart mid-commit) rewrites its state version from the
    same disk predecessor and leaves the final state bit-identical."""
    import pyspark.sql.functions as F

    from bigdatabowl_spark.streaming.events import (
        merge_keyed_batch,
        merge_state_dirs,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b0 = ev.filter(F.col("user_id") % 2 == 0)
    b1 = ev.filter(F.col("user_id") % 2 == 1)
    root = str(tmp_path / "state")
    (tmp_path / "state").mkdir()

    def snapshot():
        latest = merge_state_dirs(root)[-1][1]
        rows = (
            spark.read.parquet(latest)
            .select("user_id", "n_events", F.col("total_dec").cast("string"))
            .collect()
        )
        return sorted(map(tuple, rows))

    merge_keyed_batch(root, b0, 0)
    merge_keyed_batch(root, b1, 1)
    first = snapshot()

    # replay batch 1 (retry after a simulated failed commit)
    merge_keyed_batch(root, b1, 1)
    assert snapshot() == first

    # replay batch 0 too: its rewrite must not corrupt the chain — batch 1's
    # version stays the authoritative latest and is untouched
    merge_keyed_batch(root, b0, 0)
    assert snapshot() == first
    assert [bid for bid, _ in merge_state_dirs(root)] == [0, 1]

    # multi-batch composition: the merged state equals the one-shot global
    # aggregate (availableNow often delivers a single micro-batch, so the
    # prior-merge path is pinned here, not by the catalog query)
    expected = sorted(
        map(
            tuple,
            ev.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("string"),
            )
            .collect(),
        )
    )
    assert snapshot() == expected


def test_stateful_totals_under_rocksdb_state_store(spark, sf_dir):
    """The state-store scale path: the default HDFS-backed provider keeps
    every key's state on the executor HEAP — at 10^8 users it OOMs. The
    RocksDB provider spills state to local disk with an in-memory block
    cache, which is the 100 TB posture for any high-cardinality stateful
    stream. Running the SAME applyInPandasWithState query under RocksDB
    must produce identical totals (state semantics are provider-
    independent) — this pins that nothing in our stateful operators
    assumes the heap provider."""
    from bigdatabowl_spark.sources.tables import load_table
    from bigdatabowl_spark.streaming.events import (
        drain_available_now,
        stateful_user_totals,
    )

    expected = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            stateful_user_totals(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("stateful_rocksdb_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
        assert not q.isActive, "stream did not drain within the deadline"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = spark.sql(
        "SELECT user_id, MAX(n_events) AS n FROM stateful_rocksdb_test"
        " GROUP BY user_id"
    ).collect()
    assert {r.user_id: r.n for r in got} == expected


def test_eventtime_ttl_provider_independent(spark, sf_dir):
    """The event-time TTL variant under the RocksDB state store must
    produce the EXACT catalog-query output — eviction timestamps live in
    the state rows, so provider-independence here covers the timeout
    machinery (setTimeoutTimestamp persistence), not just the totals."""
    from bigdatabowl_spark.plans.catalog import CATALOG

    q = CATALOG["stream_stateful_totals_eventtime"]
    baseline = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in q.builder(spark, sf_dir).collect()
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = sorted(
            (r.user_id, r.n_events, r.total_value)
            for r in q.builder(spark, sf_dir).collect()
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == baseline
    assert any(n == -1 for _, n, _ in got)  # tombstones fired under RocksDB


def test_state_ttl_evicts_idle_keys_and_resets(spark, tmp_path):
    """ST4 state TTL (VERDICT r6 item 5): a key idle past the processing-
    time TTL is EVICTED — the operator emits a tombstone (n_events = -1)
    and removes its state — and a later re-arrival restarts the running
    total from ZERO, proving the state was truly dropped, not cached.
    Uses a tiny TTL and a file-source stream fed incrementally."""
    import time

    import pandas as pd
    import pyspark.sql.functions as F  # noqa: F811
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.streaming.events import (
        STATEFUL_SCHEMA,
        _STATE_SCHEMA,
        _running_totals,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def feed(name, rows):
        _atomic_write_parquet(
            pd.DataFrame(rows, columns=["user_id", "value"]), src / name
        )

    feed("b0.parquet", [(1, 1.25), (1, 2.00), (2, 5.50)])

    stream = (
        spark.readStream.schema("user_id long, value double")
        .parquet(str(src))
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _running_totals(key, pdfs, state, 1500),
            outputStructType=STATEFUL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ttl_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def rows():
        return {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.table("ttl_test").collect()
        }

    def wait_for(pred, timeout=180):
        t0 = time.time()
        while time.time() - t0 < timeout:
            exc = q.exception()
            if exc is not None:
                raise exc  # dead query: fail loud, not as a 60 s timeout
            if pred(rows()):
                return True
            time.sleep(0.3)
        return False

    try:
        assert wait_for(lambda s: (1, 2, 3.25) in s and (2, 1, 5.5) in s), rows()
        # idle past TTL: empty micro-batches still fire processing-time
        # timeouts; both keys evict with tombstones carrying final totals
        assert wait_for(
            lambda s: (1, -1, 3.25) in s and (2, -1, 5.5) in s
        ), rows()
        # re-arrival AFTER eviction restarts from zero — n_events is 1,
        # not 3, so the state was genuinely removed
        feed("b1.parquet", [(1, 0.75)])
        assert wait_for(lambda s: (1, 1, 0.75) in s), rows()
        assert (1, 3, 4.0) not in rows()
    finally:
        q.stop()


def test_eventtime_ttl_replay_is_deterministic(spark, sf_dir):
    """VERDICT r7 item 3: event-time TTL eviction is a pure function of
    the DATA — the same input replayed must produce byte-identical output,
    tombstones included (the processing-time variant provably cannot make
    this promise: its eviction clock is the wall). Two full runs of the
    catalog query, exact float equality, and the run must actually
    tombstone a nontrivial share of keys (~40% at the 8 h TTL)."""
    from bigdatabowl_spark.plans.catalog import CATALOG

    q = CATALOG["stream_stateful_totals_eventtime"]
    a = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in q.builder(spark, sf_dir).collect()
    )
    b = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in q.builder(spark, sf_dir).collect()
    )
    assert a == b  # bit-identical, tombstone timing included
    n_tomb = sum(1 for _, n, _ in a if n == -1)
    assert 0 < n_tomb < len(a), (n_tomb, len(a))


def test_eventtime_ttl_evicts_and_readmits(spark, tmp_path):
    """Event-time TTL across restarts, with NO wall-clock sleeps: a key
    whose last event is > TTL older than the advancing watermark is
    evicted (tombstone, state removed); a post-eviction re-arrival
    restarts from zero. The eviction decision rides the data's own clock
    — file b0 carries one stale key and one fresh key, so the watermark
    raised by the fresh key evicts exactly the stale one."""
    import pandas as pd
    import pyspark.sql.functions as F  # noqa: F811
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.streaming.events import (
        STATEFUL_SCHEMA,
        _EVENT_STATE_SCHEMA,
        _running_totals_eventtime,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    US = 1_000_000

    def feed(name, rows):  # rows: (user_id, value, ts_us)
        pdf = pd.DataFrame(rows, columns=["user_id", "value", "ts_us"])
        pdf["ts_us"] = pdf["ts_us"].astype("int64")
        _atomic_write_parquet(pdf, src / name)

    # user 1 last seen at t=100 s; user 2 at t=50 000 s. TTL 10 s, delay
    # 1 s → final watermark 49 999 s; 100 + 10 < 49 999 evicts user 1 only.
    feed("b0.parquet", [(1, 1.25, 100 * US), (1, 2.00, 90 * US),
                        (2, 5.50, 50_000 * US)])

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, value double, ts_us long")
            .parquet(str(src))
            .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
            .withWatermark("event_time", "1 second")
            .groupBy("user_id")
            .applyInPandasWithState(
                lambda key, pdfs, state: _running_totals_eventtime(
                    key, pdfs, state, 10_000
                ),
                outputStructType=STATEFUL_SCHEMA,
                stateStructType=_EVENT_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
        # memory sink can't recover from a checkpoint; foreachBatch can —
        # and restart-with-checkpoint is exactly what this test exercises
        emitted: list[tuple] = []
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, _bid: emitted.extend(
                    (r.user_id, r.n_events, r.total_value)
                    for r in bdf.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)  # event-time timeouts self-terminate
        return set(emitted)

    got = run_once()
    assert (1, 2, 3.25) in got and (2, 1, 5.5) in got, got
    assert (1, -1, 3.25) in got, got  # stale key tombstoned by watermark
    assert (2, -1, 5.5) not in got, got  # fresh key retained

    # post-eviction re-arrival (newer than the checkpointed watermark)
    # restarts from ZERO — the state was removed, not cached
    feed("b1.parquet", [(1, 0.75, 50_100 * US)])
    got2 = run_once()
    assert (1, 1, 0.75) in got2, got2
    assert (1, 3, 4.0) not in got2, got2


def test_eventtime_ttl_eviction_set_fuzz(spark, tmp_path):
    """Randomized cross-engine check of the event-time eviction DECISION:
    for random event sets, the exact key set Spark tombstones must equal
    the closed-form prediction evict ⇔ (max_key_us//1000) + TTL <
    (gmax_us//1000) - delay — the same strict-< arithmetic the catalog
    oracle encodes (both sides strict, so an exact boundary tie means
    no-evict in BOTH engines; no boundary exclusion needed). Per-key
    totals stay integer-cent exact throughout."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigdatabowl_spark.streaming.events import (
        STATEFUL_SCHEMA,
        _EVENT_STATE_SCHEMA,
        _running_totals_eventtime,
    )

    US = 1_000_000
    TTL_MS, DELAY_MS = 10_000, 1_000

    for seed in (11, 23, 47):
        rng = np.random.default_rng(seed)
        n_keys = int(rng.integers(6, 14))
        rows = []
        for k in range(1, n_keys + 1):
            for _ in range(int(rng.integers(1, 5))):
                ts_us = int(rng.integers(0, 60)) * US  # whole seconds
                cents = int(rng.integers(0, 10_000))
                rows.append((k, cents / 100.0, ts_us))
        pdf = pd.DataFrame(rows, columns=["user_id", "value", "ts_us"])

        # closed-form prediction, identical arithmetic to the oracle SQL
        gmax_ms = int(pdf["ts_us"].max()) // 1000
        by_key = pdf.groupby("user_id")["ts_us"].max() // 1000
        predicted_evict = {
            int(k) for k, mx in by_key.items()
            if mx + TTL_MS < gmax_ms - DELAY_MS
        }

        src = tmp_path / f"src_{seed}"
        src.mkdir()
        pdf.astype({"user_id": "int64", "ts_us": "int64"}).to_parquet(
            str(src / "events.parquet"), index=False
        )
        name = f"et_fuzz_{seed}"
        stream = (
            spark.readStream.schema("user_id long, value double, ts_us long")
            .parquet(str(src))
            .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
            .withWatermark("event_time", "1 second")
            .groupBy("user_id")
            .applyInPandasWithState(
                lambda key, pdfs, state: _running_totals_eventtime(
                    key, pdfs, state, TTL_MS
                ),
                outputStructType=STATEFUL_SCHEMA,
                stateStructType=_EVENT_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        sink = spark.table(name).collect()
        got_evict = {int(r.user_id) for r in sink if r.n_events == -1}
        assert got_evict == predicted_evict, (
            seed, sorted(got_evict), sorted(predicted_evict))
        # tombstone totals carry the key's exact final cents
        exact = pdf.groupby("user_id")["value"].apply(
            lambda s: round(s.mul(100).round().sum()) / 100.0)
        for r in sink:
            if r.n_events == -1:
                assert r.total_value == exact[r.user_id], r


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: set[int] = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)


def test_totals_processor_logic_accumulates_and_rearms_timer():
    """The transformWithStateInPandas processor's LOGIC, driven against
    fake handle/state doubles (the TWS runtime needs protobuf, absent in
    this environment — the gated integration twin is
    test_tws_twin_matches_eventtime_oracle): integer-cent accumulation
    across batches, and the eviction timer is re-armed at the key's new
    event-time horizon with the stale timer deleted."""
    import pandas as pd

    from bigdatabowl_spark.streaming.events import _TotalsProcessor

    p = _TotalsProcessor(ttl_ms=10_000)
    h = _FakeHandle()
    p.init(h)

    US = 1_000_000
    out = list(p.handleInputRows(
        (7,),
        iter([pd.DataFrame({"value": [1.25, 2.00], "ts_us": [5 * US, 9 * US]})]),
        None,
    ))
    assert len(out) == 1
    assert out[0].iloc[0].tolist() == [7, 2, 3.25]
    assert h.state.get() == (2, 325, 9_000)
    assert h.timers == {19_000}

    # later batch advances the horizon: old timer deleted, new registered
    out = list(p.handleInputRows(
        (7,), iter([pd.DataFrame({"value": [0.75], "ts_us": [30 * US]})]), None
    ))
    assert out[0].iloc[0].tolist() == [7, 3, 4.0]
    assert h.state.get() == (3, 400, 30_000)
    assert h.timers == {40_000}


def test_totals_processor_logic_stale_timer_guard_and_tombstone():
    """A stale timer (key updated since it was armed) must NOT evict;
    the current-horizon timer emits the tombstone and clears state."""
    import pandas as pd

    from bigdatabowl_spark.streaming.events import _TotalsProcessor

    class _Expiry:
        def __init__(self, ms):
            self._ms = ms

        def getExpiryTimeInMs(self):
            return self._ms

    p = _TotalsProcessor(ttl_ms=10_000)
    h = _FakeHandle()
    p.init(h)
    US = 1_000_000
    list(p.handleInputRows(
        (3,), iter([pd.DataFrame({"value": [5.50], "ts_us": [50 * US]})]), None
    ))

    # stale: armed when max_ms was lower — below the current horizon
    assert list(p.handleExpiredTimer((3,), None, _Expiry(55_000))) == []
    assert h.state.exists()

    # current horizon: tombstone with the exact final total, state gone
    out = list(p.handleExpiredTimer((3,), None, _Expiry(60_000)))
    assert len(out) == 1
    assert out[0].iloc[0].tolist() == [3, -1, 5.5]
    assert not h.state.exists()

    # a timer for a key with no state is a no-op
    assert list(p.handleExpiredTimer((3,), None, _Expiry(60_000))) == []


def test_tws_twin_matches_eventtime_oracle(spark, sf_dir):
    """End-to-end transformWithStateInPandas twin vs the shared
    event-time oracle AND the applyInPandasWithState twin — runs only
    where the TWS runtime's protobuf dependency exists."""
    import pytest as _pytest

    _pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS runtime needs protobuf (StateMessage_pb2)",
    )
    from bigdatabowl_spark.plans.catalog import CATALOG
    from bigdatabowl_spark.streaming.events import stream_stateful_totals_tws

    tws = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in stream_stateful_totals_tws(spark, sf_dir).collect()
    )
    ref = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in CATALOG["stream_stateful_totals_eventtime"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert tws == ref
    assert any(n == -1 for _, n, _ in tws)


def test_dedup_within_watermark_evicts_and_readmits(spark, tmp_path):
    """dropDuplicatesWithinWatermark's BOUNDED-state contract, pinned
    (stream_dedup's docstring documents it; this drives it): a duplicate
    arriving within the watermark delay of its first occurrence is
    dropped; once the watermark passes, the key's dedup state is EVICTED
    and a later duplicate is RE-EMITTED (the at-least-once contract that
    keeps state proportional to the dedup window, not the stream's
    lifetime — the only posture that survives unbounded key cardinality)."""
    import time

    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    base = 1_700_000_000_000_000  # event-time anchor, micros

    def feed(name, rows):
        _atomic_write_parquet(
            pd.DataFrame(rows, columns=["k", "ts_us"]), src / name
        )

    # b0: first A and first C
    feed("b0.parquet", [("A", base), ("C", base)])

    stream = (
        spark.readStream.schema("k string, ts_us long")
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("event_time", "2 seconds")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k", "ts_us")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def rows():
        return [
            (r.k, r.ts_us) for r in spark.table("wm_dedup_test").collect()
        ]

    def wait_for(pred, timeout=180):
        t0 = time.time()
        while time.time() - t0 < timeout:
            exc = q.exception()
            if exc is not None:
                raise exc  # dead query: fail loud, not as a 60 s timeout
            if pred(rows()):
                return True
            time.sleep(0.3)
        return False

    try:
        assert wait_for(lambda s: ("A", base) in s and ("C", base) in s), rows()
        # b1: duplicate C within its 2 s window (dropped) + a filler 30 s
        # later that will advance the watermark past A's and C's state
        feed("b1.parquet", [("C", base + 500_000), ("B", base + 30_000_000)])
        assert wait_for(lambda s: ("B", base + 30_000_000) in s), rows()
        assert ("C", base + 500_000) not in rows(), rows()
        # A's dedup state is evicted at the END of the batch that runs
        # WITH watermark >= +28s (one batch after b1's max event time is
        # observed) — and the dedup lookup itself ignores expiry, so if
        # b2 lands in a batch where A's state still exists, A is dropped
        # as a duplicate FOREVER and no poll timeout can save the test
        # (flaked twice under host load exactly this way). A progress
        # entry only reports a watermark for a COMMITTED batch, so wait
        # until the applied watermark passes A's expiry before feeding
        # the readmission probe.
        import datetime as _dt

        def applied_watermark_us():
            p = q.lastProgress or {}
            wm = (p.get("eventTime") or {}).get("watermark")
            if not wm:
                return 0
            ts = _dt.datetime.fromisoformat(wm.replace("Z", "+00:00"))
            return int(ts.timestamp() * 1_000_000)

        assert wait_for(
            lambda s: applied_watermark_us() >= base + 28_000_000
        ), (q.lastProgress or {}).get("eventTime")
        # b2: duplicate A at t=+29s — NOT late (>= watermark ≈ +28s), but
        # A's dedup state is now provably evicted → re-emitted
        feed("b2.parquet", [("A", base + 29_000_000)])
        assert wait_for(lambda s: ("A", base + 29_000_000) in s), rows()
        counts = [k for k, _ in rows()]
        assert counts.count("A") == 2 and counts.count("C") == 1, rows()
    finally:
        q.stop()


def test_multibatch_fixture_discriminates(spark, sf_dir):
    """Non-vacuity gate for the multibatch event-time query: at sf0.001
    the 8-bucket purchase split must actually produce (a) mid-stream
    evictions (some key with evictions >= 1 that is ALIVE at the end —
    i.e. it was readmitted after a tombstone), and (b) at least one key
    evicted more than once. Without these the catalog row would green on
    the same final-watermark arithmetic the single-batch twin already
    covers, certifying nothing new about mid-stream timers."""
    from bigdatabowl_spark.plans.catalog import CATALOG

    q = CATALOG["stream_stateful_totals_eventtime_multibatch"]
    df = q.builder(spark, sf_dir)
    # plan gate for the final-row selection: the row_number and the
    # eviction-count windows both partition by user_id, so they must share
    # ONE exchange — a refactor that splits them doubles the shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 2, plan
    rows = df.collect()
    readmitted_alive = [
        r for r in rows if r.evictions >= 1 and r.n_events > 0
    ]
    multi_evicted = [r for r in rows if r.evictions >= 2]
    assert readmitted_alive, "no key was evicted then readmitted"
    assert multi_evicted, "no key tombstoned more than once"


def test_multibatch_staging_is_sf_keyed(spark, sf_dir):
    """The staged bucket dir only satisfies the sf_dir (and code version)
    that built it — another scale re-stages instead of silently reusing
    stale bytes (same discipline as kernel staging)."""
    import os

    from bigdatabowl_spark.streaming.events import (
        _MB_STAGE_VERSION,
        _stage_event_buckets,
        _mb_stage_dir,
    )

    stage = _stage_event_buckets(sf_dir)
    marker = os.path.join(stage, "_STAGED_FROM")
    with open(marker) as fh:
        payload = fh.read()
    assert sf_dir.rstrip("/") in payload and _MB_STAGE_VERSION in payload
    # foreign sf: marker mismatch forces a restage (mtime of bucket00
    # moves). Pick a scale DIFFERENT from the session's sf_dir — a
    # hardcoded foreign sf would spuriously fail whenever the suite runs
    # at that scale (SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01)
    foreign = (
        "/root/testdata/sf0.01"
        if not sf_dir.rstrip("/").endswith("sf0.01")
        else "/root/testdata/sf0.001"
    )
    b0 = os.path.join(stage, "bucket00.parquet")
    before = os.path.getmtime(b0)
    _stage_event_buckets(foreign)
    after = os.path.getmtime(os.path.join(_mb_stage_dir(), "bucket00.parquet"))
    assert after != before
    # restore for any later test in the session
    _stage_event_buckets(sf_dir)


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_multibatch_oracle_model_generalizes(spark, sf_dir):
    """The multibatch oracle is a MODEL of Spark's per-batch watermark +
    event-time-timer schedule, not a constant tuned to one lucky
    configuration: re-run the same staged-bucket pipeline and the same
    SQL template across different bucket counts, TTLs, and event-type
    slices and require hash-grade equality every time. Any error in the
    model — wrong watermark basis, off-by-one on the eviction batch,
    keys-with-data timing out, readmission arithmetic — shifts with (k,
    TTL) and breaks at least one configuration here even if the pinned
    catalog configuration happened to green."""
    from bigdatabowl_spark.streaming.events import (
        _mb_oracle_sql,
        _stage_event_buckets,
        run_multibatch_totals,
    )
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(sf_dir)
    h = 3_600_000
    configs = [
        (4, 8 * h, "purchase"),
        (6, 4 * h, "click"),
        (10, 16 * h, "purchase"),
        (12, 2 * h, "view"),
    ]
    for k, ttl_ms, flt in configs:
        stage = _stage_event_buckets(
            sf_dir, k=k, flt=flt, stage_name=f"events_mb_fuzz_{k}_{ttl_ms}_{flt}"
        )
        got = run_multibatch_totals(spark, stage, ttl_ms=ttl_ms)
        want = con.execute(_mb_oracle_sql(k=k, ttl_ms=ttl_ms, flt=flt)).fetchdf()
        diff = compare(got, want)
        assert not diff, f"(k={k}, ttl={ttl_ms}, {flt}): {diff}"


@pytest.mark.slow  # see pytest.ini: deselected from the default run (r13)
def test_multibatch_provider_independent(spark, sf_dir):
    """The multibatch evict-then-readmit run under the RocksDB state store
    must produce the EXACT catalog-query output. Beyond the single-batch
    provider test, this covers timer persistence ACROSS micro-batches —
    a timer armed in batch i must survive i+1's state-store commit/reload
    cycle to fire in batch i+2 — and state re-creation for readmitted keys
    after a RocksDB delete."""
    from bigdatabowl_spark.plans.catalog import CATALOG

    q = CATALOG["stream_stateful_totals_eventtime_multibatch"]
    rows = lambda df: sorted(  # noqa: E731
        (r.user_id, r.n_events, r.total_value, r.evictions)
        for r in df.collect()
    )
    baseline = rows(q.builder(spark, sf_dir))
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = rows(q.builder(spark, sf_dir))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert got == baseline
    # the discriminating population survived the provider swap too
    assert any(ev >= 1 and n > 0 for _, n, _, ev in got)  # readmitted-alive
