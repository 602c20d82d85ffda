"""Fault-injection for the STREAMING commit seam (VERDICT r11 item 4).

tests/test_sink_faults.py covers the batch sinks; this file covers the
one streaming sink with a hand-rolled commit protocol —
`stream_foreach_merge`'s versioned state dirs (streaming/events.py:
merge_keyed_batch). Its exactly-once claim rests on three legs:

1. a micro-batch whose foreachBatch body DIES MID-MERGE commits nothing:
   the checkpoint has no commit marker for it, and whatever partial
   `state_<id>` droppings the death left are fully overwritten when the
   restarted query replays the batch (predecessor is resolved FROM DISK
   with id < batch_id, so a partial dir can never become its own
   predecessor);
2. a death AFTER the state write but BEFORE the checkpoint commit (the
   classic at-least-once window) replays the batch on restart, and the
   replayed overwrite-from-same-predecessor is idempotent — totals count
   every event exactly once;
3. a LOST COMMIT MARKER (crash mid-checkpoint-write, simulated by
   deleting the newest `commits/<id>` file after a clean run) replays
   the final batch on restart with the same idempotent result.

Every scenario asserts both halves of the contract: the final state
equals the batch oracle bit-exactly (DECIMAL partials), and the version
chain has no gaps, duplicates, or reader-visible partials.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from bigdatabowl_spark.functions.scalar import dec
from bigdatabowl_spark.streaming.events import (
    _events_source,
    merge_keyed_batch,
    merge_state_dirs,
)

# slow: multi-minute poll ceilings under fault injection — deselected from
# the default run so the suite fits the verify wall budget (r13); run via
# -m "" / -m slow.
pytestmark = [pytest.mark.usefixtures("spark"), pytest.mark.slow]

N_FILES = 3  # one micro-batch per staged file (maxFilesPerTrigger=1)


@pytest.fixture()
def staged_events(spark, sf_dir, tmp_path):
    """Split the sf events table into N_FILES single-file parquet drops —
    the multi-micro-batch feed the catalog's availableNow single batch
    can't produce."""
    stage = str(tmp_path / "feed")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(3000)
    # split by ROW hash, not user_id: the same user must appear in several
    # micro-batches or the prev-state ∪ partial merge never combines rows
    split = F.pmod(F.hash("ts", "value"), F.lit(N_FILES))
    for i in range(N_FILES):
        ev.filter(split == i).coalesce(1).write.mode("append").parquet(stage)
    # one part file per drop → one file per micro-batch
    parts = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    assert len(parts) == N_FILES
    return stage


def _oracle(spark, stage):
    rows = (
        spark.read.parquet(stage)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("string").alias("total"),
        )
        .collect()
    )
    return sorted(map(tuple, rows))


def _latest_state(spark, state_root):
    versions = merge_state_dirs(state_root)
    rows = (
        spark.read.parquet(versions[-1][1])
        .select("user_id", "n_events", F.col("total_dec").cast("string"))
        .collect()
    )
    return sorted(map(tuple, rows))


def _run_stream(spark, stage, ckpt, merge_fn):
    q = (
        _events_source(spark, stage, stage=stage, max_files_per_trigger=1)
        .writeStream.foreachBatch(merge_fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


def _committed_batches(ckpt):
    commits = os.path.join(ckpt, "commits")
    if not os.path.isdir(commits):
        return []
    return sorted(int(f) for f in os.listdir(commits) if f.isdigit())


def _real_merge(state_root):
    def fn(batch_df, batch_id):
        merge_keyed_batch(state_root, batch_df, batch_id)

    return fn


def test_death_mid_merge_commits_nothing_and_restart_heals(
    spark, staged_events, tmp_path
):
    """Leg 1: die mid-merge for batch 1, leaving realistic droppings — a
    partial state_1 dir holding a wrong-content part file plus an
    uncommitted _temporary stage. The failed batch must have NO commit
    marker; the restarted query replays it and the overwrite replaces
    every dropping with the exact merge result."""
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state_root)

    def dying_merge(batch_df, batch_id):
        if batch_id == 1:
            # task-committed partial content from the dying attempt:
            # half the batch, already reduced, plus an in-flight stage dir
            batch_df.limit(5).groupBy("user_id").agg(
                F.count("*").alias("n_events"),
                F.sum(dec("value")).alias("total_dec"),
            ).write.mode("overwrite").parquet(f"{state_root}/state_1")
            os.makedirs(f"{state_root}/state_1/_temporary/0", exist_ok=True)
            raise RuntimeError("injected mid-merge death")
        merge_keyed_batch(state_root, batch_df, batch_id)

    with pytest.raises(Exception, match="injected mid-merge death"):
        _run_stream(spark, staged_events, ckpt, dying_merge)

    # the dead batch is NOT committed; its partial dir exists on disk but
    # no reader runs (awaitTermination raised, so the query never handed
    # a result out) — visibility is gated on successful termination
    assert _committed_batches(ckpt) == [0]
    assert [bid for bid, _ in merge_state_dirs(state_root)] == [0, 1]
    assert os.path.isdir(f"{state_root}/state_1/_temporary")

    _run_stream(spark, staged_events, ckpt, _real_merge(state_root))

    assert _committed_batches(ckpt) == list(range(N_FILES))
    assert [bid for bid, _ in merge_state_dirs(state_root)] == list(
        range(N_FILES)
    )
    # the replayed overwrite purged the droppings — no stage dir, and the
    # version's content is the exact merge, not the planted partial
    assert not os.path.exists(f"{state_root}/state_1/_temporary")
    assert _latest_state(spark, state_root) == _oracle(spark, staged_events)


def test_death_after_write_before_commit_is_exactly_once(
    spark, staged_events, tmp_path
):
    """Leg 2: the state write for batch 1 COMPLETES, then the driver dies
    before the checkpoint commit (the at-least-once window every
    foreachBatch pipeline has). The restarted query re-delivers batch 1;
    the replayed merge resolves the same disk predecessor (state_0) and
    overwrites state_1 — every event counted exactly once, no doubling."""
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state_root)

    def dying_after_write(batch_df, batch_id):
        merge_keyed_batch(state_root, batch_df, batch_id)
        if batch_id == 1:
            raise RuntimeError("injected death before checkpoint commit")

    with pytest.raises(Exception, match="before checkpoint commit"):
        _run_stream(spark, staged_events, ckpt, dying_after_write)

    # state_1 is complete on disk, yet uncommitted in the checkpoint
    assert _committed_batches(ckpt) == [0]
    assert [bid for bid, _ in merge_state_dirs(state_root)] == [0, 1]

    _run_stream(spark, staged_events, ckpt, _real_merge(state_root))

    final = _latest_state(spark, state_root)
    assert final == _oracle(spark, staged_events)
    # exactly-once, stated directly: total event count matches the feed
    n_total = sum(r[1] for r in final)
    assert n_total == spark.read.parquet(staged_events).count()


def test_lost_commit_marker_replays_idempotently(
    spark, staged_events, tmp_path
):
    """Leg 3: a crash mid-checkpoint-write loses the newest commit marker
    (the offsets entry survives — Spark writes offsets before, commits
    after the batch). On restart the engine re-delivers the final batch;
    the versioned-dir merge absorbs the replay without double counting."""
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state_root)

    _run_stream(spark, staged_events, ckpt, _real_merge(state_root))
    clean = _latest_state(spark, state_root)
    assert clean == _oracle(spark, staged_events)
    committed = _committed_batches(ckpt)
    assert committed == list(range(N_FILES))

    os.remove(os.path.join(ckpt, "commits", str(committed[-1])))
    # the local-FS checksum sidecar must die with the marker — a stale
    # .crc makes the replayed commit's rename fail as a phantom
    # "concurrent query" (Hadoop ChecksumFileSystem renames both files)
    crc = os.path.join(ckpt, "commits", f".{committed[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    _run_stream(spark, staged_events, ckpt, _real_merge(state_root))

    assert _committed_batches(ckpt) == list(range(N_FILES))
    assert [bid for bid, _ in merge_state_dirs(state_root)] == list(
        range(N_FILES)
    )
    assert _latest_state(spark, state_root) == clean


def test_planted_stale_run_droppings_do_not_poison_a_fresh_run(
    spark, staged_events, tmp_path
):
    """A crashed PRIOR run's state_root droppings (partial newest version,
    stray non-state files) must not leak into a fresh run that reuses the
    directory with a FRESH checkpoint: batch ids restart at 0, and every
    version the new run writes is derived only from its own chain."""
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(state_root)

    # droppings: a stale state_2 from "some earlier crashed run" with
    # absurd totals, plus a stray file the listing must ignore
    spark.createDataFrame(
        [(999999, 10**9, 10**9)], "user_id long, n_events long, total_dec long"
    ).write.mode("overwrite").parquet(f"{state_root}/state_2")
    open(os.path.join(state_root, "not_a_state_dir.txt"), "w").close()

    # a fresh run over 2 of the 3 feed files (batches 0 and 1): the stale
    # state_2 has a HIGHER id than any batch this run commits, so the
    # disk-predecessor rule (id < batch_id) must keep it out of the chain
    sub = str(tmp_path / "feed2")
    os.makedirs(sub)
    parts = sorted(
        f for f in os.listdir(staged_events) if f.endswith(".parquet")
    )
    for f in parts[:2]:
        shutil.copy(os.path.join(staged_events, f), os.path.join(sub, f))

    _run_stream(spark, sub, ckpt, _real_merge(state_root))

    versions = dict(merge_state_dirs(state_root))
    assert set(versions) == {0, 1, 2}  # 0,1 fresh + the stale dropping
    # version 1 (this run's newest) is the authoritative result and is
    # untouched by the stale dropping's absurd totals
    rows = (
        spark.read.parquet(versions[1])
        .select("user_id", "n_events", F.col("total_dec").cast("string"))
        .collect()
    )
    assert sorted(map(tuple, rows)) == _oracle(spark, sub)
