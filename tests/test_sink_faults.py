"""Fault-injection fuzz for the sink COMMIT seams (VERDICT r10 item 4).

The two sinks with commit protocols are the npy artifact writer
(staged-dotfile two-phase commit, sources/npy_source.py) and
write_partitioned (parquet dynamic partition overwrite, sources/io.py).
Correctness at 100 TB is not "the happy path writes the right bytes" —
it's "a task that dies mid-write, a speculative duplicate attempt, or a
crashed prior run's droppings NEVER become reader-visible state, and a
rerun converges".

Faults injected here:
- a kernel (mapInPandas) that raises for a chosen partition while a
  poison flag file exists — the reference's mid-run crash
  (comb_model_big_run_cpu.py:31-41 leaves half-written play dirs on
  disk; our sinks must leave NOTHING half-written);
- stray staged tmp files from a "crashed" prior writer attempt;
- a speculative LOSER attempt whose staged file exists but whose commit
  message never reached the driver;
- a planted `.spark-staging-*` dir inside a partitioned parquet layout.

Every scenario asserts both halves of the contract: (1) no partial
artifact is visible to any reader after the fault, and (2) the rerun
(resume_filter + write, or a plain retry) converges to the exact
expected state.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _poison_fn(flag_path: str, key_col: str, bad_key: str):
    """mapInPandas kernel that fails any batch carrying bad_key while the
    flag file exists — a transient mid-write fault: delete the flag and
    the same plan succeeds."""

    def fn(batches):
        for pdf in batches:
            if os.path.exists(flag_path) and (pdf[key_col] == bad_key).any():
                raise RuntimeError("injected transient fault")
            yield pdf

    return fn


def _npy_dir_state(d) -> dict:
    """Committed artifacts only (what a reader may see): stem -> values."""
    out = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".npy") and not f.startswith("."):
            out[f[: -len(".npy")]] = np.load(os.path.join(d, f)).tolist()
    return out


def test_npy_sink_midwrite_failure_publishes_nothing_then_converges(
    spark, tmp_path
):
    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactDataSource,
        NpyArtifactSink,
    )

    spark.dataSource.register(NpyArtifactSink)
    spark.dataSource.register(NpyArtifactDataSource)
    d = tmp_path / "sink"
    d.mkdir()

    prior = spark.createDataFrame(
        [("old", 0, 1.0)], "file string, idx long, value double"
    ).repartition("file")
    prior.write.format("npy_sink").option("path", str(d)).mode("append").save()
    assert _npy_dir_state(d) == {"old": [1.0]}

    flag = str(tmp_path / "poison")
    open(flag, "w").close()
    rows = [("a", 0, 10.0), ("a", 1, 11.0), ("b", 0, 20.0)]
    df = spark.createDataFrame(
        rows, "file string, idx long, value double"
    ).repartition("file")
    poisoned = df.mapInPandas(
        _poison_fn(flag, "file", "b"), df.schema
    ).repartition("file")

    with pytest.raises(Exception, match="injected transient fault"):
        (
            poisoned.write.format("npy_sink")
            .option("path", str(d))
            .mode("overwrite")
            .save()
        )
    # nothing published, nothing staged, prior run intact — even though
    # the 'a' task may have staged its file before 'b' failed the job
    assert _npy_dir_state(d) == {"old": [1.0]}
    assert not [f for f in os.listdir(d) if ".tmp-" in f], "stage leaked"
    back = spark.read.format("npy_artifact").option("path", str(d)).load()
    assert {(r.file, r.idx, r.value) for r in back.collect()} == {
        ("old", 0, 1.0)
    }

    os.remove(flag)  # fault clears; identical rerun converges
    (
        poisoned.write.format("npy_sink")
        .option("path", str(d))
        .mode("overwrite")
        .save()
    )
    assert _npy_dir_state(d) == {"a": [10.0, 11.0], "b": [20.0]}
    assert not [f for f in os.listdir(d) if ".tmp-" in f]


def test_npy_sink_orphan_stage_invisible_and_swept(spark, tmp_path):
    """Stage droppings from a 'crashed' prior attempt (task died after
    np.save, before reporting) must never reach a reader and must be
    swept by the next committed write."""
    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactDataSource,
        NpyArtifactSink,
    )

    spark.dataSource.register(NpyArtifactSink)
    spark.dataSource.register(NpyArtifactDataSource)
    d = tmp_path / "sink"
    d.mkdir()
    np.save(d / "keep.npy", np.array([7.0]))
    # orphaned stage files: one for an existing stem, one for a new stem
    np.save(d / ".keep.tmp-9991.npy", np.array([666.0]))
    np.save(d / ".ghost.tmp-9992.npy", np.array([667.0]))

    back = spark.read.format("npy_artifact").option("path", str(d)).load()
    assert {(r.file, r.value) for r in back.collect()} == {("keep", 7.0)}

    df = spark.createDataFrame(
        [("new", 0, 1.0)], "file string, idx long, value double"
    ).repartition("file")
    df.write.format("npy_sink").option("path", str(d)).mode("append").save()
    assert _npy_dir_state(d) == {"keep": [7.0], "new": [1.0]}
    assert not [f for f in os.listdir(d) if ".tmp-" in f], (
        "orphaned stage files survived the committed write's sweep"
    )


def test_npy_sink_speculative_loser_never_published(tmp_path):
    """Commit-protocol unit test: a speculative LOSER attempt staged its
    file but its commit message never reached the driver (Spark delivers
    one message per task). commit() must publish exactly the winner's
    bytes and sweep the loser's stage file."""
    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactWriter,
        NpyCommitMessage,
    )

    d = tmp_path / "sink"
    d.mkdir()
    winner = str(d / ".a.tmp-1.npy")
    loser = str(d / ".a.tmp-2.npy")
    np.save(winner, np.array([1.0, 2.0]))
    np.save(loser, np.array([999.0]))

    w = NpyArtifactWriter({"path": str(d)}, overwrite=True)
    w.commit([NpyCommitMessage(tmp_paths=[("a", winner)])])

    assert _npy_dir_state(d) == {"a": [1.0, 2.0]}
    assert not [f for f in os.listdir(d) if ".tmp-" in f], (
        "loser attempt's stage file survived commit"
    )


def test_npy_sink_abort_sweeps_all_attempts(tmp_path):
    """abort() (job-level failure) removes every staged attempt, reported
    or not — nothing for a later reader or writer to trip over."""
    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactWriter,
        NpyCommitMessage,
    )

    d = tmp_path / "sink"
    d.mkdir()
    np.save(d / "committed.npy", np.array([5.0]))
    reported = str(d / ".x.tmp-1.npy")
    unreported = str(d / ".y.tmp-2.npy")
    np.save(reported, np.array([1.0]))
    np.save(unreported, np.array([2.0]))

    w = NpyArtifactWriter({"path": str(d)}, overwrite=False)
    w.abort([NpyCommitMessage(tmp_paths=[("x", reported)])])

    assert _npy_dir_state(d) == {"committed": [5.0]}
    assert not [f for f in os.listdir(d) if ".tmp-" in f]


def test_write_partitioned_midwrite_failure_then_resume_converges(
    spark, tmp_path
):
    """Dynamic-partition-overwrite fault contract: a job that dies
    mid-write leaves EVERY previously committed partition intact and
    byte-visible (the staging dir is discarded on abort); resume_filter
    then sees exactly the missing partitions and the resumed write
    converges — the partition is the unit of commit (S10/S12)."""
    import pyspark.sql.functions as F  # noqa: F401

    from bigdatabowl_spark.sources.io import resume_filter, write_partitioned

    out = str(tmp_path / "layout")
    first = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 3)], "k string, v int"
    )
    write_partitioned(first, out, ["k"])

    flag = str(tmp_path / "poison")
    open(flag, "w").close()
    second = spark.createDataFrame(
        [("A", 10), ("B", 30), ("C", 50)], "k string, v int"
    )
    poisoned = second.repartition("k").mapInPandas(
        _poison_fn(flag, "k", "C"), second.schema
    )
    with pytest.raises(Exception, match="injected transient fault"):
        write_partitioned(poisoned, out, ["k"])

    back = spark.read.schema(first.schema).parquet(out)
    assert {(r.k, r.v) for r in back.collect()} == {
        ("A", 1),
        ("A", 2),
        ("B", 3),
    }, "failed write mutated committed partitions"

    # resume: A and B exist (stale-but-committed — the S12 unit of
    # idempotence is the partition), only C is missing
    remaining = resume_filter(second, spark, out, "k")
    assert {(r.k, r.v) for r in remaining.collect()} == {("C", 50)}

    os.remove(flag)
    write_partitioned(
        remaining.repartition("k").mapInPandas(
            _poison_fn(flag, "k", "C"), second.schema
        ),
        out,
        ["k"],
    )
    back2 = spark.read.schema(first.schema).parquet(out)
    assert {(r.k, r.v) for r in back2.collect()} == {
        ("A", 1),
        ("A", 2),
        ("B", 3),
        ("C", 50),
    }
    assert resume_filter(second, spark, out, "k").count() == 0


def test_write_partitioned_guard_abort_publishes_nothing(spark, tmp_path):
    """The ''-guard fires DURING the write (single pass) — it must abort
    with the committed layout untouched, same as any task fault."""
    from bigdatabowl_spark.sources.io import write_partitioned

    out = str(tmp_path / "layout")
    first = spark.createDataFrame([("A", 1)], "k string, v int")
    write_partitioned(first, out, ["k"])

    bad = spark.createDataFrame(
        [("A", 10), ("", 99), ("C", 30)], "k string, v int"
    )
    with pytest.raises(ValueError, match="EMPTY-STRING"):
        write_partitioned(bad, out, ["k"])

    back = spark.read.schema(first.schema).parquet(out)
    assert {(r.k, r.v) for r in back.collect()} == {("A", 1)}


def test_write_partitioned_ignores_planted_staging_dir(spark, tmp_path):
    """A crashed prior run's `.spark-staging-*` droppings inside the
    layout must be invisible to readers and to resume_filter, and must
    not break the next committed write."""
    from bigdatabowl_spark.sources.io import (
        existing_partitions,
        resume_filter,
        write_partitioned,
    )

    out = tmp_path / "layout"
    first = spark.createDataFrame([("A", 1), ("B", 2)], "k string, v int")
    write_partitioned(first, str(out), ["k"])

    # plant a staging dir holding a would-be partition Z with real parquet
    ghost = out / ".spark-staging-deadbeef" / "k=Z"
    ghost.mkdir(parents=True)
    spark.createDataFrame([(99,)], "v int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(ghost))

    back = spark.read.schema(first.schema).parquet(str(out))
    assert {r.k for r in back.collect()} == {"A", "B"}, (
        "staging droppings leaked into the read"
    )
    assert set(existing_partitions(spark, str(out), "k")) == {"A", "B"}
    assert resume_filter(first, spark, str(out), "k").count() == 0

    third = spark.createDataFrame([("C", 3)], "k string, v int")
    write_partitioned(third, str(out), ["k"])
    back2 = spark.read.schema(first.schema).parquet(str(out))
    assert {(r.k, r.v) for r in back2.collect()} == {
        ("A", 1),
        ("B", 2),
        ("C", 3),
    }
