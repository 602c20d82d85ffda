"""Python DataSource (Spark 4 API) exposing a directory of ``.npy``
artifacts as a table — the executor-side, partition-planned form of the
reference's ndarray loads (play_eppa_cpu.py:72, frame_eppa.py:53), where
sources/artifacts.py covers the driver-broadcast form (S4).

One InputPartition per file: Spark schedules file loads across executors
and a directory of model artifacts scans in parallel like any other
source. Rows are (file, idx, value) — the flattened-array relational view
the S11 sink family round-trips through.
"""

from __future__ import annotations

import os

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def stem_encode(value) -> str:
    """Filename-safe artifact stem for an arbitrary key value.

    Percent-encodes everything outside the URL-safe set (so '/', '=',
    control chars, unicode all become %XX and one value is always one flat
    filename), with two extra rules the plain quote() misses:
    - NULL → '%N' — unreachable by encoding ('%' in quote output is always
      followed by two hex digits, and 'N ' is not a hex pair), so no
      string value can collide with the null marker;
    - the EMPTY STRING → '%E' (same unreachability: '%' + one non-hex-pair
      char) — its bare encoding would name the artifact '.npy', a dotfile;
    - a LEADING '.' is re-encoded as '%2E' — quote() never touches '.',
      but a '.'-leading stem would collide with the reader/writer dotfile
      staging convention. Found by tests/test_sources_fuzz.py: a '/' in a
      l_returnflag value pointed np.save at a subdirectory, and the ''
      flag's artifact vanished behind the dotfile-stage skip."""
    from urllib.parse import quote

    if value is None:
        return "%N"
    enc = quote(str(value), safe="")
    if enc == "":
        return "%E"
    if enc.startswith("."):
        enc = "%2E" + enc[1:]
    return enc


def stem_decode(stem: str):
    """Inverse of stem_encode ('%N' → None, '%E' → '')."""
    from urllib.parse import unquote

    if stem == "%N":
        return None
    if stem == "%E":
        return ""
    return unquote(stem)


class NpyArtifactReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        parts = [
            InputPartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            # dotfiles are the writer's uncommitted stage — never read them
            if f.endswith(".npy") and not f.startswith(".")
        ]
        # an empty partition list makes Spark invoke read(None) on a
        # single default partition — represent "no artifacts" explicitly
        return parts or [InputPartition(None)]

    def read(self, partition):
        import numpy as np

        if partition is None or partition.value is None:
            return
        arr = np.load(partition.value)
        stem = os.path.basename(partition.value)[: -len(".npy")]
        key = stem_decode(stem)
        for i, v in enumerate(arr.ravel()):
            yield (key, i, float(v))


class NpyArtifactDataSource(DataSource):
    """``spark.read.format("npy_artifact").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "npy_artifact"

    def schema(self) -> str:
        return "file string, idx bigint, value double"

    def reader(self, schema) -> NpyArtifactReader:
        return NpyArtifactReader(self.options)


class NpyArtifactStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming reader over an append-only artifact dir.

    The offset is {"n": count, "last": name} over the sorted file listing —
    exact for the append-only, name-monotonic artifact contract here (a
    production source would watermark on (mtime, name) to tolerate
    non-monotonic arrivals). The contract is ENFORCED, not assumed: if a
    new file sorts at or before the committed frontier (the listing's n-th
    name changed), ``read`` raises instead of silently re-emitting old
    files and dropping the newcomer. ``read`` returns a fresh iterator over
    a MATERIALIZED row list — the runner caches prefetched rows driver-side
    and replays committed ranges through ``readBetweenOffsets``, which
    re-loads the same files, so a restarted query re-emits identical rows
    (exactly-once at the source).

    A violated frontier (a file recreated, renamed, or deleted at or before
    the committed position) poisons the query BY DESIGN — both ``read`` and
    ``readBetweenOffsets`` raise rather than emit wrong rows. Recovery
    requires clearing the checkpoint: the committed offsets name files that
    no longer exist in the committed order, so no automatic resume is sound.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self):
        return {"n": 0, "last": "", "sig": self._sig([])}

    @staticmethod
    def _sig(names) -> str:
        """Digest of the whole filename prefix: the count+last check alone
        cannot see a MID-range rename (b.npy → bb.npy keeps the count and
        the n-th name stable while the slice contents change), so every
        offset carries a prefix signature and validation compares it."""
        import hashlib

        return hashlib.md5("\n".join(names).encode()).hexdigest()

    def _check_frontier(self, files, off, what: str) -> None:
        n = off["n"]
        prefix_ok = len(files) >= n and (n == 0 or files[n - 1] == off.get("last", ""))
        if prefix_ok and "sig" in off:
            prefix_ok = self._sig(files[:n]) == off["sig"]
        if not prefix_ok:
            raise ValueError(
                f"npy_artifact_stream: {what} offset {off!r} no longer matches "
                f"the listing in {self.path} (a file was added, deleted, or "
                "renamed at or before the committed frontier); this source "
                "requires append-only, name-ascending artifact arrival — "
                "clear the checkpoint to restart from a fresh offset"
            )

    def _files(self) -> list:
        # dotfiles are the writer's uncommitted stage — never read them
        return sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith(".npy") and not f.startswith(".")
        )

    def _rows(self, names) -> list:
        import numpy as np

        out = []
        for f in names:
            arr = np.load(os.path.join(self.path, f))
            key = stem_decode(f[: -len(".npy")])
            out.extend((key, i, float(v)) for i, v in enumerate(arr.ravel()))
        return out

    def read(self, start):
        files = self._files()
        self._check_frontier(files, start, "start")
        last = files[-1] if files else start.get("last", "")
        end = {"n": len(files), "last": last, "sig": self._sig(files)}
        return iter(self._rows(files[start["n"]:])), end

    def readBetweenOffsets(self, start, end):
        # Replay path (query restart): validate BOTH committed offsets
        # (count + n-th name + full prefix signature) against the live
        # listing — a deleted, renamed, or recreated committed file would
        # otherwise silently shift the slice and replay WRONG rows.
        # Recovery from a violated frontier requires clearing the
        # checkpoint (the committed offsets name files that no longer
        # exist in the committed order).
        files = self._files()
        for what, off in (("start", start), ("end", end)):
            self._check_frontier(files, off, what)
        return iter(self._rows(files[start["n"] : end["n"]]))


class NpyArtifactStreamSource(DataSource):
    """``spark.readStream.format("npy_artifact_stream")`` — the streaming
    twin of NpyArtifactDataSource for artifact dirs that fill over time."""

    @classmethod
    def name(cls) -> str:
        return "npy_artifact_stream"

    def schema(self) -> str:
        return "file string, idx bigint, value double"

    def simpleStreamReader(self, schema) -> NpyArtifactStreamReader:
        return NpyArtifactStreamReader(self.options)


@dataclass
class NpyCommitMessage(WriterCommitMessage):
    # (stem, tmp_path) pairs this task staged
    tmp_paths: list


class NpyArtifactWriter(DataSourceWriter):
    """Partitioned ``.npy`` sink with staged-file two-phase commit.

    Each task groups its rows by ``file`` stem, writes one hidden
    ``.<stem>.tmp-<taskAttemptId>.npy`` per stem, and reports the staged
    paths in its commit message; the driver's ``commit`` atomically
    renames winners into place and ``abort`` deletes the stage — so a
    failed/speculative task never publishes a partial artifact (the same
    contract as Spark's file commit protocol). Rows must be co-partitioned
    by stem (``df.repartition("file")``) so one task owns one artifact.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def _sweep_stage(self) -> None:
        """Remove ALL stage files, not just those with commit messages — a
        task that dies after staging never reports its paths, so the
        message-driven cleanup alone would leak orphans forever."""
        for f in os.listdir(self.path):
            if f.startswith(".") and ".tmp-" in f and f.endswith(".npy"):
                try:
                    os.remove(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass

    def write(self, rows) -> "NpyCommitMessage":
        import numpy as np
        from pyspark import TaskContext

        tid = TaskContext.get().taskAttemptId()
        groups: dict = {}
        # group by the ENCODED stem: everything downstream — tmp names,
        # commit messages, final filenames, the overwrite sweep's listdir
        # comparison — then lives in filename space consistently, and
        # arbitrary key values (None, '/', '', unicode) stay one flat file
        for r in rows:
            groups.setdefault(stem_encode(r[0]), []).append((r[1], r[2]))
        staged = []
        for stem, vals in groups.items():
            arr = np.array([v for _, v in sorted(vals)], dtype=np.float64)
            # name must END in .npy — np.save appends the suffix otherwise,
            # and commit would rename a path that does not exist
            tmp = os.path.join(self.path, f".{stem}.tmp-{tid}.npy")
            np.save(tmp, arr)
            staged.append((stem, tmp))
        return NpyCommitMessage(tmp_paths=staged)

    def commit(self, messages) -> None:
        # Enforce the one-task-one-artifact contract BEFORE any rename: if
        # rows for one stem spanned multiple tasks (caller forgot
        # repartition("file")), each task staged a complete-LOOKING .npy
        # holding only its subset and the last rename would silently win,
        # publishing a partial artifact. All-or-nothing: fail the job with
        # nothing published.
        seen: dict = {}
        dupes = set()
        for m in messages:
            for stem, _ in m.tmp_paths:
                if stem in seen:
                    dupes.add(stem)
                seen[stem] = True
        if dupes:
            self._sweep_stage()
            raise ValueError(
                f"npy_sink: rows for stems {sorted(dupes)!r} were written by "
                "more than one task — each artifact would hold only one "
                "task's subset; repartition the input by 'file' so one task "
                "owns one artifact"
            )
        # honor SaveMode: append must not clobber an existing artifact —
        # fail the job BEFORE publishing anything (all-or-nothing commit)
        if not self.overwrite:
            clashes = [
                stem
                for m in messages
                for stem, _ in m.tmp_paths
                if os.path.exists(os.path.join(self.path, f"{stem}.npy"))
            ]
            if clashes:
                self._sweep_stage()
                raise ValueError(
                    f"npy_sink: artifacts already exist for stems {clashes!r} "
                    "and mode is append; use mode('overwrite') to replace"
                )
        for m in messages:
            for stem, tmp in m.tmp_paths:
                os.replace(tmp, os.path.join(self.path, f"{stem}.npy"))
        # SaveMode.Overwrite truncates the target: artifacts from prior runs
        # whose stems are NOT in this write are stale and must not survive
        # to pollute a later directory scan.
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".npy") and not f.startswith("."):
                    if f[: -len(".npy")] not in seen:
                        os.remove(os.path.join(self.path, f))
        self._sweep_stage()

    def abort(self, messages) -> None:
        self._sweep_stage()


class NpyArtifactSink(DataSource):
    """``df.write.format("npy_sink").option("path", dir).save()`` over
    (file string, idx bigint, value double) rows."""

    @classmethod
    def name(cls) -> str:
        return "npy_sink"

    def schema(self) -> str:
        return "file string, idx bigint, value double"

    def writer(self, schema, overwrite: bool) -> NpyArtifactWriter:
        return NpyArtifactWriter(self.options, overwrite)
