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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class NpyArtifactReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        parts = [
            InputPartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".npy")
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
        for i, v in enumerate(arr.ravel()):
            yield (stem, i, float(v))


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

    The offset is a count into the sorted file listing ({"n": k}), which is
    exact for the append-only artifact contract here (a production source
    would watermark on (mtime, name) to tolerate non-monotonic arrivals).
    ``read`` returns a fresh iterator over a MATERIALIZED row list — the
    runner caches prefetched rows driver-side and replays committed ranges
    through ``readBetweenOffsets``, which re-loads the same files, so a
    restarted query re-emits identical rows (exactly-once at the source).
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self):
        return {"n": 0}

    def _files(self) -> list:
        return sorted(f for f in os.listdir(self.path) if f.endswith(".npy"))

    def _rows(self, names) -> list:
        import numpy as np

        out = []
        for f in names:
            arr = np.load(os.path.join(self.path, f))
            stem = f[: -len(".npy")]
            out.extend((stem, i, float(v)) for i, v in enumerate(arr.ravel()))
        return out

    def read(self, start):
        files = self._files()
        return iter(self._rows(files[start["n"] :])), {"n": len(files)}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(self._files()[start["n"] : end["n"]]))


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
