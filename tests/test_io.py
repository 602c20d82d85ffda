"""S-family scan/sink tests (SURVEY §2.1) over temp directories."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bigdatabowl_spark.sources.io import (
    existing_partitions,
    read_csv_schema,
    read_multi,
    resume_filter,
    split_error_channel,
    with_provenance,
    write_partitioned,
)


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def test_csv_roundtrip_with_schema(spark, tmp):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.5).alias("v"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    path = f"{tmp}/csv_out"
    df.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv_schema(spark, path, "id long, v double, name string")
    assert back.count() == 100
    assert back.schema.simpleString() == "struct<id:bigint,v:double,name:string>"
    assert back.agg(F.sum("v")).first()[0] == pytest.approx(2.5 * sum(range(100)))


def test_multi_path_scan_and_provenance(spark, tmp):
    a, b = f"{tmp}/week1", f"{tmp}/week2"
    spark.range(10).write.parquet(a)
    spark.range(20).write.parquet(b)
    df = with_provenance(read_multi(spark, [a, b]))
    assert df.count() == 30
    assert df.select("source_file").distinct().count() >= 2  # ≥1 file per dir


def test_partitioned_write_and_resume(spark, tmp):
    path = f"{tmp}/sink"
    df = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0)], "playId int, v double"
    )
    write_partitioned(df, path, ["playId"])
    assert sorted(existing_partitions(spark, path, "playId")) == ["1", "2"]
    # resume: play 1 and 2 done → only play 3 remains
    more = spark.createDataFrame([(2, 21.0), (3, 30.0)], "playId int, v double")
    remaining = resume_filter(more, spark, path, "playId")
    assert [r.playId for r in remaining.collect()] == [3]
    # dynamic partition overwrite: rewriting play 2 must not clobber play 1
    write_partitioned(
        spark.createDataFrame([(2, 99.0)], "playId int, v double"), path, ["playId"]
    )
    back = spark.read.parquet(path)
    assert back.filter("playId = 1").count() == 2
    assert back.filter("playId = 2").count() == 1


def test_error_channel_split(spark):
    df = spark.createDataFrame(
        [(1, "ok", 1.0), (2, "ok", 2.0), (3, "ValueError: no pass_forward", 0.0)],
        "playId int, status string, v double",
    )
    ok, errors = split_error_channel(df)
    assert ok.count() == 2 and "status" not in ok.columns
    assert errors.count() == 1
    assert "pass_forward" in errors.first().status


def test_prior_artifact_roundtrip(spark, tmp):
    """S4/S5/S11/S12: priors saved to parquet reload bit-identically, and a
    second save converges to the same artifact (idempotent resume)."""
    import numpy as np

    from bigdatabowl_spark.sources.artifacts import load_priors, save_priors

    d = f"{tmp}/priors"
    save_priors(spark, d)
    p1 = load_priors(spark, d)
    assert p1.p_t.shape == (54,) and p1.T_given_L.shape == (60, 40)
    from bigdatabowl_spark.kernels.eppa import EppaPriors

    ref = EppaPriors.default()
    assert np.array_equal(p1.p_t, ref.p_t)
    assert np.array_equal(p1.T_given_L, ref.T_given_L)
    save_priors(spark, d)  # resume: overwrite converges
    p2 = load_priors(spark, d)
    assert np.array_equal(p1.p_t, p2.p_t)
    assert np.array_equal(p1.T_given_L, p2.T_given_L)


def test_prior_lifecycle_query_bitexact(spark):
    """The lifecycle catalog query certifies the reloaded-prior kernel run is
    bit-identical to the in-memory-prior run on every pass frame."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    rows = (
        CATALOG["s4_prior_artifact_lifecycle"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) > 0
    assert all(r["bitexact"] for r in rows)


def test_ensemble_artifact_roundtrip(spark, tmp):
    """S6: the tree-ensemble model binary saved to parquet reloads
    bit-identically (float64 round-trips exactly), and a reloaded model
    scores a batch bit-identically to the in-memory spec."""
    import numpy as np

    from bigdatabowl_spark.kernels.ensemble import TreeEnsemble
    from bigdatabowl_spark.sources.artifacts import load_ensemble, save_ensemble

    d = f"{tmp}/ensemble"
    ref = TreeEnsemble.default()
    save_ensemble(spark, ref, d)
    got = load_ensemble(spark, d)
    for field in ("feat_a", "thr_a", "feat_b", "thr_b", "leaves", "tree_class", "epvals"):
        assert np.array_equal(getattr(got, field), getattr(ref, field)), field
    rng = np.random.default_rng(7)
    X = rng.normal(size=(257, 26))
    assert np.array_equal(got.expectation(X), ref.expectation(X))
    save_ensemble(spark, ref, d)  # resume: overwrite converges (S12)
    again = load_ensemble(spark, d)
    assert np.array_equal(again.leaves, ref.leaves)


def test_forest_artifact_roundtrip(spark, tmp):
    """S6 r6: the ARBITRARY-depth forest model binary (xgboost-JSON node
    relations as parquet) reloads with identical arrays and scores a batch
    bit-identically — the depth-4 generalization of the depth-2 artifact."""
    import numpy as np

    from bigdatabowl_spark.kernels.ensemble import FlatForest
    from bigdatabowl_spark.sources.artifacts import load_forest, save_forest

    d = f"{tmp}/forest"
    ref = FlatForest.default_deep(depth=4)
    save_forest(spark, ref, d)
    got = load_forest(spark, d)
    for field in (
        "feat", "thr", "left", "right", "default_left", "leaf_val",
        "offsets", "depth", "tree_class", "epvals",
    ):
        assert np.array_equal(getattr(got, field), getattr(ref, field)), field
    assert got.base_score == ref.base_score
    rng = np.random.default_rng(7)
    X = rng.normal(size=(257, 26))
    assert np.array_equal(got.expectation(X), ref.expectation(X))
    save_forest(spark, ref, d)  # resume: overwrite converges (S12)
    again = load_forest(spark, d)
    assert np.array_equal(again.leaf_val, ref.leaf_val)


def test_relational_spec_artifact_regenerates_identical_sql(spark, tmp):
    """S6 for the relational twin: the m1 spec rows round-trip through
    parquet and regenerate a CASE cascade string-identical to the static
    oracle SQL — the property m1's builder asserts at run time."""
    from bigdatabowl_spark.plans.advanced import _MARGINS, _SPEC_ROWS, _margins_from
    from bigdatabowl_spark.sources.artifacts import roundtrip_relational_spec

    loaded = roundtrip_relational_spec(spark, _SPEC_ROWS, f"{tmp}/relspec")
    assert _margins_from(loaded) == _MARGINS


def test_corrupt_file_resilience(spark, sf_dir, tmp_path):
    """File-level fault tolerance: with ignoreCorruptFiles set, one garbage
    file among 10^5 parquet parts must not kill a 6-hour scan — the job
    reads every valid row and skips the bad file. (Row-level faults are the
    s13 error channel; this is the file-level twin.)"""
    import pyspark.sql.functions as F

    good = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    good.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "data"))
    (tmp_path / "data" / "part-corrupt.parquet").write_bytes(b"not a parquet file")

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        got = spark.read.schema("id long, v long").parquet(str(tmp_path / "data"))
        assert got.count() == 100
        assert got.agg(F.sum("v")).collect()[0][0] == 9900
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_npy_datasource_shapes_and_empty(spark, tmp_path):
    """S16 source: 2-D arrays flatten in C order; an artifact-free dir
    yields an empty table with the declared schema, not an error."""
    import numpy as np

    from bigdatabowl_spark.sources.npy_source import NpyArtifactDataSource

    spark.dataSource.register(NpyArtifactDataSource)
    d = tmp_path / "npy"
    d.mkdir()
    np.save(d / "m.npy", np.array([[1.0, 2.0], [3.0, 4.0]]))
    rows = (
        spark.read.format("npy_artifact").option("path", str(d)).load().collect()
    )
    assert [(r["file"], r["idx"], r["value"]) for r in sorted(rows, key=lambda r: r["idx"])] == [
        ("m", 0, 1.0),
        ("m", 1, 2.0),
        ("m", 2, 3.0),
        ("m", 3, 4.0),
    ]
    empty = d / "none"
    empty.mkdir()
    df = spark.read.format("npy_artifact").option("path", str(empty)).load()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["file", "idx", "value"]


def test_npy_sink_save_mode_semantics(spark, tmp_path):
    """S17 sink: append refuses to clobber an existing artifact (job fails
    before publishing), overwrite replaces it, and no tmp stage files
    survive either path."""
    import numpy as np
    import pytest as _pytest

    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactDataSource,
        NpyArtifactSink,
    )

    spark.dataSource.register(NpyArtifactSink)
    spark.dataSource.register(NpyArtifactDataSource)
    d = tmp_path / "sink"
    d.mkdir()
    df = spark.createDataFrame(
        [("a", 0, 1.5), ("a", 1, 2.5)], "file string, idx long, value double"
    ).repartition("file")
    df.write.format("npy_sink").option("path", str(d)).mode("append").save()
    assert np.load(d / "a.npy").tolist() == [1.5, 2.5]
    with _pytest.raises(Exception, match="already exist|append"):
        df.write.format("npy_sink").option("path", str(d)).mode("append").save()
    assert np.load(d / "a.npy").tolist() == [1.5, 2.5]  # unchanged
    df2 = spark.createDataFrame(
        [("a", 0, 9.0)], "file string, idx long, value double"
    ).repartition("file")
    df2.write.format("npy_sink").option("path", str(d)).mode("overwrite").save()
    assert np.load(d / "a.npy").tolist() == [9.0]
    assert not [f for f in os.listdir(d) if ".tmp-" in f]  # stage swept


def test_npy_sink_overwrite_truncates_stale_stems(spark, tmp_path):
    """SaveMode.Overwrite truncates the target dir: a stem written by a
    prior run but absent from this write must not survive to pollute a
    later directory scan."""
    import numpy as np

    from bigdatabowl_spark.sources.npy_source import NpyArtifactSink

    spark.dataSource.register(NpyArtifactSink)
    d = tmp_path / "sink"
    d.mkdir()
    both = spark.createDataFrame(
        [("a", 0, 1.0), ("b", 0, 2.0)], "file string, idx long, value double"
    ).repartition("file")
    both.write.format("npy_sink").option("path", str(d)).mode("append").save()
    assert sorted(f for f in os.listdir(d) if f.endswith(".npy")) == ["a.npy", "b.npy"]
    only_a = spark.createDataFrame(
        [("a", 0, 9.0)], "file string, idx long, value double"
    ).repartition("file")
    only_a.write.format("npy_sink").option("path", str(d)).mode("overwrite").save()
    assert sorted(f for f in os.listdir(d) if f.endswith(".npy")) == ["a.npy"]
    assert np.load(d / "a.npy").tolist() == [9.0]


def test_npy_sink_rejects_multi_task_stem(spark, tmp_path):
    """Two-phase-commit enforcement: rows for one stem spanning multiple
    tasks (caller forgot repartition('file')) must fail the job with
    nothing published — each task's staged file holds only its subset."""
    import pytest as _pytest

    from bigdatabowl_spark.sources.npy_source import NpyArtifactSink

    spark.dataSource.register(NpyArtifactSink)
    d = tmp_path / "sink"
    d.mkdir()
    sc = spark.sparkContext
    # two single-row partitions carrying the SAME stem
    rdd = sc.parallelize([("a", 0, 1.0)], 1).union(sc.parallelize([("a", 1, 2.0)], 1))
    df = spark.createDataFrame(rdd, "file string, idx long, value double")
    assert df.rdd.getNumPartitions() == 2
    with _pytest.raises(Exception, match="more than one task"):
        df.write.format("npy_sink").option("path", str(d)).mode("append").save()
    assert not [f for f in os.listdir(d) if f.endswith(".npy")]  # nothing published
    assert not [f for f in os.listdir(d) if ".tmp-" in f]  # stage swept


def test_npy_stream_replay_validates_frontier(tmp_path):
    """A committed file deleted before a replay must raise (wrong-rows
    guard), not silently shift the slice; recovery is checkpoint reset."""
    import numpy as np
    import pytest as _pytest

    from bigdatabowl_spark.sources.npy_source import NpyArtifactStreamReader

    d = tmp_path / "stream"
    d.mkdir()
    np.save(d / "a.npy", np.array([1.0]))
    np.save(d / "b.npy", np.array([2.0]))
    rdr = NpyArtifactStreamReader({"path": str(d)})
    start = rdr.initialOffset()
    rows, end = rdr.read(start)
    assert len(list(rows)) == 2 and (end["n"], end["last"]) == (2, "b.npy")
    # replay of the committed range is exact while the listing is intact
    assert len(list(rdr.readBetweenOffsets(start, end))) == 2
    (d / "a.npy").unlink()
    with _pytest.raises(ValueError, match="clear the checkpoint"):
        rdr.readBetweenOffsets(start, end)


def test_npy_stream_replay_detects_midrange_rename(tmp_path):
    """A MID-range rename keeps the count AND the n-th filename stable —
    only the offset's prefix signature can see it. Replaying after
    aa.npy → ab.npy must raise, not silently substitute ab's rows; the
    same violated frontier must also poison the forward read path."""
    import numpy as np
    import pytest as _pytest

    from bigdatabowl_spark.sources.npy_source import NpyArtifactStreamReader

    d = tmp_path / "stream"
    d.mkdir()
    for name, v in [("aa.npy", 1.0), ("bb.npy", 2.0), ("cc.npy", 3.0)]:
        np.save(d / name, np.array([v]))
    rdr = NpyArtifactStreamReader({"path": str(d)})
    start = rdr.initialOffset()
    rows, end = rdr.read(start)
    assert len(list(rows)) == 3 and (end["n"], end["last"]) == (3, "cc.npy")
    # rename a committed MID-range file: listing is still 3 files ending
    # in cc.npy, so count+last alone would pass and replay wrong rows
    os.rename(d / "bb.npy", d / "ab.npy")
    with _pytest.raises(ValueError, match="clear the checkpoint"):
        rdr.readBetweenOffsets(start, end)
    with _pytest.raises(ValueError, match="clear the checkpoint"):
        rdr.read(end)


def test_forest_executor_loader_matches_driver_loader(spark, tmp):
    """load_forest_arrays (pure pyarrow, the executor-side path used by
    the mapInPandas scorer) reconstructs exactly what the Spark-side
    load_forest does — same arrays, same base_score, and cached."""
    import numpy as np

    from bigdatabowl_spark.kernels.ensemble import FlatForest
    from bigdatabowl_spark.sources.artifacts import (
        load_forest,
        load_forest_arrays,
        save_forest,
    )

    d = f"{tmp}/forest_exec"
    ref = FlatForest.default_deep(depth=4)
    save_forest(spark, ref, d)
    via_spark = load_forest(spark, d)
    via_arrow = load_forest_arrays(d)
    for field in (
        "feat", "thr", "left", "right", "default_left", "leaf_val",
        "offsets", "depth", "tree_class", "epvals",
    ):
        assert np.array_equal(getattr(via_spark, field), getattr(via_arrow, field)), field
    assert via_spark.base_score == via_arrow.base_score
    assert load_forest_arrays(d) is via_arrow  # per-process cache


def test_compaction_collapses_files_with_disjoint_ranges(spark, sf_dir):
    """s18's layout contract: the compacted rewrite must (a) collapse the
    64-shard fragmented ingest to a handful of size-targeted files and
    (b) leave per-file ts ranges disjoint (range-partitioned + sorted →
    min/max zone maps prune time predicates to single files)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from bigdatabowl_spark.plans.catalog import CATALOG
    from bigdatabowl_spark.plans.sources_queries import _scratch

    CATALOG["s18_compaction_roundtrip"].builder(spark, sf_dir).collect()

    frag = glob.glob(os.path.join(_scratch(sf_dir, "s18_fragmented"), "*.parquet"))
    comp = glob.glob(os.path.join(_scratch(sf_dir, "s18_compacted"), "*.parquet"))
    assert len(frag) >= 32, len(frag)
    assert 0 < len(comp) <= 8, len(comp)

    spans = []
    for f in comp:
        md = pq.read_metadata(f)
        lo = hi = None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            st = col.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((lo, hi))
    spans.sort()
    for (_, prev_hi), (nxt_lo, _) in zip(spans, spans[1:]):
        # boundaries may touch on duplicate timestamps, never interleave
        assert nxt_lo >= prev_hi, spans


def test_load_table_relation_memo(spark, tmp_path):
    """r13: load_table memoizes the lazy relation OBJECT per
    (session, path, mtime, size) — repeated builder calls skip the
    ~0.1-0.2 s footer-read/schema-inference setup, while a rewritten
    table under the same path (fuzz harnesses) invalidates via the
    stat key. Data is never cached: the memo returns a lazy plan."""
    import shutil

    from bigdatabowl_spark.sources.tables import load_table

    src = "/root/testdata/sf0.001/region.parquet"
    path = tmp_path / "region.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, path)
    else:
        shutil.copy(src, path)
    sf = str(tmp_path)

    a = load_table(spark, sf, "region")
    b = load_table(spark, sf, "region")
    assert a is b, "same session + unchanged file must hit the memo"
    n0 = a.count()

    # rewrite the table (row removed): the stat key must miss and the
    # fresh read must see the new data
    trimmed = a.limit(n0 - 1).collect()
    shutil.rmtree(path, ignore_errors=True) if os.path.isdir(path) else path.unlink()
    spark.createDataFrame(trimmed, a.schema).write.parquet(str(path))
    c = load_table(spark, sf, "region")
    assert c is not a, "rewritten file must invalidate the memo"
    assert c.count() == n0 - 1, "fresh read must see the new data"
