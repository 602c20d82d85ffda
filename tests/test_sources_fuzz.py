"""Adversarial-LAYOUT fuzz of the sources/sinks family (VERDICT r9 item 5).

The four per-family data fuzzes (documents/embeddings/events/relational)
randomize VALUES under fixed physical layouts; this file attacks the
S-family's layout seams — the places where a VALUE becomes a PATH
COMPONENT or where a table's file shape changes:

- partition-key values that Spark must escape into directory names
  (`=`, `/`, `%`, unicode, leading/trailing spaces, empty string, NULL)
  — exercised through s10's write→resume→read-back loop and s19's
  partitionBy fact layout;
- the same pathological values as npy artifact FILENAME stems
  (s16/s17/stream_npy round-trip one file per l_returnflag);
- CSV field content that stresses the text sink (embedded separator,
  quotes, newlines, empty-vs-NULL) through s1's TSV round trip;
- EMPTY tables: a partitionBy write of 0 rows produces a data-less
  directory the read-back must still schema; zero artifacts must stream
  as zero rows, not crash;
- single-row partitions / single-event users (s13's error channel
  boundary) and fragmented-then-compacted events (s18).

Every catalog comparison goes through the same builder-vs-DuckDB harness
the driver uses. Stray-file robustness of the npy artifact DataSource
(zero-byte `_SUCCESS`-style droppings, stage dotfiles, a truncated
`.npy`) is pinned by direct tests — those are reader CONTRACTS, not
cross-engine comparisons.

Reference parity: the reference's IO layer is per-week CSVs, pickle/npy
artifact dirs, and a skip-if-exists resume loop
(comb_model_big_run_cpu.py:16-45, play_eppa_cpu.py:670-677) — all run on
curated filenames only; surviving arbitrary key values in paths is part
of this engine's 100 TB posture.
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

SOURCES_QUERIES = [
    "s1_csv_roundtrip",
    "s3_multi_scan_union",
    "s10_partitioned_resume",
    "s13_error_channel",
    "s14_upsert_merge",
    "s15_rollup_reuse",
    "s16_npy_datasource",
    "stream_npy_artifacts",
    "s17_npy_writer_roundtrip",
    "s18_compaction_roundtrip",
    "s19_dpp_star_join",
    "o6_zorder_layout",
    "zonemap_prune_stats",
    "s20_jsonl_roundtrip",
    "stream_jsonl_documents",
]

# Pure-IO operator ids from SURVEY §2.1 (+ the layout extensions O6/ZM1).
# S4 (artifact broadcast read) and S6 (model load) are the kernel/model
# families' surface; S5 (streaming file source) belongs to the events
# stream fuzz.
_IO_OPS = {
    "S1", "S2", "S3", "S7", "S8", "S9", "S10", "S11", "S12", "S13",
    "S14", "S15", "S16", "S17", "S20", "O6", "ZM1",
}

# Oracle-checked queries carrying an IO op tag whose layout axis is owned
# by another suite (each named with its owner, so the guard below stays
# an explicit decision rather than a silent hole).
_COVERED_ELSEWHERE = {
    # availableNow stream + foreachBatch MERGE over the events fixture —
    # test_events_fuzz STREAM_QUERIES runs it on adversarial event data
    "stream_foreach_merge",
    # kernel-per-micro-batch chain: its file-source axis is the staged
    # play-files fixture in tests/test_streaming.py and its oracle reads
    # kernel-staged parquet, not a table this file regenerates
    "stream_eppa_kernel",
    # S13 error-channel over binary payloads: its adversarial axis is
    # BYTES, not layout — owned by tests/test_multimodal_fuzz.py (raw
    # binary fuzz) + test_dedup_fuzz (documents-corpus data fuzz)
    "multimodal_error_channel",
}


def test_fuzz_list_covers_every_sources_query():
    """Exhaustiveness guard: every ORACLE-CHECKED catalog query tagged
    with a pure-IO op is either in SOURCES_QUERIES or explicitly owned by
    another suite — a new S-op query can't silently dodge the layout
    fuzz."""
    import bigdatabowl_spark.plans  # noqa: F401
    from bigdatabowl_spark.plans.catalog import CATALOG

    tagged = {
        n
        for n, q in CATALOG.items()
        if q.oracle and set(q.survey.split(",")) & _IO_OPS
    }
    assert tagged == set(SOURCES_QUERIES) | _COVERED_ELSEWHERE


# Values that become partition directory names (s10: o_orderstatus,
# s19: l_returnflag) and npy artifact filename stems (s16/s17). Every one
# of these is either escaped by Spark's partition layout or must be
# escaped by our artifact stem codec; None rides through as the NULL
# partition / NULL stem.
_PATH_KEYS = [
    "A", "N", "R",              # contract values (s19's dim still matches)
    "héllo wörld",              # unicode + space
    "a=b",                      # '=' — partition dir metacharacter
    "x/y",                      # path separator
    "100%",                     # escape-char collision
    "dot.",                     # trailing dot
    ".lead",                    # leading dot (dotfile collision for stems)
    "trail ",                   # trailing space
    "🦆",                       # astral-plane unicode
    "",                         # empty string
    None,                       # NULL key
]

_TYPES = ["click", "view", "signup", "purchase", "error"]
_SEG = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
_NASTY_TEXT = [
    "plain name",
    "tab\tinside",              # the TSV separator itself
    'quote"inside',
    "comma,inside",
    "uni-çøde ∑",
    "",                         # empty vs NULL through the CSV sink
    None,
]
_EPOCH = dt.datetime(2024, 1, 1)


def _money(rng, lo_cents: int = 1, hi_cents: int = 1_000_000) -> float:
    return rng.randint(lo_cents, hi_cents) / 100.0


def _gen_tables(seed: int):
    rng = random.Random(seed)
    n_c, n_o, n_e = 40, 160, 300

    cust = {
        "c_custkey": list(range(n_c)),
        "c_name": [rng.choice(_NASTY_TEXT) for _ in range(n_c)],
        "c_nationkey": [rng.randrange(25) for _ in range(n_c)],
        "c_acctbal": [rng.choice([0.0, -500.0, _money(rng)]) for _ in range(n_c)],
        "c_mktsegment": [rng.choice(_SEG) for _ in range(n_c)],
    }

    # o_orderstatus drawn from the pathological pool; at least one status
    # gets exactly ONE row (single-row partition file) by pinning order 0
    # to a pool value used nowhere else this seed. The EMPTY STRING is
    # excluded here by design: hive-style layouts cannot represent ''
    # distinct from NULL, so write_partitioned REFUSES it — pinned by
    # test_write_partitioned_refuses_empty_string_key below.
    part_pool = [k for k in _PATH_KEYS if k != ""]
    solo = rng.choice([k for k in part_pool if k is not None])
    statuses = [solo] + [
        rng.choice([k for k in part_pool if k != solo]) for _ in range(n_o - 1)
    ]
    orders = {
        "o_orderkey": list(range(n_o)),  # hits %10==0 and %97==0 (s14)
        "o_custkey": [rng.randrange(n_c) for _ in range(n_o)],
        "o_orderstatus": statuses,
        "o_totalprice": [_money(rng) for _ in range(n_o)],
        "o_orderdate": [
            dt.datetime(1995, 1, 1) + dt.timedelta(days=rng.randrange(2400))
            for _ in range(n_o)
        ],
        "o_orderpriority": [rng.choice(["1-URGENT", "5-LOW"]) for _ in range(n_o)],
    }

    line = {k: [] for k in (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")}
    for o in range(n_o):
        for ln in range(1, rng.choice([0, 1, 2, 3]) + 1):
            line["l_orderkey"].append(o)
            # huge keys stress o6's bit interleave + zonemap's div bucketing
            line["l_partkey"].append(rng.choice([0, 255, 256, 2**40, rng.randrange(200)]))
            line["l_suppkey"].append(rng.choice([0, 255, rng.randrange(10)]))
            line["l_linenumber"].append(ln)
            line["l_quantity"].append(float(rng.randint(1, 50)))
            line["l_extendedprice"].append(rng.choice([0.01, _money(rng)]))
            line["l_discount"].append(rng.randint(0, 10) / 100.0)
            line["l_tax"].append(rng.randint(0, 8) / 100.0)
            line["l_returnflag"].append(rng.choice(_PATH_KEYS))
            line["l_linestatus"].append(rng.choice(["O", "F"]))
            line["l_shipdate"].append(
                orders["o_orderdate"][o] + dt.timedelta(days=rng.choice([0, 30, 365]))
            )

    # events: heavy single-event-user population (s13's <3-events error
    # boundary straddled from both sides), ties, and round-2 values
    ev_rows = []
    us = rng.randint(0, 10**6)
    n_users = 30
    for _ in range(n_e):
        us += rng.choice([0, 1, 60_000_000, rng.randint(1_000, 10**8)])
        user = rng.randrange(n_users)
        ev_rows.append((us, user, rng.choice(_TYPES), rng.randint(1, 20000) / 100.0,
                        rng.randint(0, 99)))
    # users n_users..n_users+5: exactly 1, 2, 3 events (boundary pairs)
    for extra, count in ((0, 1), (1, 2), (2, 3)):
        for j in range(count):
            us += 1_000_000
            ev_rows.append((us, n_users + extra, "view", 0.01, 0))
    events = {
        "event_id": list(range(len(ev_rows))),
        "ts": [_EPOCH + dt.timedelta(microseconds=r[0]) for r in ev_rows],
        "user_id": [r[1] for r in ev_rows],
        "event_type": [r[2] for r in ev_rows],
        "value": [r[3] for r in ev_rows],
        "props": ['{"k": %d}' % r[4] for r in ev_rows],
    }
    return cust, orders, line, events


_SCHEMAS = {
    "customer": pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ]),
    "orders": pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ]),
    "lineitem": pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ]),
    "events": pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]),
}


def _write_sf_dir(tmp_path, cust, orders, line, events) -> str:
    for name, cols in (("customer", cust), ("orders", orders),
                       ("lineitem", line), ("events", events)):
        pq.write_table(pa.table(cols, schema=_SCHEMAS[name]),
                       tmp_path / f"{name}.parquet")
    from bigdatabowl_spark.sources.tables import TABLES

    for name in TABLES:
        if name not in ("customer", "orders", "lineitem", "events"):
            os.symlink(f"{BASE_SF}/{name}.parquet", tmp_path / f"{name}.parquet")
    return str(tmp_path)


@pytest.mark.parametrize("seed", [3101, 3202])
def test_sources_family_fuzz_matches_oracle(spark, tmp_path, seed):
    cust, orders, line, events = _gen_tables(seed)
    sf = _write_sf_dir(tmp_path, cust, orders, line, events)
    res = run_all(spark, sf, SOURCES_QUERIES)
    assert set(res) == set(SOURCES_QUERIES)
    failures = {k: v for k, v in res.items() if v}
    assert not failures, f"seed {seed}: {failures}"


def test_sources_family_on_empty_tables(spark, tmp_path):
    """All four regenerated tables EMPTY: partitionBy of 0 rows, a
    zero-artifact npy dir, an empty fragmented/compacted round trip —
    every query must agree with DuckDB on the empty result, not crash."""
    empties = tuple(
        {f.name: [] for f in _SCHEMAS[t]} for t in
        ("customer", "orders", "lineitem", "events")
    )
    sf = _write_sf_dir(tmp_path, *empties)
    res = run_all(spark, sf, SOURCES_QUERIES)
    failures = {k: v for k, v in res.items() if v}
    assert not failures, f"empty-table failures: {failures}"


def _write_npy(path, values) -> None:
    import numpy as np

    np.save(path, np.array(values, dtype=np.float64))


def test_npy_reader_ignores_stray_files(spark, tmp_path):
    """Reader contract: `_SUCCESS`-style droppings, zero-byte non-npy
    files, and stage DOTFILES are invisible to both the batch and the
    stream reader; only committed `*.npy` files yield rows."""
    from bigdatabowl_spark.sources.npy_source import (
        NpyArtifactDataSource,
        NpyArtifactStreamSource,
    )

    d = tmp_path / "artifacts"
    d.mkdir()
    _write_npy(str(d / "a.npy"), [1.0, 2.0])
    (d / "_SUCCESS").write_bytes(b"")            # zero-byte dropping
    (d / "README.txt").write_text("not an artifact")
    (d / ".b.tmp-42.npy").write_bytes(b"")       # zero-byte stage dotfile

    spark.dataSource.register(NpyArtifactDataSource)
    rows = (
        spark.read.format("npy_artifact").option("path", str(d)).load()
    ).collect()
    assert sorted((r.file, r.idx, r.value) for r in rows) == [
        ("a", 0, 1.0), ("a", 1, 2.0)
    ]

    spark.dataSource.register(NpyArtifactStreamSource)
    out = f"npy_stray_{abs(hash(str(d))) % 10**8}"
    q = (
        spark.readStream.format("npy_artifact_stream")
        .option("path", str(d))
        .load()
        .writeStream.format("memory")
        .queryName(out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    srows = spark.table(out).collect()
    assert sorted((r.file, r.idx, r.value) for r in srows) == [
        ("a", 0, 1.0), ("a", 1, 2.0)
    ]


def test_npy_zero_byte_artifact_fails_loudly(spark, tmp_path):
    """A zero-byte COMMITTED `.npy` is a corrupt artifact: the read must
    raise (numpy's header parse), never silently skip data."""
    from py4j.protocol import Py4JJavaError

    from bigdatabowl_spark.sources.npy_source import NpyArtifactDataSource

    d = tmp_path / "artifacts"
    d.mkdir()
    _write_npy(str(d / "a.npy"), [1.0])
    (d / "truncated.npy").write_bytes(b"")
    spark.dataSource.register(NpyArtifactDataSource)
    with pytest.raises((Py4JJavaError, Exception)):
        spark.read.format("npy_artifact").option("path", str(d)).load().collect()


def test_write_partitioned_refuses_empty_string_key(spark, tmp_path):
    """'' and NULL both land in the hive default-partition directory
    (verified against Spark 4.1), so an empty-string partition value would
    silently read back as NULL — write_partitioned fails loudly instead;
    NULL itself round-trips and resume_filter treats it as its own
    partition."""
    from bigdatabowl_spark.sources.io import resume_filter, write_partitioned

    df = spark.createDataFrame([("", 1), ("A", 2)], "k string, v int")
    with pytest.raises(ValueError, match="EMPTY-STRING"):
        write_partitioned(df, str(tmp_path / "p"), ["k"])

    ok = spark.createDataFrame([("A", 1), (None, 2), ("a=b", 3)], "k string, v int")
    out = str(tmp_path / "ok")
    write_partitioned(ok, out, ["k"])
    # every partition — including NULL's and the escaped 'a=b' — is seen
    # as materialized, so nothing remains to resume
    assert resume_filter(ok, spark, out, "k").count() == 0
    back = spark.read.schema(ok.schema).parquet(out)
    assert sorted(((r.k, r.v) for r in back.collect()), key=str) == sorted(
        [(None, 2), ("A", 1), ("a=b", 3)], key=str
    )


def test_write_partitioned_refuses_null_partition_marker(spark, tmp_path):
    """A GENUINE string value equal to '__HIVE_DEFAULT_PARTITION__' is
    written unescaped into the same directory Spark uses for NULL, so
    existing_partitions/resume_filter would conflate the two — same
    corruption class as '' (round-10 review); refused at write time."""
    from bigdatabowl_spark.sources.io import NULL_PARTITION, write_partitioned

    df = spark.createDataFrame(
        [(NULL_PARTITION, 1), ("A", 2)], "k string, v int"
    )
    with pytest.raises(ValueError, match="marker"):
        write_partitioned(df, str(tmp_path / "p"), ["k"])


def test_write_partitioned_single_pass(spark, tmp_path):
    """The ''-guard must ride the write's own pass over the input — a
    pre-write count() re-executed a COMPUTED input's whole upstream plan
    (the normal case: the reference writes kernel output), doubling the
    job at scale (VERDICT r10). An accumulator inside the lineage counts
    how many rows the upstream plan actually produced across ALL actions:
    exactly n_rows means one evaluation."""
    import bigdatabowl_spark.sources.io as io_mod

    acc = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame(
        [("A", 1), ("B", 2), (None, 3), ("a=b", 4)], "k string, v int"
    )

    def tick(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    computed = base.repartition(2).mapInPandas(tick, base.schema)
    out = str(tmp_path / "p")
    io_mod.write_partitioned(computed, out, ["k"])
    assert acc.value == 4, f"input plan evaluated {acc.value / 4:.1f} times"
    back = spark.read.schema(base.schema).parquet(out)
    assert back.count() == 4

    # non-string partition columns are never wrapped (cast can't yield '')
    # and the write stays single-pass for them too
    acc2 = spark.sparkContext.accumulator(0)
    ints = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")

    def tick2(batches):
        for pdf in batches:
            acc2.add(len(pdf))
            yield pdf

    io_mod.write_partitioned(
        ints.mapInPandas(tick2, ints.schema), str(tmp_path / "q"), ["k"]
    )
    assert acc2.value == 2


def test_csv_null_token_collision(spark, tmp_path):
    """Pins the KNOWN trade of s1's explicit null token: a field value
    literally equal to the two-character string \\N is written unquoted
    and reads back as NULL — inherent to any in-band sentinel (round-10
    review). Documents the aliasing; newline-/sentinel-bearing exports
    belong in parquet."""
    from bigdatabowl_spark.sources.io import read_csv_schema

    df = spark.createDataFrame(
        [(1, "\\N"), (2, "plain"), (3, None)], "id int, s string"
    )
    path = str(tmp_path / "csv")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("nullValue", "\\N")
        .csv(path)
    )
    back = read_csv_schema(spark, path, df.schema, nullValue="\\N")
    got = {r.id: r.s for r in back.collect()}
    # id=1's genuine "\N" value collapsed into NULL — the documented alias
    assert got == {1: None, 2: "plain", 3: None}


def test_stem_codec_roundtrip_properties():
    """Property check (no Spark): for arbitrary key values the stem codec
    round-trips exactly, never emits a path separator or a dotfile-
    colliding leading '.', and is injective over the tried values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdatabowl_spark.sources.npy_source import stem_decode, stem_encode

    seen: dict[str, object] = {}

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(st.none(), st.text(max_size=40)))
    def check(value):
        enc = stem_encode(value)
        assert stem_decode(enc) == value
        assert "/" not in enc and "\x00" not in enc
        assert enc and not enc.startswith(".")
        # filename with suffix must parse back to the same stem
        assert f"{enc}.npy"[: -len(".npy")] == enc
        if enc in seen:
            assert seen[enc] == value  # injective
        seen[enc] = value

    check()


def test_partition_value_codec_properties():
    """partition_encode/decode (the companion to write_partitioned's
    ''/marker refusal): exact round trip, injective, and the encoded
    value is always hive-representable (never '' / NULL_PARTITION)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdatabowl_spark.sources.io import (
        NULL_PARTITION,
        partition_decode_value,
        partition_encode_value,
    )

    seen: dict = {}

    @settings(max_examples=300, deadline=None)
    @given(
        st.one_of(
            st.none(),
            st.just(""),
            st.just(NULL_PARTITION),
            st.just("%E"),
            st.just("%H"),
            st.text(max_size=30),
        )
    )
    def check(value):
        enc = partition_encode_value(value)
        assert partition_decode_value(enc) == value
        if value is not None:
            assert enc != "" and enc != NULL_PARTITION
        key = ("null",) if enc is None else enc
        if key in seen:
            assert seen[key] == value  # injective
        seen[key] = value

    check()


def test_partition_value_codec_spark_roundtrip(spark, tmp_path):
    """Column-expression codec == Python twin, and the encoded layout
    round-trips EVERY pathological key — including the two values
    write_partitioned refuses raw ('' and the NULL_PARTITION marker)."""
    import pyspark.sql.functions as F

    from bigdatabowl_spark.sources.io import (
        NULL_PARTITION,
        partition_decode,
        partition_encode,
        partition_encode_value,
        write_partitioned,
    )

    keys = _PATH_KEYS + [NULL_PARTITION, "%E", "%H", "%", "%%E"]
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k string, v int")

    enc_rows = df.select(
        "k", partition_encode(F.col("k")).alias("enc")
    ).collect()
    for r in enc_rows:
        assert r.enc == partition_encode_value(r.k), r

    staged = df.select(partition_encode(F.col("k")).alias("k"), "v")
    out = str(tmp_path / "codec")
    write_partitioned(staged, out, ["k"])
    back = (
        spark.read.schema(staged.schema)
        .parquet(out)
        .select(partition_decode(F.col("k")).alias("k"), "v")
    )
    assert {(r.k, r.v) for r in back.collect()} == set(rows)


def test_encoded_layout_resume_loop_converges(spark, tmp_path):
    """The codec's full production loop: encode → write_partitioned →
    crash (some partitions missing) → resume_filter on the ENCODED
    column → write remainder → decoded read-back equals the full input.
    Covers the two values a raw layout cannot carry ('' and the
    NULL_PARTITION marker) plus NULL and escaped keys."""
    import pyspark.sql.functions as F

    from bigdatabowl_spark.sources.io import (
        NULL_PARTITION,
        partition_decode,
        partition_encode,
        resume_filter,
        write_partitioned,
    )

    keys = ["A", "", NULL_PARTITION, "a=b", "%E", None, "🦆"]
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k string, v int")
    enc = df.select(partition_encode(F.col("k")).alias("k"), "v")
    out = str(tmp_path / "loop")

    # first run "crashes" after materializing a strict subset
    write_partitioned(enc.filter("v < 3"), out, ["k"])
    remaining = resume_filter(enc, spark, out, "k")
    assert {r.v for r in remaining.collect()} == {3, 4, 5, 6}

    write_partitioned(remaining, out, ["k"])
    assert resume_filter(enc, spark, out, "k").count() == 0
    back = (
        spark.read.schema(enc.schema)
        .parquet(out)
        .select(partition_decode(F.col("k")).alias("k"), "v")
    )
    assert {(r.k, r.v) for r in back.collect()} == set(rows)


def test_resume_filter_anti_join_path(spark, tmp_path, monkeypatch):
    """Past _RESUME_ISIN_MAX done-partitions the resume drop switches to a
    broadcast anti-join; it must agree with the isin path exactly,
    including NULL-key rows and value-space (unescaped) comparison."""
    import bigdatabowl_spark.sources.io as io_mod

    rows = [("a=b", 1), ("p2", 2), ("p3", 3), (None, 4), ("new", 5), (None, 6)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = str(tmp_path / "sink")
    # materialize only a subset: a=b, p2, and the NULL partition
    io_mod.write_partitioned(
        df.filter("v in (1, 2, 4)"), out, ["k"]
    )

    expected = {("p3", 3), ("new", 5)}  # p3/new missing; NULL already done

    isin_remaining = {
        (r.k, r.v) for r in io_mod.resume_filter(df, spark, out, "k").collect()
    }
    assert isin_remaining == expected

    monkeypatch.setattr(io_mod, "_RESUME_ISIN_MAX", 1)
    anti_remaining = {
        (r.k, r.v) for r in io_mod.resume_filter(df, spark, out, "k").collect()
    }
    assert anti_remaining == expected
