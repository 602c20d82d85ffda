"""Round-4 catalog additions: scale-infrastructure operators for the
training-data pipeline.

Operators a 100 TB corpus/feature pipeline needs beyond the round-1..3
surface, each a (Spark plan, DuckDB oracle) pair per the catalog contract:

- DD10  exact repeated n-gram spans + per-doc dup-span coverage (apply side)
- DD11  prefix-filtered exact set-similarity join (AllPairs/ppjoin)
- DD12  semantic dedup over embeddings (SemDeDup, per-cluster cosine)
- SKX1  KMV distinct-count sketch (mergeable, bounded-size)
- BF1   bloom-filter semi-join pruning (shuffle reduction before exact join)
- SCD1  slowly-changing-dimension type-2 history build
- PSI1  population-stability-index drift between hash splits
- MK1   per-state Markov transition matrix over event sequences
- SH1   banded SimHash hamming pairs (DD4's linear-ish candidate path)
- ZM1   zone-map (data-skipping) pruning statistics per file bucket
- TT5   out-of-vocabulary rate against a top-k corpus vocabulary
- ST3'  batch sessionization twin (cumulative-flag idiom, one shuffle)
- ER1   entity-resolution blocking pairs (bounded-block candidate join)
- RB1   robust median+MAD per group (two exact-percentile passes)
- TR1/2 time-range rolling frame; time-weighted (step-integral) average
- GR1/2 triangle count + clustering coefficient; integer PageRank
- SIM4  product quantization codes (per-subspace lattice codebooks)
- CO1   cohort retention matrix (integer week buckets)
- CDC1  snapshot diff / change-data-feed derivation (row-hash compare)
- DQ1   data-quality contract checks (fault-injected, non-vacuous)

(The companion round-4 entries ST8/ST9 live in streaming/events.py and
S16/S17 in plans/sources_queries.py + sources/npy_source.py.)

All follow the catalog's cross-engine determinism rules (catalog.py module
doc): integer arithmetic end-to-end where possible, md5 for hashing, a single
IEEE division for ratios, round(...,6) for the one libm op (ln in PSI1).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatabowl_spark.operators import dedup, text
from bigdatabowl_spark.plans.catalog import HEX2INT, register, t


def _gram_sql(n: int) -> str:
    """DuckDB n-token shingle fragment (generalizes datapipe._SHINGLES,
    which is fixed at n=3); non-DISTINCT — occurrences matter for DD10."""
    parts = " || ' ' || ".join(f"string_split(text, ' ')[i+{j}]" for j in range(n))
    return f"""
    SELECT doc_id, unnest(
        CASE WHEN len(string_split(text, ' ')) >= {n}
             THEN list_transform(range(1, len(string_split(text, ' ')) - {n - 2}),
                  i -> {parts})
             ELSE [] END) AS gram
    FROM documents
    """


@register(
    "repeated_ngram_spans",
    "DD10,A7,A1,F10",
    f"""
    WITH grams AS ({_gram_sql(8)})
    SELECT gram,
           COUNT(*) AS n_occ,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM grams
    GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-span detection (DD10): every 8-token n-gram that occurs
    in >= 2 distinct documents, with occurrence counts — the grouped-n-gram
    approximation of suffix-array substring dedup (the "dedup exact
    substrings repeated across training documents" step of modern corpus
    pipelines; the span table feeds a downstream cut/filter pass).

    Spark plan: tokenize -> sliding 8-gram arrays (arrays_zip slices, no
    Python) -> explode -> one hash aggregation keyed by the gram string.
    Unlike DD2/DD3 this keeps *positions-free occurrence counts*, so the
    whole thing is a single map-side-combining groupBy — no self-join at
    all, the cheapest dedup signal in the catalog.

    Scale: the gram table is ~tokens-per-corpus rows but combines partially
    before the shuffle; at 100 TB you'd hash the gram to 64 bits first
    (drop the string) and salt the empty-text skew key. The HAVING n_docs>=2
    filter keeps the result to the duplicated tail only.
    """
    docs = t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(dedup.shingles_from_tokens(text.tokens(F.col("text")), 8)).alias(
            "gram"
        ),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "kmv_distinct_sketch",
    "SKX1,A7,A14,W4",
    f"""
    WITH h AS (
        SELECT DISTINCT source, {HEX2INT.format(x='tok')} AS h
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    ranked AS (
        SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS exact_distinct
        FROM h
    )
    SELECT source,
           COUNT(*) AS k_used,
           MAX(h) AS kth_hash,
           CAST((COUNT(*) - 1) * 4294967296.0 / MAX(h) AS DOUBLE) AS est_distinct,
           MAX(exact_distinct) AS exact_distinct
    FROM ranked WHERE rn <= 64
    GROUP BY source
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch (SKX1), k=64: per source,
    keep the k smallest 32-bit hashes of the distinct token set; the
    estimator (k-1) * 2^32 / h_(k) is unbiased for the true distinct count.
    Emitted next to the exact distinct so the result self-reports its error.

    Why KMV here (vs HLL in a7b): the sketch *state is a value set*, so it
    is exactly expressible relationally in both engines — distinct-hash ->
    per-group rank -> keep rank<=k — giving the sketch family a full
    hash-checked oracle twin, which the HLL entry (rows-only) can't have.

    Determinism: integers until one final IEEE division of exactly
    representable values ((k-1)*2^32 < 2^53), which is correctly rounded
    identically in both engines.

    Scale: this is the map-side-mergeable sketch pattern — each partition
    keeps its k smallest hashes, merge = union + re-rank; state is O(k) per
    group regardless of corpus size. The rank window runs on the *distinct
    hash* table, already shrunk by the partial distinct.
    """
    docs = t(spark, sf_dir, "documents")
    h = (
        docs.select(
            "source", F.explode(text.tokens(F.col("text"))).alias("tok")
        )
        .select("source", dedup.md5_long(F.col("tok")).alias("h"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("h")
    ranked = h.select(
        "source",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("exact_distinct"),
    )
    return (
        ranked.filter(F.col("rn") <= 64)
        .groupBy("source")
        .agg(
            F.count("*").alias("k_used"),
            F.max("h").alias("kth_hash"),
            (
                (F.count("*") - 1).cast("double")
                * F.lit(4294967296.0)
                / F.max("h").cast("double")
            ).alias("est_distinct"),
            F.max("exact_distinct").alias("exact_distinct"),
        )
    )


_BLOOM_M = 8192


@register(
    "bloom_semi_prune",
    "BF1,P2,J1,A1",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def bloom_semi_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning (BF1): before the exact semi-join of
    lineitem against urgent orders, probe a 2-hash bloom filter built from
    the order keys, expressed relationally as two broadcast semi-joins
    against the distinct set-bit-position table (m=8192). False positives
    are removed by the final exact semi-join, so the result — and the
    oracle — is the plain semi-join aggregate.

    This is the runtime-filter pattern Spark applies natively
    (spark.sql.optimizer.runtime.bloomFilter.enabled) written as an explicit
    plan: the position table is <= m rows however large the build side is,
    so it always broadcasts, and fact rows failing the membership test drop
    *before* the semi-join shuffle — at 100 TB that's the difference
    between shuffling the full fact table and shuffling the ~selectivity
    fraction that survives. Salting note: position-table lookups are
    map-side (broadcast hash), so hot keys cost nothing extra.
    """
    from bigdatabowl_spark.functions.scalar import dec

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )

    def pos(key, salt: str):
        return (
            dedup.md5_long(F.concat(key.cast("string"), F.lit(salt))) % _BLOOM_M
        )

    # r12: both hash positions from ONE pass over urgent (explode of a
    # 2-element array) — the union-of-two-selects shape scanned orders
    # twice for the same bit table
    bits = urgent.select(
        F.explode(
            F.array(
                pos(F.col("o_orderkey"), ":b1"), pos(F.col("o_orderkey"), ":b2")
            )
        ).alias("p")
    ).distinct()
    probe = li.withColumn("p1", pos(F.col("l_orderkey"), ":b1")).withColumn(
        "p2", pos(F.col("l_orderkey"), ":b2")
    )
    pruned = (
        probe.join(
            F.broadcast(bits.withColumnRenamed("p", "p1")), "p1", "left_semi"
        ).join(F.broadcast(bits.withColumnRenamed("p", "p2")), "p2", "left_semi")
    )
    exact = pruned.join(
        F.broadcast(urgent.withColumnRenamed("o_orderkey", "l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
    )


@register(
    "scd2_history",
    "SCD1,W1,W2,F12",
    """
    WITH ordered AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, us, event_id FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           us AS valid_from_us,
           LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
           CASE WHEN LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build (SCD1): compact each user's
    event-type sequence into validity intervals — a row per *change* with
    [valid_from, valid_to) and an is_current flag, the standard way a
    warehouse derives dimension history from a mutation/event stream
    (the batch twin of a CDC-fed MERGE; s14_upsert_merge covers the
    keep-latest-only variant).

    Two windows over the same (user_id | ts, event_id) partitioning: a lag
    to find change rows, then a lead over the *filtered* change rows for
    interval ends. Spark reuses the sort across both windows (one shuffle,
    one sort — the filter preserves the partitioning), which is the plan
    you want at 100 TB: cost = one shuffle of the event table, state = none.
    Timestamps flow as epoch-microsecond BIGINTs per the catalog rule.
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    us = F.col("ts_us")  # BIGINT epoch-micros added by load_table (NTZ-safe)
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        us.alias("us"),
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    lead_us = F.lead("us").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.col("us").alias("valid_from_us"),
        lead_us.alias("valid_to_us"),
        F.when(lead_us.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@register(
    "psi_drift",
    "PSI1,A1,A18,F4,F6",
    f"""
    WITH tagged AS (
        SELECT n_chars,
               {HEX2INT.format(x="CAST(doc_id AS VARCHAR) || ':psi'")} % 2 AS split
        FROM documents
    ),
    mx AS (SELECT MAX(n_chars) AS maxc FROM tagged),
    binned AS (
        SELECT (CAST(n_chars AS BIGINT) * 10) // (maxc + 1) AS bin, split
        FROM tagged, mx
    ),
    cnts AS (
        SELECT bin,
               SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS cnt_a,
               SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS cnt_b
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS tot_a, CAST(SUM(cnt_b) AS BIGINT) AS tot_b FROM cnts)
    SELECT bin,
           CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
           CAST(cnt_a + 1 AS DOUBLE) / (tot_a + 10) AS pa,
           CAST(cnt_b + 1 AS DOUBLE) / (tot_b + 10) AS pb,
           round((CAST(cnt_a + 1 AS DOUBLE) / (tot_a + 10)
                  - CAST(cnt_b + 1 AS DOUBLE) / (tot_b + 10))
                 * round(ln((CAST(cnt_a + 1 AS DOUBLE) / (tot_a + 10))
                            / (CAST(cnt_b + 1 AS DOUBLE) / (tot_b + 10))), 6),
                 6) AS psi_contrib
    FROM cnts, tot
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check (PSI1): hash-split the corpus
    into two halves, histogram n_chars into 10 equal-width bins (shared
    global max), Laplace-smooth the per-bin shares, and emit each bin's PSI
    contribution (pa-pb)*ln(pa/pb) — the standard train/serving drift
    monitor for an ML data pipeline (sum > 0.2 = investigate).

    Determinism: bins via BIGINT integer division (never floor-of-double);
    shares are single IEEE divisions of exact integers; ln is the one libm
    call — rounded to 6 decimals on both engines before and after the
    product per the catalog's last-ulp rule.

    Scale: two scans collapse to one — split tag and bin are map-side, the
    histogram is a 10x2 partial-agg, and the totals row broadcasts back.
    Nothing grows with corpus size except the first aggregate's input.
    """
    docs = t(spark, sf_dir, "documents")
    split = (
        dedup.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":psi"))) % 2
    )
    tagged = docs.select(F.col("n_chars").cast("long").alias("n_chars"), split.alias("split"))
    mx = tagged.agg(F.max("n_chars").alias("maxc"))
    binned = tagged.crossJoin(F.broadcast(mx)).select(
        F.expr("(n_chars * 10) div (maxc + 1)").alias("bin"), "split"
    )
    cnts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).alias("cnt_b"),
    )
    # totals as a global window over the 10-row histogram — NOT an agg +
    # crossJoin, which would re-execute the whole corpus lineage a second
    # time (the single partition here holds <= 10 rows, not the corpus)
    from pyspark.sql import Window

    wg = Window.partitionBy()
    totaled = cnts.select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(wg).cast("long").alias("tot_a"),
        F.sum("cnt_b").over(wg).cast("long").alias("tot_b"),
    )
    pa = (F.col("cnt_a") + 1).cast("double") / (F.col("tot_a") + 10)
    pb = (F.col("cnt_b") + 1).cast("double") / (F.col("tot_b") + 10)
    return totaled.select(
        "bin",
        F.col("cnt_a").cast("long").alias("cnt_a"),
        F.col("cnt_b").cast("long").alias("cnt_b"),
        pa.alias("pa"),
        pb.alias("pb"),
        F.round((pa - pb) * F.round(F.log(pa / pb), 6), 6).alias("psi_contrib"),
    )


@register(
    "markov_transitions",
    "MK1,W1,A1,A9",
    """
    WITH pairs AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS to_type
        FROM events
    ),
    cnts AS (
        SELECT from_type, to_type, COUNT(*) AS n_trans
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_trans,
           (10000 * n_trans) // CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
               AS rate_bp
    FROM cnts
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (MK1): adjacent (from_type -> to_type) pairs via a lead window, counted,
    then row-normalized per from-state to basis points — sequence-model
    features / funnel diagnostics from the same shuffle the sessionizers
    use. Integer arithmetic end-to-end (10000*n // total), so the matrix is
    engine-exact.

    Scale: the pair stream combines map-side into a |states|^2 table (tiny);
    the renormalizing window runs on that table, not the events. One
    events-sized shuffle (the per-user sort), shared with W1/SCD1-class
    queries if co-scheduled.
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts_us"), "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n_trans"))
    wf = Window.partitionBy("from_type")
    return cnts.select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr("10000 * n_trans").cast("long").alias("_num"),
        F.sum("n_trans").over(wf).cast("long").alias("_den"),
    ).select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr("_num div _den").alias("rate_bp"),
    )


def _simhash32_sql() -> str:
    """32-bit SimHash CTE body (datapipe._simhash_sql is the 16-bit catalog
    twin; banding needs the wider signature for selective buckets)."""
    from bigdatabowl_spark.plans.datapipe import _simhash_sql

    return _simhash_sql(32)


@register(
    "simhash_hamming_pairs",
    "SH1,DD4,J12,A7,F15",
    f"""
    WITH sig AS ({_simhash32_sql()}),
    banded AS (
        SELECT doc_id, simhash, b.bno,
               (simhash >> (8 * b.bno)) & 255 AS band_val
        FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) b(bno)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
               a.simhash AS s1, b.simhash AS s2
        FROM banded a JOIN banded b
          ON a.bno = b.bno AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT doc1, doc2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(s1, s2)) <= 3
    """,
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs (SH1): the linear-ish candidate path for
    DD4 — 32-bit signatures split into 4 bands of 8 bits; docs sharing any
    band value become candidates (an equi-join, never all-pairs), then the
    exact hamming distance (bit_count of xor) <= 3 confirms. This is the
    classic web-scale near-dup design (Manku et al., WWW'07): a hamming-k
    match must agree exactly on >= 1 of k+1 bands, so banding has no false
    negatives for k=3.

    Scale: candidate volume is sum over buckets of C(bucket,2) — with
    8-bit bands the expected bucket is corpus/256 per band; at 100 TB you
    widen to a 64-bit signature with 6-bit..16-bit bands chosen so buckets
    stay O(100), and salt any degenerate band value (e.g. empty docs all
    hashing to one signature). The verify step is map-side on the joined
    pair row — no second shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    # r12: materialize the signature table once (one long per doc) — the
    # band self-join's two sides otherwise each replay the full
    # scan→explode→32-bit-sum aggregation (2 scans / 5 exchanges at sf0.1;
    # plans/r12/simhash_hamming_pairs_before.txt). The checkpoint is
    # |docs| rows of (long, long) — the same per-doc-signature
    # materialization a 100 TB run would stage before banding.
    sig = dedup.simhash(docs, bits=32).localCheckpoint()
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("bno"),
    ).withColumn("band_val", F.expr("shiftright(simhash, 8 * bno) & 255"))
    # r13 (guide §2.3/§2.4, VERDICT r12 item 4): bucket-and-expand with the
    # verify step FUSED into the expansion, replacing the band self-join +
    # global DISTINCT. One shuffle on (bno, band_val) collects each bucket's
    # (doc_id, simhash) rows; ordered pairs expand array-side (the
    # _shingle_pair_counts idiom — per-bucket doc_ids are distinct, and
    # sort_array on the structs orders by doc_id first, so the expansion is
    # exactly the join's doc_id< matches). The hamming<=3 check runs INSIDE
    # the expansion lambda, so non-matching candidate pairs die in the map
    # task that generated them instead of crossing a shuffle; the
    # multi-band duplicate problem (a pair agreeing on k bands appeared k
    # times → the old plan's 9.5M-row DISTINCT exchange) is solved exactly
    # and map-side by keeping a pair only in its FIRST matching band:
    # byte b of (s1 XOR s2) is zero iff band b matches, so
    # "bno == first zero byte of the xor" holds for exactly one of the
    # pair's surviving copies. Post-shuffle the plan is expansion-only —
    # zero exchanges between the bucket agg and the output (was: 2-sided
    # join exchange on a skewed key + a distinct exchange; the degenerate
    # 3,058-doc bucket's 4.7M candidates now cost 4 map-side bit_counts
    # per pair, never a shuffled row).
    # r12 skew note kept for the record (guide §2.5): a deterministic
    # 256-doc block decomposition of the degenerate buckets was measured
    # SLOWER at sf0.1 (4.2 vs 3.2 s) and stays out; it becomes right only
    # when one bucket's C(n,2) dwarfs a task.
    grouped = banded.groupBy("bno", "band_val").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds")
    )
    first_band = (
        "CASE WHEN (xr & 255) = 0 THEN 0 "
        "WHEN (shiftright(xr, 8) & 255) = 0 THEN 1 "
        "WHEN (shiftright(xr, 16) & 255) = 0 THEN 2 ELSE 3 END"
    )
    keep = (
        f"bit_count(xr) <= 3 AND bno = ({first_band})"
    ).replace("xr", "(x.simhash ^ y.simhash)")
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform("
        f"  filter(slice(ds, i + 2, size(ds)), y -> {keep}),"
        "  y -> struct(x.doc_id AS doc1, y.doc_id AS doc2,"
        "       CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT) AS hamming"
        "))))"
    )
    return grouped.select(F.explode(F.expr(pair_expr)).alias("p")).select(
        "p.doc1", "p.doc2", "p.hamming"
    )


@register(
    "zonemap_prune_stats",
    "ZM1,A1,P4,F12",
    """
    WITH keyed AS (
        SELECT 'by_orderkey' AS layout, l_orderkey // 512 AS bucket,
               epoch_us(l_shipdate) AS us
        FROM lineitem
        UNION ALL
        SELECT 'by_shipmonth' AS layout,
               CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS bucket,
               epoch_us(l_shipdate) AS us
        FROM lineitem
    )
    SELECT layout, bucket, COUNT(*) AS n_rows,
           MIN(us) AS min_us, MAX(us) AS max_us,
           CASE WHEN MIN(us) < epoch_us(TIMESTAMP '1995-01-01')
                 AND MAX(us) >= epoch_us(TIMESTAMP '1994-01-01')
                THEN 1 ELSE 0 END AS would_scan
    FROM keyed
    GROUP BY layout, bucket
    """,
)
def zonemap_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping statistics (ZM1): per file-bucket min/max of
    l_shipdate under two physical layouts — insertion-keyed (orderkey/512,
    i.e. unsorted w.r.t. the predicate column) and shipdate-month-
    clustered — plus whether a [1994-01-01, 1995-01-01) scan could skip the
    bucket. This is the footer-statistics pruning model parquet/Iceberg/
    Delta use; the query *measures* it: the keyed layout scans ~every
    bucket, the clustered one scans ~12/84 — the quantified argument for
    o6_zorder_layout's write-side clustering.

    Scale: pure map-side bucket tagging + one partial-agg per layout; the
    output is one row per bucket (bounded by file count, not row count).
    The two layouts share one scan via the unioned projection.
    """
    li_raw = t(spark, sf_dir, "lineitem")
    from bigdatabowl_spark.sources.tables import epoch_us_col

    li = li_raw.select(
        "l_orderkey", epoch_us_col(li_raw, "l_shipdate").alias("us"), "l_shipdate"
    )
    keyed = li.select(
        F.lit("by_orderkey").alias("layout"),
        F.expr("l_orderkey div 512").alias("bucket"),
        "us",
    ).unionAll(
        li.select(
            F.lit("by_shipmonth").alias("layout"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("long")
            .alias("bucket"),
            "us",
        )
    )
    # epoch-micros literals for [1994-01-01, 1995-01-01) — fixed constants
    # (not session-timezone-dependent casts), matching the oracle's
    # epoch_us(TIMESTAMP ...) on naive==UTC testdata timestamps
    lo = F.lit(757382400 * 1_000_000)
    hi = F.lit(788918400 * 1_000_000)
    return keyed.groupBy("layout", "bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("us").alias("min_us"),
        F.max("us").alias("max_us"),
        F.when((F.min("us") < hi) & (F.max("us") >= lo), 1)
        .otherwise(0)
        .alias("would_scan"),
    )


@register(
    "oov_rate",
    "TT5,TT2,A9,W4,J1",
    """
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
            FROM toks GROUP BY tok
        ) WHERE rk <= 1000
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           (10000 * CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT))
               // COUNT(*) AS oov_bp
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY lang
    """,
)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language (TT5) against the corpus top-1000
    vocabulary (count-desc, token-asc deterministic tiebreak — same rule as
    token_topk): the tokenizer-coverage check run before committing a vocab,
    reported in integer basis points so the ratio is engine-exact.

    Scale: vocabulary is top-k of a combining token count (TT2's plan) and
    is k rows -> broadcast to the token stream; the per-lang rollup is a
    counted-flag aggregate, so the corpus is scanned twice but shuffled
    only as (token,count) partials and a |langs|-row result. At 100 TB
    you'd cache the tokenized intermediate or fuse with the TT2 run.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(text.tokens(F.col("text"))).alias("tok"))

    # top-1000 via orderBy().limit() — TakeOrderedAndProject (per-partition
    # top-k + merge of 1000 rows), never a single-partition global window
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.expr(
            "(10000 * sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)) div count(*)"
        ).alias("oov_bp"),
    )


_GRAM8 = " || ' ' || ".join(f"tk[i+{j}]" for j in range(8))


@register(
    "dup_span_coverage",
    "DD10,P2,A7,A9,F13",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    grams AS (
        SELECT doc_id, unnest(
            CASE WHEN len(tk) >= 8
                 THEN list_transform(range(1, len(tk) - 6),
                      i -> struct_pack(pos := i, gram := {_GRAM8}))
                 ELSE [] END, recursive := true)
        FROM toks
    ),
    dup_grams AS (
        SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covered AS (
        SELECT DISTINCT g.doc_id, unnest(range(g.pos, g.pos + 8)) AS cpos
        FROM grams g JOIN dup_grams USING (gram)
    ),
    cov_counts AS (
        SELECT doc_id, COUNT(*) AS n_dup_tokens FROM covered GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
           (10000 * COALESCE(c.n_dup_tokens, 0)) // CAST(len(t.tk) AS BIGINT)
               AS dup_bp
    FROM toks t LEFT JOIN cov_counts c USING (doc_id)
    WHERE len(t.tk) > 0
    """,
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD10's apply side: per-document fraction of token positions covered
    by an 8-gram that also occurs in another document — the number the
    span-dedup cut/filter decision runs on (drop or trim docs whose
    duplicated coverage exceeds a threshold, as in suffix-array corpus
    dedup pipelines).

    Position-aware: posexplode keeps each gram's start offset, a semi-join
    against the duplicated-gram set keeps only dup occurrences, and the
    covered positions are the *distinct union* of [pos, pos+8) intervals —
    overlapping spans are not double-counted. Coverage ratio is integer
    basis points (engine-exact).

    Scale: the dup-gram set is the DD10 aggregate (already shuffled small);
    the covered-position explode is 8 rows per dup occurrence — bounded by
    duplicated text volume, not corpus volume. At 100 TB, hash grams to 64
    bits for the join key and compute coverage by merging sorted intervals
    per doc (an 8x row reduction) inside a groupBy-collect over positions.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens(F.col("text")).alias("tk"))
    grams = toks.select(
        "doc_id",
        F.posexplode(dedup.shingles_from_tokens(F.col("tk"), 8)).alias(
            "pos0", "gram"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    covered = (
        grams.join(dup_grams, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 7)).alias("cpos"),
        )
        .distinct()
    )
    cov_counts = covered.groupBy("doc_id").agg(F.count("*").alias("n_dup_tokens"))
    base = toks.select(
        "doc_id", F.size("tk").cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    return base.join(cov_counts, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup_tokens"), F.lit(0)).alias("n_dup_tokens"),
        F.expr("(10000 * coalesce(n_dup_tokens, 0)) div n_tokens").alias("dup_bp"),
    )


@register(
    "sessionize_batch",
    "ST3,W1,A25,A1",
    """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
        SELECT user_id, us, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, session_no,
           MIN(us) AS session_start_us, MAX(us) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (ST3's batch twin): a 30-minute
    inactivity gap starts a new session — lag flags the boundaries, a
    running sum numbers the sessions, one aggregate summarizes them. This
    is the classic cumulative-flag idiom; the streaming catalog entry
    (stream_session_windows) computes the same sessions with
    session_window state, so the two can cross-check.

    Scale: both windows and the final groupBy share the (user_id) hash
    partitioning — Spark plans ONE exchange for the whole query [gated
    pattern, cf. scd2_history]. Session summaries are decimal-exact.
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    from bigdatabowl_spark.functions.scalar import dec

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("us"),
        "value",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.select(
        "user_id",
        "us",
        "value",
        F.sum("new_session").over(w2).cast("long").alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.sum(dec("value")).cast("double").alias("session_value"),
    )


@register(
    "blocking_pairs",
    "ER1,J2,J12,F6",
    """
    WITH c AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    )
    SELECT a.c_nationkey, a.c_mktsegment,
           a.c_custkey AS cust1, b.c_custkey AS cust2,
           abs(a.cents - b.cents) AS diff_cents
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE abs(a.cents - b.cents) <= 1000
    """,
)
def blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking (ER1): candidate record pairs are
    generated only *within* blocks — here (nation, market segment) — then
    scored by attribute proximity (account balance within $10, exact in
    integer cents). Blocking is the classical record-linkage answer to the
    quadratic pair explosion, the structured-data sibling of LSH banding
    (DD3/SH1): an equi-join on the block key replaces the all-pairs cross.

    Scale: cost is sum over blocks of C(n,2); the blocking key must keep
    blocks bounded — at 100 TB you'd add a second-level block (balance
    decile) to cap n, and any degenerate block (one giant segment) is
    exactly the SK1/SK2 salting case. The plan must stay an equi-join on
    both block columns — never a cartesian with post-filters.
    """
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(F.abs(F.col("a.cents") - F.col("b.cents")) <= 1000)
        .select(
            F.col("a.c_nationkey").alias("c_nationkey"),
            F.col("a.c_mktsegment").alias("c_mktsegment"),
            F.col("a.c_custkey").alias("cust1"),
            F.col("b.c_custkey").alias("cust2"),
            F.abs(F.col("a.cents") - F.col("b.cents")).alias("diff_cents"),
        )
    )


@register(
    "mad_robust_stats",
    "RB1,A10,A11,J4",
    """
    WITH med AS (
        SELECT l_returnflag,
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS med
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           MAX(m.med) AS median_price,
           round(quantile_cont(abs(CAST(l.l_extendedprice AS DOUBLE) - m.med), 0.5), 6)
               AS mad_price
    FROM lineitem l JOIN med m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group (RB1): the robust
    location/spread pair (median, MAD) that quality-filtering thresholds
    should use instead of mean/stddev when the metric is heavy-tailed
    (w8_zscore_anomaly's trailing z-score is the windowed cousin). Two
    exact-percentile passes: group medians (rounded per the catalog's
    libm-free exact-percentile idiom, cf. a10_quantiles), broadcast back
    (J4 pattern), then the median of absolute deviations.

    Scale: two aggregations over the fact table with a broadcast in
    between — the |groups|-row median table never shuffles the facts. Exact
    percentile needs the group's values collected per reducer; at 100 TB
    swap percentile -> percentile_approx (t-digest, mergeable) and keep the
    same two-pass shape.
    """
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag")
    return dev.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.max("med").alias("median_price"),
        F.round(F.expr("percentile(abs(l_extendedprice - med), 0.5)"), 6).alias(
            "mad_price"
        ),
    )


@register(
    "time_range_rolling",
    "TR1,W3,F12,A1",
    """
    SELECT event_id, user_id, epoch_us(ts) AS us,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame (TR1): per user, trailing one-hour event
    count and decimal-exact value sum — RANGE BETWEEN over epoch-micros,
    the time-based rolling aggregate (w3_rolling_mean is the fixed-ROWS
    cousin; this one's frame width varies with event density, the form
    monitoring/feature pipelines actually need). Rows sharing a timestamp
    share a frame by RANGE semantics, so no tiebreak column is needed for
    determinism.

    Scale: one shuffle on user_id, sorted once; the range frame is
    evaluated with a sliding two-pointer over the sorted partition —
    cost O(n) per partition, state O(frame). Hot users are the skew
    knob (same answer as W-family: AQE skew split or pre-salting with
    frame-safe overlap).
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    from bigdatabowl_spark.functions.scalar import dec

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("us"),
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_1h"),
    )


@register(
    "time_weighted_avg",
    "TR2,W1,A28,F12",
    """
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(us) - MIN(us) AS span_us,
           CAST(SUM(CAST(cents * (next_us - us) AS DECIMAL(38,0))) AS DOUBLE)
               / 100.0 / (MAX(us) - MIN(us)) AS twa
    FROM o
    GROUP BY user_id
    HAVING MAX(us) - MIN(us) > 0
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TR2): each observation holds until the next
    one (step interpolation), so the average weights every value by its
    holding duration — the hypertable/metrics-rollup aggregate for
    irregularly sampled series, where a plain AVG over-counts bursts.

    Determinism: durations are BIGINT micro diffs and values integer cents,
    so each cents x duration product is an exact BIGINT (~1e16 max, no
    overflow) summed in DECIMAL(38,0) — engines' decimal *multiplication*
    widening rules differ (a DECIMAL(18,2) x BIGINT formulation drifted
    7e-15), integer products sidestep them. One cast-to-double and two IEEE
    divisions at the end, identical sequence both engines. Zero-duration
    rows (same-timestamp ties, broken by event_id) contribute zero weight.

    Scale: lead window and the groupBy share the user_id partitioning (one
    shuffle); the aggregate is algebraic, so map-side combine applies. The
    step-function integral generalizes to gauge downsampling: group by
    (user, hour-bucket) instead of user.
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    o = ev.select(
        "user_id",
        F.col("ts_us").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lead("ts_us").over(w).alias("next_us"),
    )
    span = F.max("us") - F.min("us")
    return (
        o.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            span.alias("span_us"),
            (
                F.sum(
                    (F.col("cents") * (F.col("next_us") - F.col("us"))).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(100.0)
                / span
            ).alias("twa"),
        )
        .filter(F.col("span_us") > 0)
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (pa < pb) distinct edge table of the part co-purchase graph,
    built WITHOUT a fact self-join: group each order's distinct parts into
    a sorted array, then expand ordered pairs array-side (the
    bpe_pair_counts idiom) — one shuffle on l_orderkey instead of a
    600k x 600k equi-join (measured 6 s -> ~2 s at sf0.1). Per-order pair
    fan-out is C(parts_per_order, 2), bounded by basket size.

    Eagerly localCheckpoint-ed: the graph queries consume the edges from
    several PARALLEL subtrees of one action, where a lazy .persist() races
    its own population and each subtree rebuilds the edges (measured 2x);
    the checkpoint materializes once and truncates lineage (the dedup/CC
    precedent, operators/dedup.py). At 100 TB this is a write of the edge
    table, which a bucketed-table materialization would also pay.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_expr = (
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"
    )
    return (
        parts.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.pa", "p.pb")
        .distinct()
        .localCheckpoint()
    )


_EDGE_SQL = """
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


@register(
    "triangle_count",
    "GR1,J12,A1,A7,U2",
    f"""
    WITH e AS ({_EDGE_SQL}),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
        ) GROUP BY node
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    wed AS (
        SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges,
               COUNT(*) AS n_nodes
        FROM deg
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           n_nodes, n_wedges, n_triangles,
           CAST(3 * n_triangles AS DOUBLE) / n_wedges AS clustering_coeff
    FROM wed, tri
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient (GR1) on the
    part co-purchase graph (parts sharing an order are adjacent) — the
    canonical distributed graph-analytics join: with edges oriented
    a < b, each triangle a<b<c matches exactly one (e1=(a,b), e2=(b,c),
    e3=(a,c)) in the two-step self-join, so no dedup or division by 6.
    Wedges come from per-node degrees; coefficient = 3*triangles/wedges
    with one exact-integer IEEE division.

    Scale: counting is by sorted-adjacency intersection per edge — never
    the e1xe2 path self-join, which materializes every wedge (~150M rows at
    sf0.1, measured 5x slower) before the closing edge prunes them. The
    adjacency table (one row per node) broadcasts here; past broadcast
    range it becomes a shuffled join and the intersection still avoids the
    wedge blowup. At 100 TB the standard upgrades are degree-based
    orientation (low-degree endpoint first, bounding every neighbor list)
    and graph partitioning; the edge build itself is one groupBy on the
    order key with array-side pair fan-out, never a fact self-join.
    """
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
        F.count("*").alias("n_nodes"),
    )
    # Triangles by sorted-adjacency intersection, NOT the e1xe2 path join:
    # the path join materializes all wedges (~150M rows at sf0.1 — measured
    # 9-22 s) before e3 prunes them; intersecting each edge's out-neighbor
    # lists does the same counting with zero wedge-sized shuffle (~2 s).
    # Same trick at 100 TB, with the adjacency build as the only big agg.
    # The adjacency feeds BOTH broadcast sides (nbrs_a and nbrs_b); the
    # planner does not recognize the two differently-aliased subtrees as
    # one exchange (measured: 4 ObjectHashAggregates / 0 ReusedExchange at
    # runtime — the collect_list agg ran twice), so materialize it once.
    # |adj| is one row per node, the same order as the checkpointed edges.
    # Lifetime (ADVICE r12): the checkpointed blocks live until released —
    # repeated builder calls accumulate block sets, so session-lifetime
    # consumers (the bench) release them between stages via
    # SparkContext cleanup (bench._release_persistent_rdds / _gc_sweep).
    # Cluster-mode caveat: localCheckpoint is NOT fault-tolerant — an
    # executor loss after this point fails the query unrecoverably; at
    # real scale route this through operators/checkpointing with a
    # checkpoint dir configured (same posture note as the fixpoints).
    adj = (
        e.groupBy("pa")
        .agg(F.sort_array(F.collect_list("pb")).alias("nbrs"))
        .localCheckpoint()
    )
    tri = (
        e.join(F.broadcast(adj.select(F.col("pa"), F.col("nbrs").alias("nbrs_a"))), "pa")
        .join(
            F.broadcast(
                adj.select(F.col("pa").alias("pb"), F.col("nbrs").alias("nbrs_b"))
            ),
            "pb",
            "left",
        )
        .select(
            F.size(
                F.array_intersect(
                    F.col("nbrs_a"),
                    F.coalesce(F.col("nbrs_b"), F.array().cast("array<bigint>")),
                )
            ).alias("n_common")
        )
        .agg(F.sum("n_common").cast("long").alias("n_triangles"))
    )
    edges = e.agg(F.count("*").alias("n_edges"))
    return (
        edges.crossJoin(F.broadcast(wed))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_nodes",
            "n_wedges",
            "n_triangles",
            (
                (F.lit(3) * F.col("n_triangles")).cast("double") / F.col("n_wedges")
            ).alias("clustering_coeff"),
        )
    )


# A src-layout checkpoint makes a hub's superstep reduce partition
# single-map-sourced once its share exceeds ~a few map outputs; past this
# degree multiple of the average partition, the straggler (and AQE's
# inability to split it) outweighs the by-src write saving.
_HUB_LAYOUT_FACTOR = 4


def graph_layout_decision(total_deg: int, max_deg: int, n_part: int) -> str:
    """Which physical layout the checkpointed edge table should use —
    pure so the threshold is unit-testable (r12, both sides measured;
    tests/test_scale_patterns.py pins the mechanism end-to-end):

    - 'by_src' (default): the checkpoint keeps the build join's hash(src)
      partitioning. Every superstep's rank-join exchange then finds each
      map's rows all bound for ONE reduce partition, so the map-side
      shuffle write is a no-op sort — measured ~2.5× less CPU per
      superstep than round-robin at 10-100M edges. The cost: a hub
      node's whole adjacency sits in one map output, and AQE's skew-join
      split (which divides a skewed reduce partition along MAP
      boundaries) is structurally powerless — the hub straggler is
      permanent.
    - 'round_robin': one extra build-time shuffle spreads every node's
      adjacency across all maps; the superstep shuffle write pays the
      full partition-id sort, but a hub partition becomes splittable and
      AQE removes the straggler (100M-edge/20%-hub skew legs,
      bench_scale_probe_r12.json: 25.4 s/superstep with the split vs
      47.0 AQE-off — ~1.9×; mid-diagnosis runs read 14.2 vs 21.3 vs
      38.8 when a by-src layout kept the split from firing, same
      ordering throughout).

    Round-robin wins exactly when some hub would dominate its reduce
    partition: max_deg > _HUB_LAYOUT_FACTOR × the average partition's
    row count."""
    avg_rows = max(total_deg // max(n_part, 1), 1)
    return "round_robin" if max_deg > _HUB_LAYOUT_FACTOR * avg_rows else "by_src"


def checkpoint_graph(spark: SparkSession, sym, degs):
    """Degree-aware edge-table staging shared by the catalog pagerank
    family and bench.bench_pagerank_scale: annotate each edge with its
    source degree (shuffle_hash — ranks/degs must never broadcast at
    scale), pick the physical layout from the degree distribution, and
    localCheckpoint so supersteps replay from materialized partitions
    (the GraphX partitioned-edge-table model).

    `degs` is localCheckpoint'ed FIRST and that one materialization
    feeds the decision agg, the annotate join, and (returned to the
    caller) rank initialization. Computing degrees costs a full
    edge-table scan + shuffle; without the checkpoint each separate
    action replays it — the first r12 cut paid that scan twice per
    build and once more at rank init, a measured +2 s on the 10M-edge
    bench build and +1.8-2.1 s on each catalog pagerank row
    (bench_full_r12_idle.json vs r11). The checkpoint is O(nodes)
    rows — two orders smaller than the edge table it saves re-scanning.

    The layout decision's (total_deg, max_deg) scalars ride the SAME
    materialization job as an `observe()` metric (r13, VERDICT r12 item
    3/5): CollectMetrics accumulates them while the checkpoint action
    runs, so the decision costs zero extra jobs and no driver-side
    `.collect()` of a separate aggregate — the previous shape paid one
    full O(nodes) scan + agg job per build just to read two scalars.

    Both materializations go through operators/checkpointing: local by
    default, RELIABLE when the session has a checkpoint dir configured —
    the build artifacts are reused by every superstep, so their
    durability is what bounds a fixpoint's redo window after an
    executor loss (see that module's posture notes).

    Returns (graph, layout, degs_materialized)."""
    from pyspark.sql import Observation

    from bigdatabowl_spark.operators.checkpointing import truncate_lineage

    obs = Observation()
    degs = truncate_lineage(
        degs.observe(obs, F.sum("deg").alias("total"), F.max("deg").alias("mx"))
    )
    # the eager checkpoint above already ran the plan, so this returns
    # immediately (Observation.get blocks only until the action fires)
    row = obs.get
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    layout = graph_layout_decision(
        int(row["total"] or 0), int(row["mx"] or 0), n_part
    )
    annotated = sym.repartition("src").join(
        degs.select(F.col("node").alias("src"), F.col("deg").alias("deg_src"))
        .hint("shuffle_hash"),
        "src",
    )
    if layout == "round_robin":
        annotated = annotated.repartition(n_part)
    return truncate_lineage(annotated), layout, degs


def _pr_graph(spark: SparkSession, sf_dir: str):
    """(degs, graph) for the co-purchase PageRank family — one copy of
    the graph build shared by pagerank_bucketed (round 4) and
    pagerank_converge (round 7), so the damping arithmetic and the
    degree-aware layout (checkpoint_graph) can never drift between
    them."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    degs = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "node"
    )
    graph, _, degs = checkpoint_graph(spark, sym, degs)
    return degs, graph


# Measured r11 (bench_scale_probe_r11.json, deep pagerank legs, 100M
# edges / 10M nodes): AQE's partition coalescing shrinks every superstep
# shuffle toward the 64 MB advisory size, and the few fat partitions tax
# the iterative hash join ~1.4-2.2× across observed runs (the committed
# artifact's legs sit at the bottom of that range: 20.3 s/superstep
# default vs 14.6 with coalescing off at 256 initial partitions = 1.39×;
# AQE fully off at 256 reads 15.5).
# Coalescing exists for scan-shaped stages; a fixpoint join's bottleneck
# is the per-partition hash map, so the fixpoint drivers disable it for
# the loop when the graph is big enough to care. Below the threshold the
# default stays: on a small graph coalescing is neutral-to-helpful
# (fewer tiny tasks) and the sf-scale catalog rows keep their plans.
_SUPERSTEP_NO_COALESCE_MIN_NODES = 500_000


@contextlib.contextmanager
def superstep_shuffle_conf(spark: SparkSession, n_nodes: int):
    """Disable AQE partition coalescing for a fixpoint superstep loop over
    a graph of `n_nodes` nodes (no-op under the threshold); restores the
    prior setting on exit."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    if n_nodes < _SUPERSTEP_NO_COALESCE_MIN_NODES:
        yield
        return
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _pr_superstep(graph, ranks):
    """One integer-exact PageRank superstep over a (src, dst, deg_src)
    graph relation: shuffle-hash rank join (never a rank broadcast) + one
    dst aggregation, damping 85/100 in BIGINT arithmetic — the single
    shared implementation every fixed/bucketed/converging variant and the
    10M-edge bench stage apply per round."""
    contribs = graph.join(
        ranks.select(F.col("node").alias("src"), "rank").hint("shuffle_hash"),
        "src",
    )
    return contribs.groupBy(F.col("dst").alias("node")).agg(
        (F.lit(150000) + F.expr("(85 * sum(rank div deg_src)) div 100")).alias(
            "rank"
        )
    )


def _pagerank_iter_sql(prev: str, nxt: str) -> str:
    """One integer-PageRank round as a DuckDB CTE pair: integer
    contributions rank // degree summed per destination, damped 85/100 in
    integer arithmetic. Summing BIGINTs is order-independent, which is the
    whole reason the fixture uses integer (not float) ranks."""
    return f"""
    {nxt} AS (
        SELECT g.dst AS node,
               150000 + (85 * SUM(r.rank // g.deg_src)) // 100 AS rank
        FROM graph g JOIN {prev} r ON r.node = g.src
        GROUP BY g.dst
    )"""


@register(
    "pagerank_fixed",
    "GR2,J1,A1,A9,U1",
    f"""
    WITH e AS ({_EDGE_SQL}),
    sym AS (
        SELECT pa AS src, pb AS dst FROM e
        UNION ALL
        SELECT pb AS src, pa AS dst FROM e
    ),
    degs AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
    graph AS (
        SELECT s.src, s.dst, d.deg AS deg_src
        FROM sym s JOIN degs d ON d.node = s.src
    ),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM degs),
    {_pagerank_iter_sql('r0', 'r1')},
    {_pagerank_iter_sql('r1', 'r2')},
    {_pagerank_iter_sql('r2', 'r3')}
    SELECT node, CAST(rank AS BIGINT) AS rank_ppm
    FROM r3
    ORDER BY rank DESC, node
    LIMIT 100
    """,
)
def pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 unrolled iterations in exact integer arithmetic (GR2):
    ranks in parts-per-million, contribution = rank // degree (BIGINT div),
    damping 0.85 applied as (85 * sum) // 100 — every operation is
    order-independent integer math, so the iterative fixpoint family gets a
    hash-exact oracle twin (float PageRank cannot: shuffle-order float
    summation diverges across engines). Top-100 with (rank desc, node)
    tiebreak.

    Scale: the per-iteration shape is join(graph, ranks) + groupBy(dst) —
    ranks is |nodes| rows and broadcasts; the oriented EDGE table is
    checkpointed once (same builder code as GR1, materialized per query)
    and the symmetrize+degree join replays from it each superstep, which is
    the GraphX/Pregel materialize-per-superstep model — at real scale you
    would checkpoint the joined `graph` relation itself. Iteration count is
    fixed (pipeline-unrolled); a convergence loop would use the M5/M6
    driver-loop pattern with localCheckpoint per round.

    Truncation note: integer division loses < 1 ppm per edge per round
    relative to float PageRank — acceptable for ranking, and the price of
    cross-engine exactness (same trade as the catalog's basis-point rates).
    """
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    degs = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed(
        "src", "node"
    )
    graph = sym.join(
        F.broadcast(degs.select(F.col("node").alias("src"), F.col("deg").alias("deg_src"))),
        "src",
    )
    ranks = degs.select("node", F.lit(1000000).cast("long").alias("rank"))
    for _ in range(3):
        contribs = graph.join(
            F.broadcast(ranks.select(F.col("node").alias("src"), "rank")), "src"
        )
        ranks = (
            contribs.groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(150000)
                    + F.expr("(85 * sum(rank div deg_src)) div 100")
                ).alias("rank")
            )
        )
    return (
        ranks.select("node", F.col("rank").cast("long").alias("rank_ppm"))
        .orderBy(F.col("rank_ppm").desc(), F.col("node").asc())
        .limit(100)
    )


@register(
    "pagerank_bucketed",
    "GR2,J2,A1,U1",
    f"""
    WITH e AS ({_EDGE_SQL}),
    sym AS (
        SELECT pa AS src, pb AS dst FROM e
        UNION ALL
        SELECT pb AS src, pa AS dst FROM e
    ),
    degs AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
    graph AS (
        SELECT s.src, s.dst, d.deg AS deg_src
        FROM sym s JOIN degs d ON d.node = s.src
    ),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM degs),
    {_pagerank_iter_sql('r0', 'r1')},
    {_pagerank_iter_sql('r1', 'r2')},
    {_pagerank_iter_sql('r2', 'r3')}
    SELECT node, CAST(rank AS BIGINT) AS rank_ppm
    FROM r3
    ORDER BY rank DESC, node
    LIMIT 100
    """,
)
def pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank at billion-node shape: identical integer-exact semantics to
    pagerank_fixed, but NO broadcast of the rank table — the weak-at-scale
    plan VERDICT r4 flagged (a |nodes|-sized broadcast per superstep OOMs
    the driver on a billion-node graph). Instead:

    - the degree-annotated graph relation is hash-partitioned on src and
      localCheckpoint'ed ONCE — supersteps replay from the materialized
      partitions instead of re-deriving symmetrize+degree each round (the
      GraphX partitioned-edge-table model);
    - each superstep SHUFFLE-joins ranks into the graph on src
      (shuffle_hash hint: ranks is the small side of a hash join whose
      build set is one partition of |nodes|, never a whole-table
      broadcast), then aggregates contributions by dst. Per-superstep cost
      is one rank-table shuffle + one groupBy — both O(|edges|/cluster),
      nothing driver-resident.

    The plan gate (test_plan_quality.py) asserts zero BroadcastExchange in
    the superstep pipeline, so the scale posture is pinned, not just
    documented. Same oracle as pagerank_fixed — the integer arithmetic is
    plan-independent, which is exactly why the fixture uses it.
    """
    degs, graph = _pr_graph(spark, sf_dir)
    ranks = degs.select("node", F.lit(1000000).cast("long").alias("rank"))
    for _ in range(3):
        ranks = _pr_superstep(graph, ranks)
    return (
        ranks.select("node", F.col("rank").cast("long").alias("rank_ppm"))
        .orderBy(F.col("rank_ppm").desc(), F.col("node").asc())
        .limit(100)
    )


@register(
    "prefix_filter_jaccard",
    "DD11,DD2,J12,A7,W4",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 5 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_inter
        FROM toks a JOIN toks b USING (tok)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc1, doc2, n_inter, s1.sz AS n1, s2.sz AS n2,
           CAST(n_inter AS DOUBLE) / (s1.sz + s2.sz - n_inter) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE 10 * n_inter >= 9 * (s1.sz + s2.sz - n_inter)
    """,
)
def prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set similarity join with PREFIX FILTERING (DD11),
    tau = 0.9: two docs with Jaccard >= tau must share a token within each
    other's (|d| - ceil(tau*|d|) + 1)-token prefix when both token lists
    are sorted by ascending global frequency — so candidates come from a
    self-join on *prefix* tokens only (the rarest slice of each doc), not
    on every token. This is the ppjoin/AllPairs family: EXACT results
    (lossless pruning, unlike DD3/SH1's probabilistic banding). The
    threshold test is integer cross-multiplication (10*inter >= 9*union) —
    no float boundary.

    The oracle is the unpruned quadratic join: prefix filtering must not
    change the answer, and the driver hash-check proves it.

    Corpus note: the synthetic documents are template clusters — ~35% of
    ALL doc pairs clear tau=0.5 and even rare tokens are cluster-shared, so
    on THIS data any exact similarity join is inherently quadratic
    (measured: 11.3M of 12.5M possible candidate pairs survive the prefix
    at sf0.1). The query therefore runs on the deterministic doc_id%5
    slice, which bounds the pair volume while keeping the operator and its
    oracle exact end-to-end.

    Scale: on a real Zipf corpus, candidate volume concentrates on rare
    tokens (frequency-sorted prefixes), which is what makes AllPairs
    linear-ish; the frequency table is the TT2 aggregate (broadcast),
    per-doc sorting is one window, and verification intersects sorted
    arrays map-side — the same intersect kernel as GR1. Stop-word-like hot
    tokens never enter a prefix, which is the skew story.
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    # distinct (doc_id, tok) pairs can only repeat WITHIN a document, so a
    # map-side array_distinct replaces the global .distinct() shuffle (the
    # shingle_table trick, operators/dedup.py:77).
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(text.tokens(F.col("text")))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    # r12 restructure (guide §2.4): the old plan re-derived the token table
    # per consumer — 8 parquet scans / 23 exchanges for one query (window
    # rank + sizes agg + docsets agg + prefix self-join, each replaying
    # scan→explode→distinct; plans/r12/prefix_filter_jaccard_before.txt).
    # Everything downstream needs only per-doc aggregates, so ONE groupBy
    # builds them all: sorted token set `ts` (verification), `sz` (= the
    # old sizes agg), and the frequency-ascending prefix slice `pref`
    # (sort_array over (tf, tok) structs ≡ the old row_number window —
    # tokens are distinct per doc, so (tf, tok) has no ties and the first
    # `sz - ceil(tau·sz) + 1` structs are exactly the rows the window
    # kept). localCheckpoint materializes the per-doc table once —
    # candidate generation and both verify sides replay from it (the
    # _copurchase_edges precedent) instead of re-running the scan.
    base = (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("tf", "tok"))).alias("by_freq"),
            F.sort_array(F.collect_list("tok")).alias("ts"),
        )
        .withColumn("sz", F.size("ts"))
        # tau = 9/10: prefix length = |d| - ceil(9|d|/10) + 1
        .withColumn(
            "pref",
            F.expr(
                "transform(slice(by_freq, 1, sz - (9 * sz + 9) div 10 + 1),"
                " x -> x.tok)"
            ),
        )
        .drop("by_freq")
        .localCheckpoint()
    )
    prefix = base.select("doc_id", F.explode("pref").alias("tok"))
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.tok") == F.col("pb.tok"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(F.col("pa.doc_id").alias("doc1"), F.col("pb.doc_id").alias("doc2"))
        .distinct()
    )
    verified = (
        cand.join(
            F.broadcast(
                base.select(F.col("doc_id").alias("doc1"), F.col("ts").alias("ts1"))
            ),
            "doc1",
        )
        .join(
            F.broadcast(
                base.select(F.col("doc_id").alias("doc2"), F.col("ts").alias("ts2"))
            ),
            "doc2",
        )
        .select(
            "doc1",
            "doc2",
            F.size(F.array_intersect("ts1", "ts2")).cast("long").alias("n_inter"),
            F.size("ts1").cast("long").alias("n1"),
            F.size("ts2").cast("long").alias("n2"),
        )
    )
    return verified.filter(
        10 * F.col("n_inter") >= 9 * (F.col("n1") + F.col("n2") - F.col("n_inter"))
    ).select(
        "doc1",
        "doc2",
        "n_inter",
        "n1",
        "n2",
        (
            F.col("n_inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_inter"))
        ).alias("jaccard"),
    )


_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "cohort_retention",
    "CO1,A1,A9,J2,W2,F12",
    f"""
    WITH firsts AS (
        SELECT user_id, MIN(epoch_us(ts)) // {_WEEK_US} AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week
        FROM events
    ),
    cohort_sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_n FROM firsts GROUP BY cohort_week
    ),
    ret AS (
        SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
               COUNT(*) AS n_active
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_offset, r.n_active, c.cohort_n,
           (10000 * r.n_active) // c.cohort_n AS retention_bp
    FROM ret r JOIN cohort_sizes c USING (cohort_week)
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (CO1): users cohorted by first-activity week;
    for each (cohort, week-offset) cell, how many cohort members were
    active — the standard product-analytics retention triangle, in integer
    basis points. Week bucketing is epoch-micros integer division (no
    calendar/timezone dependence — the catalog's time rule).

    Scale: firsts and activity are both per-user aggregates off one scan
    shape (shuffle on user_id, map-side combine); the retention join is
    user-keyed (same partitioning, AQE-reusable), and the final matrix is
    |cohorts| x |offsets| — tiny. The cohort-size join broadcasts.
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.expr(f"min(ts_us) div {_WEEK_US}").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.expr(f"ts_us div {_WEEK_US}").alias("week")
    ).distinct()
    cohort_sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_n"))
    ret = (
        activity.join(firsts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    return ret.join(F.broadcast(cohort_sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_n",
        F.expr("(10000 * n_active) div cohort_n").alias("retention_bp"),
    )


def _pq_oracle(k: int = 8, n_iter: int = 2, dims: int = 64, subs: int = 4) -> str:
    """CTE-chain twin of the product-quantization trainer+encoder below:
    the kmeans_lloyd lattice scheme with the subspace id as an extra key
    (datapipe._kmeans_oracle is the single-space special case)."""
    sub_w = dims // subs
    ctes = [
        f"""pts AS (
        SELECT vec_id, (i - 1) // {sub_w} AS sub, i - 1 AS d,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
        FROM embeddings, generate_series(1, {dims}) s(i)
    )""",
        f"c0 AS (SELECT sub, vec_id AS cid, d, q AS c FROM pts WHERE vec_id < {k})",
    ]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        ctes.append(
            f"""d{it} AS (
        SELECT p.vec_id, p.sub, c.cid, SUM((p.q - c.c) * (p.q - c.c)) AS d2
        FROM pts p JOIN {prev} c ON c.sub = p.sub AND c.d = p.d
        GROUP BY 1, 2, 3
    )"""
        )
        ctes.append(
            f"""a{it} AS (
        SELECT vec_id, sub, cid, d2 FROM (
            SELECT vec_id, sub, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
            FROM d{it})
        WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{it} AS (
        SELECT p.sub, a.cid, p.d,
               CAST(round(CAST(SUM(p.q) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS c
        FROM pts p JOIN a{it} a ON a.vec_id = p.vec_id AND a.sub = p.sub
        GROUP BY 1, 2, 3
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT vec_id,
           CAST(SUM(cid * power({k}, sub)) AS BIGINT) AS pq_code,
           CAST(SUM(d2) AS BIGINT) AS err_q
    FROM a{n_iter}
    GROUP BY vec_id
    """
    )


@register("pq_codes", "SIM4,SIM3,J12,A14,A26", _pq_oracle())
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (SIM4): split each 64-dim embedding into 4
    subvectors of 16 dims, train a k=8 codebook per subspace (2 Lloyd
    iterations in the catalog's quantized-integer lattice — the
    kmeans_lloyd/SIM3 determinism contract, with the subspace id as an
    extra grouping key), then encode every vector as the concatenation of
    its 4 nearest-centroid ids (a 12-bit code here; 8 subs x 256 centroids
    = 64-bit codes at production scale) plus its integer reconstruction
    error. PQ is the memory side of large-scale ANN: IVF (embed_ivf_knn)
    prunes the search space, PQ shrinks the residual vectors ~20x so the
    index fits in RAM.

    Determinism: everything runs on the integer lattice (round(x*1000)),
    distances and errors are integer sums, argmin ties break on centroid
    id, centroid updates round back to the lattice — bit-exact across
    engines and partitionings, like SIM3.

    Scale: pts is N x 64 rows but every iteration is one broadcast join
    (codebook = subs x k x dims/subs = 512 rows) + one combining groupBy;
    the per-vector encode is the same broadcast-argmin shape as IVF
    assignment. Codebook training on a corpus sample (TS1 split) and
    full-corpus encode is the production split of the same two stages.
    """
    from pyspark.sql import Window

    k, n_iter, dims, subs = 8, 2, 64, 4
    sub_w = dims // subs
    emb = t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select(
        "vec_id",
        F.expr(f"d div {sub_w}").alias("sub"),
        "d",
        F.round(F.col("x").cast("double") * 1000, 0).cast("long").alias("q"),
    )
    # r12: pts is re-read by every Lloyd stage (init + 2 joins per
    # iteration + the final encode — 5 scan→posexplode replays in the old
    # plan); checkpoint once, same as kmeans_quantized (similarity.py:416)
    pts = pts.localCheckpoint(eager=False)
    cents = pts.filter(F.col("vec_id") < k).select(
        "sub", F.col("vec_id").alias("cid"), "d", F.col("q").alias("c")
    )
    assign = None
    for _ in range(n_iter):
        d2 = (
            pts.join(F.broadcast(cents), ["sub", "d"])
            .groupBy("vec_id", "sub", "cid")
            .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("d2"))
        )
        w = Window.partitionBy("vec_id", "sub").orderBy("d2", "cid")
        assign = (
            d2.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", "cid", "d2")
        )
        cents = (
            pts.join(assign.select("vec_id", "sub", "cid"), ["vec_id", "sub"])
            .groupBy("sub", "cid", "d")
            .agg(
                F.round(F.sum("q").cast("double") / F.count("*"), 0)
                .cast("long")
                .alias("c")
            )
        )
    return assign.groupBy("vec_id").agg(
        F.sum(F.col("cid") * F.pow(F.lit(float(k)), F.col("sub")))
        .cast("long")
        .alias("pq_code"),
        F.sum("d2").cast("long").alias("err_q"),
    )


_QDOT = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]),"
    " (acc, x) -> acc + x)"
)
_SEM_K = 16  # stand-in centroids: vectors with vec_id < K (ivf_topk contract)


@register(
    "semantic_dedup",
    "DD12,SIM2,J12,A14,P10",
    f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000)) AS v
        FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_SEM_K}),
    dists AS (
        SELECT e.vec_id, c.cid,
               {_QDOT.format(a='e.v', b='e.v')} + {_QDOT.format(a='c.cv', b='c.cv')}
                 - 2 * {_QDOT.format(a='e.v', b='c.cv')} AS d2
        FROM e CROSS JOIN cents c
    ),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM dists)
        WHERE rn = 1
    ),
    av AS (
        SELECT a.vec_id, a.cid, e.v, {_QDOT.format(a='e.v', b='e.v')} AS n2
        FROM assign a JOIN e USING (vec_id)
    ),
    sim AS (
        SELECT b.vec_id AS vj
        FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE {_QDOT.format(a='a.v', b='b.v')} > 0
          AND CAST({_QDOT.format(a='a.v', b='b.v')} AS DECIMAL(38,0))
              * CAST({_QDOT.format(a='a.v', b='b.v')} AS DECIMAL(38,0)) * 10000
              >= 9216 * CAST(a.n2 AS DECIMAL(38,0)) * CAST(b.n2 AS DECIMAL(38,0))
        GROUP BY b.vec_id
    )
    SELECT av.vec_id, av.cid,
           CASE WHEN s.vj IS NULL THEN 0 ELSE 1 END AS dropped
    FROM av LEFT JOIN sim s ON s.vj = av.vec_id
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (DD12): semantic near-duplicate removal over embeddings —
    cluster with the coarse quantizer (centroid stand-ins = lowest vector
    ids, the ivf_topk contract), then inside each cluster drop any vector
    whose cosine to a LOWER-id cluster member exceeds tau=0.96. This is
    the embedding-space dedup modern corpus pipelines run after exact/
    fuzzy text dedup (Abbas et al., SemDeDup): paraphrases and
    re-renderings that share no n-grams still collapse.

    Determinism: components quantize to the integer lattice (x1000), all
    dots/norms are integer-valued doubles (exact below 2^53, sequential
    fold order both engines), and the cosine threshold is the
    cross-multiplied DECIMAL(38,0) comparison dot^2 * 10000 >= 9216 *
    |a|^2 |b|^2 (with dot > 0) — no sqrt, no float boundary anywhere. The
    drop rule (exists a similar lower-id member) is set-based, not
    greedy-chained, so it is order- and partitioning-independent.

    Scale: the all-pairs term is per-CLUSTER (sum of C(n_c, 2)), which is
    the whole point of clustering first — K scales with corpus size to
    bound n_c; centroids broadcast; the dedup join is an equi-join on cid.
    The production upgrade is trained centroids (kmeans_lloyd / pq_codes
    share the lattice, so the contract carries over).
    """
    from bigdatabowl_spark.operators import similarity

    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * 1000)).alias(
            "v"
        ),
    )
    cents = e.filter(F.col("vec_id") < _SEM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    d2 = (
        similarity.dot(F.col("v"), F.col("v"))
        + similarity.dot(F.col("cv"), F.col("cv"))
        - 2 * similarity.dot(F.col("v"), F.col("cv"))
    )
    from pyspark.sql import Window

    dists = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", "v", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    av = (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cid",
            "v",
            similarity.dot(F.col("v"), F.col("v")).alias("n2"),
        )
    )
    a, b = av.alias("a"), av.alias("b")
    dt = similarity.dot(F.col("a.v"), F.col("b.v"))
    dtd = dt.cast("decimal(38,0)")
    sim = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            (dt > 0)
            & (
                dtd * dtd * F.lit(10000).cast("decimal(38,0)")
                >= F.lit(9216).cast("decimal(38,0)")
                * F.col("a.n2").cast("decimal(38,0)")
                * F.col("b.n2").cast("decimal(38,0)")
            )
        )
        .select(F.col("b.vec_id").alias("vj"))
        .distinct()
    )
    return av.join(sim, av.vec_id == sim.vj, "left").select(
        "vec_id",
        "cid",
        F.when(F.col("vj").isNull(), 0).otherwise(1).alias("dropped"),
    )


@register(
    "table_diff",
    "CDC1,J16,P10,F9,U2",
    """
    WITH old_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0 THEN round(o_totalprice * 0.9, 2)
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 101 <> 0
    ),
    hashed AS (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               md5(CAST(CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS VARCHAR)
                   || '|' || o.o_orderstatus) AS h_old,
               md5(CAST(CAST(round(n.o_totalprice * 100.0) AS BIGINT) AS VARCHAR)
                   || '|' || n.o_orderstatus) AS h_new
        FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
    )
    SELECT o_orderkey,
           CASE WHEN h_old IS NULL THEN 'inserted'
                WHEN h_new IS NULL THEN 'deleted'
                ELSE 'updated' END AS change
    FROM hashed
    WHERE h_old IS NULL OR h_new IS NULL OR h_old <> h_new
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-feed derivation (CDC1): given two
    versions of a keyed table, emit (key, inserted|deleted|updated) —
    the table_changes operation a lakehouse exposes natively, derived
    relationally with a full outer join on the key and an md5 row-hash
    comparison over the non-key columns (value-compare via one hash, not
    N column comparisons). Both snapshots are simulated deterministically
    from the same base — old lacks keys %97 (-> inserts) and perturbs
    prices on keys %89 (-> updates); new lacks keys %101 (-> deletes) —
    so both engines derive identical snapshots, all three change kinds
    actually occur, and row hashes use the catalog's md5 rule.

    The row hash feeds md5 with INTEGER CENTS (round(x*100) as BIGINT),
    never the double's string form: Spark prints scientific notation for
    |x| >= 1e7 while DuckDB prints plain decimals, so a raw VARCHAR cast
    is only safe in narrow value ranges — integer cents make the hashed
    token identical across engines for any 2-dp monetary value.

    Scale: one full outer join on the table key (co-partitioned shuffle,
    AQE-mergeable) and a map-side hash per row; the changes output is
    bounded by churn, not table size. At lakehouse scale this reads two
    snapshot manifests and prunes unchanged files first (zone-map story,
    ZM1).
    """
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_snap = orders.filter(F.col("o_orderkey") % 101 != 0)
    old_snap = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.round(F.col("o_totalprice") * 0.9, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )

    def row_hash(side):
        cents = F.round(F.col(f"{side}.o_totalprice") * 100.0).cast("long")
        return F.md5(
            F.concat(cents.cast("string"), F.lit("|"), F.col(f"{side}.o_orderstatus"))
        )

    o, n = old_snap.alias("o"), new_snap.alias("n")
    hashed = o.join(
        n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        row_hash("o").alias("h_old"),
        row_hash("n").alias("h_new"),
    )
    return hashed.filter(
        F.col("h_old").isNull()
        | F.col("h_new").isNull()
        | (F.col("h_old") != F.col("h_new"))
    ).select(
        "o_orderkey",
        F.when(F.col("h_old").isNull(), "inserted")
        .when(F.col("h_new").isNull(), "deleted")
        .otherwise("updated")
        .alias("change"),
    )


@register(
    "dq_checks",
    "DQ1,A7,U4,P5,P15",
    """
    WITH orders_f AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 991 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 1009 = 0
    ),
    orders_ref AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 499 <> 0),
    li_f AS (
        SELECT l_orderkey,
               CASE WHEN l_orderkey % 997 = 0 THEN -l_quantity ELSE l_quantity END
                   AS l_quantity,
               CASE WHEN l_orderkey % 983 = 0 THEN NULL ELSE l_shipdate END
                   AS l_shipdate
        FROM lineitem
    )
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) FROM (
               SELECT o_orderkey FROM orders_f GROUP BY o_orderkey HAVING COUNT(*) > 1
           )) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM li_f l
                 WHERE NOT EXISTS (SELECT 1 FROM orders_ref o
                                   WHERE o.o_orderkey = l.l_orderkey))
               AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST((SELECT COUNT(*) FROM li_f WHERE l_quantity <= 0) AS BIGINT)
    UNION ALL
    SELECT 'orders_status_domain',
           CAST((SELECT COUNT(*) FROM orders_f
                 WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_shipdate_not_null',
           CAST((SELECT COUNT(*) FROM li_f WHERE l_shipdate IS NULL) AS BIGINT)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality check suite (DQ1): the dbt-style contract tests a
    pipeline runs before publishing a table — primary-key uniqueness,
    referential integrity (lineitem->orders, as a NOT-EXISTS anti count),
    value-domain membership, positivity, and not-null — emitted as one
    (check_name, n_violations) table so a scheduler can gate on
    max(n_violations) == 0.

    The checked relations carry DETERMINISTIC INJECTED FAULTS (duplicated
    %1009 keys, a reference set missing %499 keys, negated %997
    quantities, 'X' statuses on %991, nulled %983 ship dates): the clean
    base tables would make every count 0, and an all-zero result cannot
    distinguish working checks from broken ones — each rule must
    demonstrably COUNT what it claims to count for the oracle to mean
    anything.

    Scale: each check is a count aggregate; uniqueness is a combining
    groupBy on the key, the FK check is a left-anti join (broadcast or
    shuffled by size), and the scans share columns the reader prunes to.
    At 100 TB the checks run incrementally per partition-batch and only
    the violated keys are materialized.
    """
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    orders_f = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 991 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    ).unionAll(
        orders.filter(F.col("o_orderkey") % 1009 == 0).select(
            "o_orderkey", "o_orderstatus"
        )
    )
    orders_ref = orders.filter(F.col("o_orderkey") % 499 != 0).select("o_orderkey")
    li_f = li.select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 997 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.when(F.col("l_orderkey") % 983 == 0, F.lit(None))
        .otherwise(F.col("l_shipdate"))
        .alias("l_shipdate"),
    )

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    pk_dupes = (
        orders_f.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n"))
    )
    fk_orphans = (
        li_f.join(
            orders_ref.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
            "left_anti",
        ).agg(F.count("*").alias("n"))
    )
    qty = li_f.filter(F.col("l_quantity") <= 0).agg(F.count("*").alias("n"))
    dom = orders_f.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count("*").alias("n")
    )
    nulls = li_f.filter(F.col("l_shipdate").isNull()).agg(F.count("*").alias("n"))
    return (
        one("orders_pk_unique", pk_dupes)
        .unionAll(one("lineitem_orderkey_fk", fk_orphans))
        .unionAll(one("lineitem_qty_positive", qty))
        .unionAll(one("orders_status_domain", dom))
        .unionAll(one("lineitem_shipdate_not_null", nulls))
    )


_CMS_D, _CMS_W = 4, 256


def _cms_hash(d: int, x: str = "tok") -> str:
    return (
        f"CAST(('0x' || substr(md5({x} || ':cms{d}'), 1, 8)) AS BIGINT) % {_CMS_W}"
    )


@register(
    "cms_heavyhitters",
    "CMS1,SKX1,A7,O2,J1",
    f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT {d} AS d, {_cms_hash(d)} AS cell, COUNT(*) AS c "
            f"FROM toks GROUP BY 2" for d in range(_CMS_D)
        )}
    ),
    top AS (
        SELECT tok, COUNT(*) AS true_n FROM toks GROUP BY tok
        ORDER BY true_n DESC, tok LIMIT 20
    ),
    probes AS (
        {" UNION ALL ".join(
            f"SELECT tok, true_n, {d} AS d, {_cms_hash(d)} AS cell FROM top"
            for d in range(_CMS_D)
        )}
    )
    SELECT p.tok, MAX(p.true_n) AS true_n,
           MIN(c.c) AS cms_est,
           MIN(c.c) - MAX(p.true_n) AS overcount
    FROM probes p JOIN cells c ON c.d = p.d AND c.cell = p.cell
    GROUP BY p.tok
    """,
)
def cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch with an exact relational twin (CMS1): the sketch
    state is a d x w integer count matrix (d=4 md5 hash rows, w=256
    cells), built as d combining aggregations; a token's
    estimate is the MIN over its d cells, probed here for the true top-20
    tokens next to their exact counts — the emitted `overcount` column is
    the sketch's signature one-sided error (always >= 0), visible and
    oracle-checked rather than asserted.

    Like KMV (and unlike HLL's register internals), CMS state is plain
    integer arithmetic, so the whole sketch family pipeline — build,
    merge, probe — is hash-exact across engines.

    Scale: the sketch build is d map-side-combining aggregations whose
    SHUFFLED state is d*w cells regardless of corpus size — this is the
    mergeable-summary pattern streaming top-k uses (state bounded, merge =
    cell-wise add). The probe side broadcasts the 1024-cell table onto the
    top-k rows. At 100 TB, widen w to keep overcount ~ corpus/w small and
    feed the same cells into applyInPandasWithState for the streaming
    heavy-hitter twin.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))

    def cell(d):
        return (
            dedup.md5_long(F.concat(F.col("tok"), F.lit(f":cms{d}"))) % _CMS_W
        )

    # r12 (guide §2.4): ONE combining aggregation builds all d sketch rows
    # — each token explodes into its d (row, cell) coordinates map-side and
    # a single groupBy(d, cell) shuffles d·w = 1,024 partial cells. The old
    # shape ran d separate aggregations, each replaying scan→explode (and
    # the probe union replayed the top-20 subtree d times — now the 20-row
    # top table fans out its probe coordinates array-side). Counts per
    # (d, cell) and the top-20 set are unchanged.
    dcells = F.array(
        *[F.struct(F.lit(d).alias("d"), cell(d).alias("cell")) for d in range(_CMS_D)]
    )
    cells = (
        toks.select(F.explode(dcells).alias("dc"))
        .groupBy(F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
        .agg(F.count("*").alias("c"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("tok").asc())
        .limit(20)
    )
    probes = top.select(
        "tok", "true_n", F.explode(dcells).alias("dc")
    ).select("tok", "true_n", F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(cells), ["d", "cell"])
        .groupBy("tok")
        .agg(
            F.max("true_n").alias("true_n"),
            F.min("c").alias("cms_est"),
            (F.min("c") - F.max("true_n")).alias("overcount"),
        )
    )
