"""Corpus-analytics queries for the training-data pipeline.

Extends the datapipe family (dedup/similarity/text) with the remaining
operations a 100 TB pretraining-corpus build needs: intra-document
repetition scoring and a logistic quality scorer (filtering), deterministic
domain-mixture sampling (data mixing), vocabulary heavy-hitters and BPE
pair counts (tokenizer building), TF-IDF keywording, sliding-window
chunking, asymmetric containment dedup, salted skew-safe aggregation, and
structured metadata extraction from JSON side-channels.

Reference analogue: the reference's quality filters are play-level masks
(play_eppa_cpu.py:135-149 eligibility gating); these are the document-level
twins a text corpus needs. Every query here is oracle-checked (DuckDB twin
at sf0.001/0.01/0.1) and shuffles only on high-cardinality, skew-free keys
or broadcasts tiny derived tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.functions.scalar import sigmoid
from bigdatabowl_spark.operators import dedup, text
from bigdatabowl_spark.operators.text import tokens
from bigdatabowl_spark.plans.catalog import register, t


@register(
    "text_repetition",
    "TQ2,A7,A12,F6",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    per_tok AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct,
               MAX(c) AS top_count
        FROM per_tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(top_count AS DOUBLE) / n_tokens AS top_share,
           CAST((CAST(top_count AS DOUBLE) / n_tokens > 0.08
                 OR CAST(n_distinct AS DOUBLE) / n_tokens < 0.2) AS BIGINT)
               AS is_repetitive
    FROM per_doc
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition statistics — the standard boilerplate /
    degenerate-text quality signal (distinct-token ratio + most-frequent-token
    share, cf. Gopher/C4 repetition filters).

    Scale: explode fans tokens out ~150× but both groupBys key on
    high-cardinality skew-free keys ((doc_id, tok) then doc_id) with map-side
    partial aggregation, so shuffle volume is bounded by distinct pairs, not
    token instances. Ratios are IEEE double divisions of identical integers in
    both engines — bit-exact without rounding.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_share = F.col("top_count").cast("double") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        distinct_ratio.alias("distinct_ratio"),
        top_share.alias("top_share"),
        ((top_share > 0.08) | (distinct_ratio < 0.2)).cast("long").alias("is_repetitive"),
    )


@register(
    "mixture_sample",
    "TS2,A1,J4,P9",
    """
    WITH counts AS (
        SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
    ),
    m AS (SELECT MIN(cnt) AS m FROM counts),
    rates AS (
        SELECT source, CAST(floor((5000 * m) / cnt) AS BIGINT) AS rate_bp
        FROM counts, m
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8))
               AS BIGINT) % 10000 < r.rate_bp
    """,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture downsampling: every source (domain) is
    hash-sampled to ≈ half the smallest source's row count — the uniform-mixture
    primitive of a pretraining data-mixing pipeline, reproducible across
    engines and re-runs (same salted-md5 bucketing as ``split_assign``).

    Scale: per-source counts are a tiny aggregate; the 1-row min and the
    per-source rate table broadcast back onto the fact scan (J4 pattern), so
    the sampling filter itself is map-only — no shuffle of the corpus. Rate
    resolution is 1 basis point; exact-count stratified sampling would need a
    per-source rank window (sorts each domain) — at 100 TB the hash-threshold
    form is the right trade.
    """
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    m = counts.agg(F.min("cnt").alias("m"))
    rates = (
        counts.crossJoin(F.broadcast(m))
        .select(
            "source",
            F.floor((F.lit(5000) * F.col("m")) / F.col("cnt")).cast("long").alias("rate_bp"),
        )
    )
    bucket = dedup.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))) % 10000
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_bp"))
        .select("doc_id", "source")
    )


@register(
    "token_topk",
    "TT2,A7,O2,O3",
    """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok, COUNT(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy-hitters: global top-20 tokens by frequency
    with a deterministic tie-break (count desc, token asc — binary collation
    in both engines).

    Scale: groupBy(token) has map-side partial aggregation (shuffle bounded
    by vocabulary size, not token instances) and the global top-k is
    orderBy().limit() — Spark plans TakeOrderedAndProject, a per-partition
    top-20 + driver merge, never a global sort.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(20)


@register(
    "f_json_props",
    "MD1,A1,F6,P14",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
           MAX(CAST(props->>'k' AS BIGINT)) AS k_max,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS DOUBLE) / COUNT(*) AS k_avg
    FROM events
    GROUP BY event_type
    """,
)
def f_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured metadata extraction from a JSON side-channel column
    (``events.props``) — the schema-on-read pattern every log/metadata
    ingest needs. ``get_json_object`` is a JVM-side expression (no Python),
    and the extracted integer aggregates exactly.

    Scale: path extraction is per-row and codegen'd; the aggregate shuffles
    only (event_type, partials). For hot paths at 100 TB the move is
    ``from_json`` with an explicit schema once, then column pruning — noted
    here because repeated get_json_object calls re-parse the string per path.
    """
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        (F.sum(k).cast("double") / F.count("*")).alias("k_avg"),
    )


# Fixed public logistic-regression weights for the quality scorer — the
# operator contract (feature build → linear model → sigmoid → threshold) is
# what matters, not the toy coefficients.
_LOGIT_B = -2.0
_LOGIT_W = (0.01, 0.3, -4.0, 6.0)  # n_words, avg_word_len, punct_ratio, stopword_ratio

_EN_SET = "('the','a','of','and','to','is')"


_M10_ORACLE = f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
               round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS awl,
               CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                    AS DOUBLE) / length(text) AS punct,
               CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN {_EN_SET}))
                    AS DOUBLE) / len(string_split(text, ' ')) AS stop
        FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-({_LOGIT_B} + {_LOGIT_W[0]} * n_words
                                    + {_LOGIT_W[1]} * awl
                                    + ({_LOGIT_W[2]}) * punct
                                    + {_LOGIT_W[3]} * stop))), 6) AS quality_score,
           CAST(round(1.0 / (1.0 + exp(-({_LOGIT_B} + {_LOGIT_W[0]} * n_words
                                         + {_LOGIT_W[1]} * awl
                                         + ({_LOGIT_W[2]}) * punct
                                         + {_LOGIT_W[3]} * stop))), 6) > 0.5 AS BIGINT)
               AS keep_doc
    FROM feat
"""


@register("m10_quality_logit", "TQ3,M1,F4,F6", _M10_ORACLE)
def m10_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a fixed-weight logistic scorer over the
    ``text_quality`` features (the classifier-filter stage of a pretraining
    pipeline, run as pure SQL — no Python in the loop).

    The linear term accumulates left-to-right in both engines (identical IEEE
    op order), and only the final sigmoid is rounded (libm vs JVM exp may
    differ in the last ulp — same rule as the catalog's trig queries).

    Scale: per-row projection, zero shuffle; the model broadcast is a closure
    of four literals (the S4 ndarray-artifact pattern at its smallest).
    """
    # Features come from the single quality_select definition (the same
    # columns text_quality emits); the linear term reads the aliased
    # columns, so the arithmetic — including the NULL punct_ratio of an
    # empty document (try_divide ≡ DuckDB x/0), which NULLs z, the score,
    # and keep_doc so empty docs never pass the filter in either engine —
    # can only be changed in one place.
    docs = t(spark, sf_dir, "documents")
    feats = docs.select("doc_id", *text.quality_select())
    z = (
        F.lit(_LOGIT_B)
        + F.lit(_LOGIT_W[0]) * F.col("n_words").cast("double")
        + F.lit(_LOGIT_W[1]) * F.col("avg_word_len")
        + F.lit(_LOGIT_W[2]) * F.col("punct_ratio")
        + F.lit(_LOGIT_W[3]) * F.col("stopword_ratio")
    )
    score = F.round(sigmoid(z), 6)
    return feats.select(
        "doc_id",
        score.alias("quality_score"),
        (score > 0.5).cast("long").alias("keep_doc"),
    )


@register(
    "bpe_pair_counts",
    "TT3,A7,O2,F10",
    """
    WITH toks AS (
        SELECT string_split(text, ' ') AS ts FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(ts)),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS pair
        FROM toks WHERE len(ts) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 30
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token pair frequencies — the inner step of BPE/WordPiece
    tokenizer training (count all adjacent pairs, merge the most frequent,
    repeat). One distributed pass produces the global pair table; the merge
    choice is the top row under a deterministic tie-break.

    Scale: pairs are built array-side per document (``transform`` over the
    token array — no self-join, no posexplode matching), then one partial-
    aggregated groupBy on the pair string and a TakeOrderedAndProject top-k.
    The full BPE loop re-runs this query on re-segmented text; each round is
    one scan + one bounded shuffle.
    """
    docs = t(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    # Pairs stay a (t1, t2) struct through the aggregate; the display string
    # is built only for the ~|vocab|² surviving groups, not per instance.
    # (At sf0.1 the explode+agg dominates either way; struct keys avoid the
    # per-instance concat allocation, which matters as token width grows.)
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(ts) - 2),
        lambda i: F.struct(
            F.element_at(ts, i + 1).alias("t1"), F.element_at(ts, i + 2).alias("t2")
        ),
    )
    exploded = docs.filter(F.size(ts) >= 2).select(F.explode(pairs).alias("p"))
    counts = exploded.groupBy("p.t1", "p.t2").agg(F.count("*").alias("n"))
    withpair = counts.select(F.concat_ws(" ", "t1", "t2").alias("pair"), "n")
    return withpair.orderBy(F.desc("n"), F.asc("pair")).limit(30)


@register(
    "tfidf_topterms",
    "TT4,A7,A9,W4,J1",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    doclen AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok FROM tf GROUP BY doc_id
    ),
    df AS (
        SELECT tok, COUNT(*) AS n_docs FROM tf GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_total FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               CAST(tf.c * CAST(round(ln((CAST(n_total AS DOUBLE) + 1.0)
                                         / (CAST(df.n_docs AS DOUBLE) + 1.0))
                                      * 1000000) AS BIGINT)
                    AS DOUBLE) / doclen.n_tok AS tfidf
        FROM tf
        JOIN doclen USING (doc_id)
        JOIN df USING (tok)
        CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf
    FROM (
        SELECT doc_id, tok, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, tok) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf · ln((N+1)/(df+1)) with a deterministic tie-break — the classic
    corpus-salience operator (topic tagging, keyword search indexing).

    Determinism: idf is quantized to integer micro-units (round(ln·1e6) —
    the one engine-sensitive op, catalog.py last-ulp rule), after which the
    score is integer·integer / integer in IEEE doubles — bit-identical in
    both engines with no final rounding, so the rank key cannot straddle a
    rounding boundary. Ties break on the token.

    Scale: document length is a window over the tf table, so it shares the
    doc_id hash partitioning with the per-document top-k window — one
    exchange serves both (pinned in test_plan_quality). The document-
    frequency table is vocabulary-sized and broadcasts onto tf; the global
    doc count is a 1-row broadcast (J4).

    Single-execution of the tf lineage: the (doc_id, tok, c) table feeds
    BOTH the document-frequency branch and the scored branch, so without a
    materialization boundary the tokenize→explode→shuffle-agg pass — the
    most expensive scan in the query — runs twice per job. tf is
    localCheckpoint'ed lazily (MEMORY_AND_DISK under the hood, so
    partitions that don't fit in executor memory spill to local disk
    rather than OOMing): the first consumer computes each partition once,
    the second reads the materialized blocks, and — unlike .persist(),
    whose CacheManager entry outlives the query for the whole session —
    the blocks are released by the ContextCleaner as soon as the plan is
    garbage-collected (same lifecycle as o7_global_rank's dual-consumer
    checkpoint, relational.py).
    """
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    # doc length as a window over tf, not a separate agg+join: reuses tf's
    # hash partitioning once repartitioned on doc_id, and the top-k window
    # below shares that same partitioning — one exchange serves both.
    tf = tf.withColumn(
        "n_tok", F.sum("c").over(Window.partitionBy("doc_id"))
    ).localCheckpoint(eager=False)
    df = tf.groupBy("tok").agg(F.count("*").alias("n_docs"))
    n = docs.agg(F.count("*").alias("n_total"))
    idf_micro = F.round(
        F.log(
            (F.col("n_total").cast("double") + 1.0) / (F.col("n_docs").cast("double") + 1.0)
        )
        * 1_000_000,
        0,
    ).cast("long")
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            ((F.col("c") * idf_micro).cast("double") / F.col("n_tok")).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tfidf")
    )


CHUNK_LEN = 64  # tokens per chunk
CHUNK_STRIDE = 48  # overlap = CHUNK_LEN - CHUNK_STRIDE


@register(
    "chunk_documents",
    "TP2,F13,F10,P6",
    f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    starts AS (
        SELECT doc_id, ts, unnest(range(0, len(ts), {CHUNK_STRIDE})) AS s FROM base
    )
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_no,
           CAST(least({CHUNK_LEN}, len(ts) - s) AS BIGINT) AS n_tok,
           substr(md5(array_to_string(ts[s + 1 : s + {CHUNK_LEN}], ' ')), 1, 8)
               AS chunk_key
    FROM starts
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split every document into
    {CHUNK_LEN}-token chunks at a {CHUNK_STRIDE}-token stride (16-token
    overlap) — the segmentation primitive for RAG indexing and
    fixed-context pretraining, inverse of ``pack_sequences``. Each chunk
    carries a content key (md5 prefix of its text) so downstream chunk-level
    dedup joins on it.

    Scale: chunk starts are generated array-side (`sequence` over the token
    array — no self-join against a positions table) and the whole operator
    is one projection + explode, zero shuffles; output partitioning follows
    the input scan.
    """
    docs = t(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    starts = F.sequence(F.lit(0), F.size(ts) - 1, F.lit(CHUNK_STRIDE))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / CHUNK_STRIDE).cast("long").alias("chunk_no"),
            F.least(F.lit(CHUNK_LEN), F.size(ts) - s).cast("long").alias("n_tok"),
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(ts, s + 1, CHUNK_LEN))), 1, 8
            ).alias("chunk_key"),
        ),
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_no", "c.n_tok", "c.chunk_key"
    )


@register(
    "containment_pairs",
    "DD8,DD2,J12,A1",
    """
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(string_split(text, ' ')) >= 3
                 THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                      i -> string_split(text, ' ')[i] || ' ' ||
                           string_split(text, ' ')[i+1] || ' ' ||
                           string_split(text, ' ')[i+2])
                 ELSE [] END) AS shingle
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc1, doc2, n_inter,
           CAST(n_inter AS DOUBLE) / s1.n_sh AS cont_1in2,
           CAST(n_inter AS DOUBLE) / s2.n_sh AS cont_2in1
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE greatest(CAST(n_inter AS DOUBLE) / s1.n_sh,
                   CAST(n_inter AS DOUBLE) / s2.n_sh) >= 0.5
    """,
)
def containment_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment near-dup pairs (doc-inside-doc
    detection) — see operators/dedup.containment_pairs for semantics and
    the exact-baseline/LSH-candidates scale posture."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.containment_pairs(docs, threshold=0.5)


@register(
    "skew_salted_agg",
    "SK1,A1,A9",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (hot-key) group
    key: phase 1 groups on (event_type, salt16) so each hot key spreads over
    16 reducers, phase 2 merges the 16 partials per key. Results are exact
    because the summed value goes through DECIMAL (associative — partials
    commute), which is precisely why salting is safe for algebraic
    aggregates. The oracle is the plain one-phase GROUP BY.

    Scale: this is the explicit form of AQE's skew handling for contexts
    AQE can't reach (streaming aggregations, deterministic tests) —
    operators/skew.py; salt is a stable hash of event_id, not rand(), so
    the plan is reproducible run-to-run.
    """
    from bigdatabowl_spark.functions.scalar import dec
    from bigdatabowl_spark.operators.skew import salted_count_sum

    ev = t(spark, sf_dir, "events").withColumn("value_dec", dec("value"))
    out = salted_count_sum(ev, key="event_type", value="value_dec", id_col="event_id")
    return out.select(
        "event_type", "n", F.col("total").cast("double").alias("total")
    )


@register(
    "quality_percentile_filter",
    "TQ4,A10,J4,P4",
    f"""
    WITH scores AS ({_M10_ORACLE}),
    thr AS (
        SELECT round(quantile_cont(quality_score, 0.25), 6) AS q25 FROM scores
    )
    SELECT s.doc_id, s.quality_score
    FROM scores s, thr
    WHERE s.quality_score > thr.q25
    """,
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-threshold quality filtering: drop the bottom quartile of
    the corpus by model score — the relative (distribution-anchored) filter
    used when an absolute threshold would over- or under-prune a shifted
    domain. Composes the logistic scorer (TQ3) with an exact interpolated
    quantile (A10) and a 1-row threshold broadcast (J4).

    Determinism: both engines compute the same linear-interpolated quantile
    over identical rounded-6 scores, and the threshold is rounded-6 before
    the strict comparison. This is the catalog's documented last-ulp risk
    class (catalog.py header): if the unrounded quantile ever lands within
    one ulp of a 1e-6 rounding boundary, the rounded thresholds could
    differ between engines and flip the boundary documents under the strict
    `>`. Not observed at any tested SF; the residual risk is accepted like
    every other rounded-float comparison in the catalog.

    Scale: one corpus scan to score, a percentile aggregate (partial
    per-partition state), and a map-only broadcast-threshold filter — at
    100 TB swap the exact percentile for percentile_approx and keep the
    same shape.
    """
    scores = m10_quality_logit(spark, sf_dir).select("doc_id", "quality_score")
    thr = scores.agg(
        F.round(F.expr("percentile(quality_score, 0.25)"), 6).alias("q25")
    )
    return (
        scores.crossJoin(F.broadcast(thr))
        .filter(F.col("quality_score") > F.col("q25"))
        .select("doc_id", "quality_score")
    )


@register(
    "w8_zscore_anomaly",
    "W8,W3,A16,F4,F6",
    """
    WITH stats AS (
        SELECT event_id, user_id, CAST(value AS DOUBLE) AS value,
               COUNT(value) OVER w AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS ss
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CASE WHEN n >= 5 AND (ss * n - s * s) > 0
                THEN round((value * n - s) / sqrt((ss * n - s * s) * n / (n - 1)), 6)
                END AS zscore,
           CAST(n >= 5 AND (ss * n - s * s) > 0
                AND abs(round((value * n - s) / sqrt((ss * n - s * s) * n / (n - 1)), 6)) > 3.0
                AS BIGINT) AS is_anomaly
    FROM stats
    """,
)
def w8_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value against the
    mean/stddev of its user's previous 20 events (trailing frame EXCLUDES
    the current row — the self-exclusion that makes it a proper outlier
    test). The data-quality primitive for metric streams and for flagging
    corrupt numeric fields at ingest.

    Determinism: rolling Σv and Σv² go through DECIMAL (2- and 4-decimal —
    exact, order-free), so mean/variance are ratios of identical doubles in
    both engines; only the final z (one sqrt + division) is rounded. The
    z-numerator is scaled by n ((v·n − Σv) / sqrt(...·n/(n−1))) to keep every
    intermediate a product of exact values. Windows shorter than 5 events or
    with zero variance yield NULL (no anomaly verdict).

    Scale: one exchange on user_id, O(frame) window state — the same
    posture as the rolling-kinematics family (W3/SCALE.md §2).
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-20, -1)
    vdec = F.col("value").cast("decimal(18,2)")
    stats = ev.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.count("value").over(w).alias("n"),
        F.sum(vdec).over(w).cast("double").alias("s"),
        F.sum(vdec * vdec).over(w).cast("double").alias("ss"),
    )
    var_num = F.col("ss") * F.col("n") - F.col("s") * F.col("s")
    ok = (F.col("n") >= 5) & (var_num > 0)
    z = F.round(
        (F.col("value") * F.col("n") - F.col("s"))
        / F.sqrt(var_num * F.col("n") / (F.col("n") - 1)),
        6,
    )
    return stats.select(
        "event_id",
        "user_id",
        F.when(ok, z).alias("zscore"),
        (ok & (F.abs(z) > 3.0)).cast("long").alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# PII redaction / URL structure (TX1, TX2)
# --------------------------------------------------------------------------

# Synthetic-PII construction shared by the Spark plan and the oracle: the
# testdata corpus is PII-free word soup, so the redaction query injects a
# deterministic email + digit run per document and then proves removal.
# Both engines build the SAME string (integer→decimal-string concat), so
# the redacted-output checksum is cross-engine exact.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_DIGITS_RE = "[0-9]{6,}"


@register(
    "pii_redact",
    "TX1,F9,F10,A1",
    f"""
    WITH pii AS (
        SELECT doc_id, source,
               text || ' reach user' || doc_id || '@ex' || (doc_id % 7)
                    || '.net call ' || (1000000000 + doc_id) AS pii_text
        FROM documents
    ),
    red AS (
        SELECT source, pii_text,
               regexp_replace(regexp_replace(pii_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_DIGITS_RE}', '<NUM>', 'g') AS redacted,
               len(regexp_extract_all(pii_text, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(pii_text, '{_DIGITS_RE}')) AS n_digit_runs
        FROM pii
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
           CAST(SUM(n_digit_runs) AS BIGINT) AS digit_runs_redacted,
           CAST(SUM(length(pii_text) - length(redacted)) AS BIGINT) AS chars_removed,
           CAST(SUM(CAST(('0x' || substr(md5(redacted), 1, 8)) AS BIGINT) % 1000003)
                AS BIGINT) AS redacted_checksum
    FROM red
    GROUP BY source
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (TX1): scrub emails and long digit runs from document
    text with JVM `regexp_replace`, counting what was removed per source —
    the compliance pass every web-scraped pretraining corpus runs before
    training. The per-source checksum of the redacted text proves the
    replacement output (not just the counts) matches the oracle exactly.

    Email matches are replaced before digit runs so digits inside an
    address are consumed by the email rule, the same precedence a real
    scrubber uses.

    Scale: map-only regex work inside WholeStageCodegen (no Python, no
    shuffle until the tiny per-source rollup) — the regex cost is linear in
    corpus bytes and embarrassingly parallel, exactly what 100 TB needs.
    """
    from bigdatabowl_spark.functions.scalar import md5_bucket

    docs = t(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@ex"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".net call "),
        (F.col("doc_id") + 1000000000).cast("string"),
    )
    red = docs.select(
        "source",
        pii_text.alias("pii_text"),
        F.regexp_replace(
            F.regexp_replace(pii_text, _EMAIL_RE, "<EMAIL>"), _DIGITS_RE, "<NUM>"
        ).alias("redacted"),
        F.regexp_count(pii_text, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(pii_text, F.lit(_DIGITS_RE)).alias("n_digit_runs"),
    )
    return red.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").cast("long").alias("emails_redacted"),
        F.sum("n_digit_runs").cast("long").alias("digit_runs_redacted"),
        F.sum(F.length("pii_text") - F.length("redacted"))
        .cast("long")
        .alias("chars_removed"),
        F.sum(md5_bucket(F.col("redacted")) % 1000003)
        .cast("long")
        .alias("redacted_checksum"),
    )


_URL_PREFIX_RE = "https://[a-z0-9.-]+/"


@register(
    "url_host_agg",
    "TX2,F9,A1,A12",
    f"""
    WITH urls AS (
        SELECT doc_id, n_chars,
               'https://w' || (doc_id % 37) || '.ex' || (doc_id % 5)
                    || '.org/p/' || doc_id || '/s/' || (doc_id % 11) AS url
        FROM documents
    ),
    hosts AS (
        SELECT doc_id, n_chars,
               regexp_extract(url, 'https://([a-z0-9.-]+)/', 1) AS host,
               len(string_split(regexp_replace(url, '{_URL_PREFIX_RE}', '', 'g'), '/'))
                   AS path_depth
        FROM urls
    )
    SELECT host,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(path_depth) AS BIGINT) AS max_depth,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM hosts GROUP BY host
    """,
)
def url_host_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus composition (TX2): derive each document's source
    URL, parse out the host with one regex, and aggregate volume per host —
    the operator behind domain-mixture decisions (how much of the corpus is
    each site) and per-domain quality policies.

    The URL is synthesized deterministically from doc_id (the testdata has
    no URL column); the parse→group→aggregate pipeline is the real operator
    and is exercised across 185 distinct hosts.

    Scale: map-only parse, then a groupBy on host — web-corpus hosts are
    Zipf-skewed, so at 100 TB this aggregation composes with the SK1 salted
    two-phase pattern (`skew_salted_agg`); counts/sums here are already
    algebraic partials so the map-side combine absorbs the head.
    """
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://w"),
        (F.col("doc_id") % 37).cast("string"),
        F.lit(".ex"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".org/p/"),
        F.col("doc_id").cast("string"),
        F.lit("/s/"),
        (F.col("doc_id") % 11).cast("string"),
    )
    hosts = docs.select(
        "doc_id",
        "n_chars",
        F.regexp_extract(url, "https://([a-z0-9.-]+)/", 1).alias("host"),
        F.size(F.split(F.regexp_replace(url, _URL_PREFIX_RE, ""), "/")).alias(
            "path_depth"
        ),
    )
    return hosts.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.max("path_depth").cast("long").alias("max_depth"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# Multi-granularity rollups / reshaping / stratification (GS1, UV1, NT1)
# --------------------------------------------------------------------------


@register(
    "rollup_hierarchy",
    "GS1,A1,A12,P13",
    """
    SELECT source, lang,
           CAST(GROUPING(source) AS BIGINT) AS g_source,
           CAST(GROUPING(lang) AS BIGINT) AS g_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY ROLLUP(source, lang)
    """,
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity corpus composition in ONE pass (GS1): per
    (source, lang), per source, and grand total via ROLLUP — the mixture
    dashboard every corpus build watches needs all three levels, and
    grouping-sets computes them in a single shuffle instead of three jobs.

    GROUPING() flags disambiguate a rolled-up level from a genuine NULL
    key, identically in both engines.

    Scale: Catalyst expands rollup into grouping-set partial aggregates —
    still one exchange keyed on (source, lang, grouping_id); the rollup
    rows add |sources|+1 groups, noise next to the leaf level.
    """
    docs = t(spark, sf_dir, "documents")
    return docs.rollup("source", "lang").agg(
        F.grouping("source").cast("long").alias("g_source"),
        F.grouping("lang").cast("long").alias("g_lang"),
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    ).select("source", "lang", "g_source", "g_lang", "n_docs", "total_chars")


@register(
    "unpivot_features",
    "UV1,P6,A10,F6",
    """
    WITH feats AS (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS len_chars,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
               CAST(len(string_split(text, ' ')) AS DOUBLE)
                   / CAST(n_chars AS DOUBLE) AS tok_density
        FROM documents
    ),
    long AS (
        SELECT doc_id, 'len_chars' AS feature, len_chars AS value FROM feats
        UNION ALL
        SELECT doc_id, 'n_tokens', n_tokens FROM feats
        UNION ALL
        SELECT doc_id, 'tok_density', tok_density FROM feats
    )
    SELECT feature,
           COUNT(*) AS n,
           round(MIN(value), 6) AS min_v,
           round(MAX(value), 6) AS max_v,
           round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) AS sum_v
    FROM long GROUP BY feature
    """,
)
def unpivot_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long feature melt (UV1): per-document quality features unpivot
    into (doc_id, feature, value) rows, then per-feature distribution
    stats — the reshaping step behind feature-drift monitoring, where each
    feature's distribution is tracked as its own series.

    Spark's native `unpivot` (stack) is a zero-shuffle narrow transform;
    the oracle spells it as the equivalent UNION ALL. Sums go through
    DECIMAL(28,10) so the fold order cannot change the double.

    Scale: melt multiplies rows ×|features| but stays map-only; the
    per-feature rollup keys on |features| groups with algebraic
    aggregates — map-side combine reduces each partition to |features|
    rows before the exchange.
    """
    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("double")
    feats = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("len_chars"),
        n_tokens.alias("n_tokens"),
        # try_divide: empty doc → NULL density (DuckDB x/0), skipped by the
        # min/max/sum aggregates identically in both engines
        F.try_divide(n_tokens, F.col("n_chars").cast("double")).alias("tok_density"),
    )
    long = feats.unpivot(
        ids=["doc_id"],
        values=["len_chars", "n_tokens", "tok_density"],
        variableColumnName="feature",
        valueColumnName="value",
    )
    vdec = F.col("value").cast("decimal(28,10)")
    return long.groupBy("feature").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.sum(vdec).cast("double"), 6).alias("sum_v"),
    )


@register(
    "ntile_stratify",
    "NT1,W4,A9,O4",
    """
    WITH tiled AS (
        SELECT doc_id, source, n_chars,
               ntile(10) OVER (PARTITION BY source
                               ORDER BY n_chars, doc_id) AS decile
        FROM documents
    )
    SELECT source, decile,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS decile_floor,
           CAST(MAX(n_chars) AS BIGINT) AS decile_ceil
    FROM tiled GROUP BY source, decile
    """,
)
def ntile_stratify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-decile stratification (NT1): ntile(10) buckets
    every document inside its source — the stratification step behind
    curriculum ordering and stratified eval sampling. The ordering carries
    doc_id as tiebreak so bucket assignment is deterministic (O4) in both
    engines (standard SQL ntile: the first rows%n buckets take the extra
    row).

    Scale: the window partitions by source, so this is one exchange on a
    corpus-mixture key — the same skew posture as url_host_agg; a global
    (un-partitioned) ntile would serialize on one reducer and is the
    anti-pattern this query deliberately avoids (use range-partitioned
    percent_rank for global stratification).
    """
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    tiled = docs.select("doc_id", "source", "n_chars", F.ntile(10).over(w).alias("decile"))
    return tiled.groupBy("source", "decile").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("long").alias("decile_floor"),
        F.max("n_chars").cast("long").alias("decile_ceil"),
    )


# --------------------------------------------------------------------------
# Incremental dedup against the historical corpus (DD9)
# --------------------------------------------------------------------------


@register(
    "dedup_incremental",
    "DD9,DD1,DD8,U4,P12",
    """
    WITH batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    existing AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
    ),
    bh AS (
        SELECT doc_id, md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                   ' +', ' ', 'g'))) AS h
        FROM batch
    ),
    eh AS (
        SELECT DISTINCT md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                   ' +', ' ', 'g'))) AS h
        FROM existing
    ),
    bs AS (
        SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(string_split(text, ' ')) >= 3
                 THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                      i -> string_split(text, ' ')[i] || ' ' ||
                           string_split(text, ' ')[i+1] || ' ' ||
                           string_split(text, ' ')[i+2])
                 ELSE [] END) AS shingle
        FROM batch
    ),
    es AS (
        SELECT DISTINCT unnest(
            CASE WHEN len(string_split(text, ' ')) >= 3
                 THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                      i -> string_split(text, ' ')[i] || ' ' ||
                           string_split(text, ' ')[i+1] || ' ' ||
                           string_split(text, ' ')[i+2])
                 ELSE [] END) AS shingle
        FROM existing
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM bs GROUP BY doc_id),
    hits AS (
        SELECT bs.doc_id, COUNT(*) AS n_hit
        FROM bs JOIN es ON bs.shingle = es.shingle
        GROUP BY bs.doc_id
    ),
    cont AS (
        SELECT sizes.doc_id,
               CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_sh AS containment
        FROM sizes LEFT JOIN hits ON hits.doc_id = sizes.doc_id
    )
    SELECT b.doc_id,
           CASE WHEN eh.h IS NOT NULL THEN 'exact'
                WHEN cont.containment >= 0.8 THEN 'near_dup'
                ELSE 'keep' END AS decision,
           round(COALESCE(cont.containment, 0.0), 6) AS containment
    FROM batch b
    JOIN bh ON bh.doc_id = b.doc_id
    LEFT JOIN eh ON eh.h = bh.h
    LEFT JOIN cont ON cont.doc_id = b.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (DD9): a NEW ingest batch (doc_id % 5 = 0 stands
    in for today's crawl) deduplicated against the EXISTING corpus — the
    production mode at 100 TB/day, where all-pairs over the full corpus is
    never re-run; only batch×history is checked. A batch doc is dropped as
    'exact' when its normalized-text hash already exists, or as 'near_dup'
    when ≥80% of its shingles appear in the historical shingle set.

    Scale: the exact stage is a semi-join of batch hashes against the
    (pre-computed, incrementally-maintained) history hash index. The
    containment stage here is the exact shingle equi-join — the oracle
    twin; the production path band-joins the batch's MinHash signatures
    against the persisted LSH index (same staging as DD3), so batch cost
    is O(batch × collisions), independent of corpus size. History shingles
    are DISTINCT-deduped before the join, bounding the fan-out by
    vocabulary, not corpus.
    """
    from bigdatabowl_spark.operators.dedup import normalize_text, shingles

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    existing = docs.filter(F.col("doc_id") % 5 != 0)

    bh = batch.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("h"))
    eh = existing.select(F.md5(normalize_text(F.col("text"))).alias("h")).distinct()
    exact = bh.join(eh.withColumn("_hit", F.lit(1)), "h", "left").select(
        "doc_id", F.col("_hit").isNotNull().alias("is_exact")
    )

    bs = batch.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("shingle")
    ).distinct()
    es = existing.select(
        F.explode(shingles(F.col("text"))).alias("shingle")
    ).distinct()
    sizes = bs.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hits = bs.join(es, "shingle").groupBy("doc_id").agg(F.count("*").alias("n_hit"))
    cont = sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        (F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_sh")).alias(
            "containment"
        ),
    )

    decision = (
        F.when(F.col("is_exact"), F.lit("exact"))
        .when(F.col("containment") >= 0.8, F.lit("near_dup"))
        .otherwise(F.lit("keep"))
    )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            decision.alias("decision"),
            F.round(F.coalesce("containment", F.lit(0.0)), 6).alias("containment"),
        )
    )


@register(
    "skew_salted_join",
    "SK2,J1,A1,SK1",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join (SK2): the big side carries a deterministic salt
    and the small side is replicated n_salts×, so a hot join key's rows
    spread over n_salts reducers instead of one — the explicit form of
    AQE's skew-join split for contexts AQE can't reach (streaming joins,
    deterministic tests). Output equals the plain join row-for-row (the
    oracle), because salting only re-routes rows; the follow-on aggregate
    is decimal-exact so partials commute across the extra reducers.

    Scale: replication multiplies the SMALL side by n_salts (bounded —
    small × 8 is still small); the big side's shuffle volume is unchanged.
    The salt is a stable hash of the row id, not rand(), so plans are
    reproducible run-to-run (operators/skew.py).
    """
    from bigdatabowl_spark.functions.scalar import dec
    from bigdatabowl_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, key="l_orderkey", big_id_col="l_linenumber", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
    )


@register(
    "mixture_temperature",
    "TS3,TS2,A1,J4,F4",
    """
    WITH counts AS (
        SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
    ),
    m AS (SELECT MIN(cnt) AS m FROM counts),
    rates AS (
        SELECT source,
               CAST(floor(10000 * sqrt(CAST(m AS DOUBLE) / cnt)) AS BIGINT)
                   AS rate_bp
        FROM counts, m
    )
    SELECT d.doc_id, d.source, r.rate_bp
    FROM documents d JOIN rates r USING (source)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8))
               AS BIGINT) % 10000 < r.rate_bp
    """,
)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture reweighting (TS3, α = 0.5): each domain's
    keep-rate is sqrt(min_count / count), flattening the domain
    distribution toward — but not all the way to — uniform, the standard
    multilingual/multi-domain pretraining temperature trade (keep more of
    big domains than uniform TS2 would, less than proportional).

    α = 0.5 is computed as sqrt deliberately: IEEE sqrt is
    correctly-rounded in both engines (bit-identical), whereas pow(x, 0.5)
    carries libm variance — the catalog's last-ulp rule decided the
    exponent. The rate quantizes to basis points before the hash-threshold
    comparison, so the kept set is engine-exact.

    Scale: identical posture to TS2 — tiny per-source aggregate, 1-row min,
    broadcast rate table, map-only hash filter over the corpus.
    """
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    m = counts.agg(F.min("cnt").alias("m"))
    rates = counts.crossJoin(F.broadcast(m)).select(
        "source",
        F.floor(
            F.lit(10000) * F.sqrt(F.col("m").cast("double") / F.col("cnt"))
        )
        .cast("long")
        .alias("rate_bp"),
    )
    bucket = (
        dedup.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":temp")))
        % 10000
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_bp"))
        .select("doc_id", "source", "rate_bp")
    )
