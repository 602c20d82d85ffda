"""Training-data pipeline queries: dedup, text analysis, similarity search,
multimodal plumbing — over the `documents` and `embeddings` tables.

These are the beyond-the-reference operators (BASELINE.json north star): each
is registered with a bit-exact DuckDB oracle built on the same md5/integer
arithmetic as the Spark implementation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from bigdatabowl_spark.operators import dedup, similarity, text, multimodal
from bigdatabowl_spark.plans.catalog import register, t

# Shared oracle SQL fragments -----------------------------------------------

_SHINGLES = """
    SELECT DISTINCT doc_id, unnest(
        CASE WHEN len(string_split(text, ' ')) >= 3
             THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2])
             ELSE [] END) AS shingle
    FROM documents
"""

_EN = "('the','a','of','and','to','is')"
_DE = "('der','die','das','und','ist','ein')"
_ES = "('el','la','de','y','es','un')"
_FR = "('le','la','de','et','est','un')"


def _hits(kw: str) -> str:
    return f"len(list_filter(string_split(lower(text), ' '), x -> x IN {kw}))"


# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    "DD1,P12,U2",
    """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS text_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str):
    """Exact deduplication: hash-groupBy on normalized text.

    The canonical keep-lowest-id policy; at scale this is one shuffle on the
    md5 key (uniformly distributed by construction — no skew).
    """
    docs = t(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs)


@register(
    "text_quality",
    "TQ1,F6",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_word_len,
           CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text) AS punct_ratio,
           CAST({_hits(_EN)} AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str):
    """Quality scoring: length / punctuation / stopword ratios per document.

    Feature arithmetic lives in operators/text.quality_select — the one
    definition m10_quality_logit also builds on. Empty documents
    (n_chars = 0) get a NULL punct_ratio via try_divide — the same NULL
    DuckDB's double x/0 produces — instead of an ANSI divide-by-zero
    error (caught by tests/test_dedup_fuzz.py's empty-doc corpora).
    """
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", *text.quality_select())


@register(
    "text_langid",
    "TL1,P9",
    f"""
    WITH s AS (
        SELECT doc_id, lang,
               CAST({_hits(_EN)} AS BIGINT) AS s_en,
               CAST({_hits(_DE)} AS BIGINT) AS s_de,
               CAST({_hits(_ES)} AS BIGINT) AS s_es,
               CAST({_hits(_FR)} AS BIGINT) AS s_fr
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           s_en, s_de, s_es, s_fr
    FROM s
    """,
)
def text_langid(spark: SparkSession, sf_dir: str):
    """Language-ID via stopword-hit scoring with fixed argmax tiebreak."""
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    cols = [text.lang_hits(txt, lang).cast("long").alias(f"s_{lang}") for lang in ("en", "de", "es", "fr")]
    scored = docs.select("doc_id", F.col("lang").alias("labeled_lang"), *cols)
    return scored.withColumn(
        "predicted_lang",
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr"),
    ).select("doc_id", "labeled_lang", "predicted_lang", "s_en", "s_de", "s_es", "s_fr")


@register(
    "text_tokens_fingerprint",
    "TT1,F10",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
           -- list_prepend(0, ...): DuckDB's list_reduce seeds the accumulator
           -- with the FIRST element *unreduced*, so a 1-token doc whose word
           -- code >= 1000003 (unicode codepoints reach there via ascii()*131)
           -- would escape the modulo that Spark's aggregate(0, ...) applies;
           -- congruence hides the difference for >=2-token docs. Seeding 0
           -- makes the fold identical (tests/test_dedup_fuzz.py caught this).
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    list_transform(string_split(text, ' '),
                                      x -> CAST(ascii(x)*131 + length(x) AS BIGINT))),
                       (acc, x) -> (acc * 8191 + x) % 1000003) AS fingerprint
    FROM documents
    """,
)
def text_tokens_fingerprint(spark: SparkSession, sf_dir: str):
    """Token counting (whitespace + BPE-ish regex) + rolling-hash fingerprint."""
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    return docs.select(
        "doc_id",
        F.size(text.tokens(txt)).cast("long").alias("ws_tokens"),
        text.bpe_token_count(txt).cast("long").alias("bpe_tokens"),
        text.fingerprint(txt).alias("fingerprint"),
    )


@register(
    "ngram_jaccard_pairs",
    "DD2,J12",
    f"""
    WITH sh AS ({_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_inter
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc1, doc2, n_inter,
           s1.n_shingles AS n1, s2.n_shingles AS n2,
           CAST(n_inter AS DOUBLE) / (s1.n_shingles + s2.n_shingles - n_inter) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE CAST(n_inter AS DOUBLE) / (s1.n_shingles + s2.n_shingles - n_inter) >= 0.1
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str):
    """3-gram Jaccard near-dup pairs ≥ 0.1 — integer set arithmetic, exact."""
    docs = t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1)


def _minhash_sig_sql(num_hashes: int = 8) -> str:
    mins = ",\n               ".join(
        f"MIN(({2*i+1}*h + {97*i+13}) % {dedup.MINHASH_PRIME}) AS sig_{i}"
        for i in range(num_hashes)
    )
    return f"""
    sigs AS (
        SELECT doc_id, {mins}
        FROM (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h FROM sh) h
        GROUP BY doc_id
    )"""


_BANDED = "\n        UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, sig_{2*b} || '_' || sig_{2*b+1} AS key FROM sigs"
    for b in range(4)
)


@register(
    "minhash_lsh_pairs",
    "DD3,J12,A1",
    f"""
    WITH sh AS ({_SHINGLES}),
    {_minhash_sig_sql(8)},
    banded AS (
        {_BANDED}
    )
    SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_shared_bands
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str):
    """MinHash (8 perms) + LSH banding (4 bands × 2) candidate pairs.

    The near-linear near-dup pipeline: constant-size signature per doc, then
    an equi-join on band keys — no quadratic blowup at scale.
    """
    docs = t(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs, num_hashes=8, band_size=2)


def _simhash_sql(bits: int = 16) -> str:
    bit_sums = ",\n               ".join(
        f"CAST(SUM(((h >> {j}) & 1) * 2 - 1) AS BIGINT) AS b{j}" for j in range(bits)
    )
    packed = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
    WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks),
    bitsums AS (
        SELECT doc_id, {bit_sums}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM bitsums
    """


@register("simhash_docs", "DD4", _simhash_sql(16))
def simhash_docs(spark: SparkSession, sf_dir: str):
    """16-bit SimHash per document over distinct tokens."""
    docs = t(spark, sf_dir, "documents")
    return dedup.simhash(docs, bits=16)


@register(
    "dedup_clusters",
    "DD6,DD3,J2,A1",
    f"""
    WITH RECURSIVE sh AS ({_SHINGLES}),
    {_minhash_sig_sql(8)},
    banded AS (
        {_BANDED}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc1 AS a, doc2 AS b FROM pairs
        UNION ALL
        SELECT doc2 AS a, doc1 AS b FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS comp FROM edges
        UNION
        SELECT e.a AS node, r.comp AS comp FROM edges e JOIN reach r ON r.node = e.b
    ),
    labels AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
    sizes AS (SELECT comp, COUNT(*) AS cluster_size FROM labels GROUP BY comp)
    SELECT l.node AS doc_id, l.comp AS cluster_id, s.cluster_size,
           l.node = l.comp AS is_canonical
    FROM labels l JOIN sizes s ON l.comp = s.comp
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str):
    """Duplicate-cluster resolution: LSH candidate pairs → connected
    components (hash-min label propagation) → per-doc cluster id, cluster
    size, and keep/drop decision (canonical = lowest doc_id).

    The last stage of the at-scale dedup pipeline — pairwise near-dup
    evidence becomes one actionable row per document. The oracle computes
    the same components with a recursive CTE (transitive closure + min),
    which is exact at oracle scale; the Spark side's iterative hash-min is
    the shape that survives 100 TB (see operators/dedup.py).
    """
    docs = t(spark, sf_dir, "documents")
    return dedup.dup_clusters(docs, num_hashes=8, band_size=2)


@register(
    "dedup_apply",
    "DD7,DD1,DD6,U4,P12",
    f"""
    WITH RECURSIVE sh AS ({_SHINGLES}),
    {_minhash_sig_sql(8)},
    banded AS (
        {_BANDED}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    edges AS (
        SELECT doc1 AS a, doc2 AS b FROM pairs
        UNION ALL
        SELECT doc2 AS a, doc1 AS b FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS comp FROM edges
        UNION
        SELECT e.a AS node, r.comp AS comp FROM edges e JOIN reach r ON r.node = e.b
    ),
    labels AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
    drop_lsh AS (SELECT node AS doc_id FROM labels WHERE node <> comp),
    drop_exact AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                       ' +', ' ', 'g')))) AS keep
            FROM documents
        ) WHERE doc_id <> keep
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_lsh
                           UNION SELECT doc_id FROM drop_exact)
    """,
)
def dedup_apply(spark: SparkSession, sf_dir: str):
    """The dedup pipeline's output stage: the kept corpus after dropping
    exact-text twins and non-canonical LSH near-dup cluster members.

    Composes exact hash-groupBy dedup (catches sub-shingle-length docs)
    with connected-component cluster resolution — the decision a 100 TB
    training-data pipeline actually ships.
    """
    docs = t(spark, sf_dir, "documents")
    return dedup.apply_dedup(docs, num_hashes=8, band_size=2)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"
)


@register(
    "embed_knn_brute",
    "SIM1,O3,J12",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_DOT.format(a='q.v', b='c.v')} /
               (sqrt({_DOT.format(a='q.v', b='q.v')}) * sqrt({_DOT.format(a='c.v', b='c.v')})) AS cosine
        FROM e q, e c
        WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, round(cosine, 8) AS cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def embed_knn_brute(spark: SparkSession, sf_dir: str):
    """Brute-force cosine top-5 for query vectors (id < 20).

    Dot products widen float→double then accumulate sequentially — bit-exact
    across engines; ranking tiebreak on neighbor id.
    """
    emb = t(spark, sf_dir, "embeddings")
    out = similarity.cosine_topk(emb, query_ids_max=20, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "embed_lsh_buckets",
    "SIM2,A18",
    """
    WITH w AS (
        SELECT d.d, k.k,
               ((1103515245*(d.d*8 + k.k) + 12345) % 2147483648) - 1073741824 AS wq
        FROM generate_series(0, 63) d(d), generate_series(0, 7) k(k)
    ),
    vals AS (
        SELECT vec_id, i - 1 AS d,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS vq
        FROM embeddings, generate_series(1, 64) s(i)
    ),
    proj AS (
        SELECT vec_id, k, CAST(SUM(vq * wq) AS BIGINT) AS s
        FROM vals JOIN w USING (d) GROUP BY 1, 2
    ),
    buckets AS (
        SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id
    )
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
    FROM buckets GROUP BY bucket
    """,
)
def embed_lsh_buckets(spark: SparkSession, sf_dir: str):
    """Random-hyperplane LSH bucket histogram (integer-quantized, exact).

    The scale path for ANN: bucket assignment is a shuffle-free per-row
    fold against literal integer hyperplanes — linear in corpus size,
    deterministic under any partitioning because all arithmetic is integer.
    """
    emb = t(spark, sf_dir, "embeddings")
    return similarity.lsh_bucket_histogram(emb, spark, planes=8)


@register(
    "embed_ivf_knn",
    "SIM2,O3,J12,A14,W4",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    scored AS (
        SELECT e.vec_id, c.cid,
               {_DOT.format(a='e.v', b='c.cv')} /
               (sqrt({_DOT.format(a='e.v', b='e.v')}) * sqrt({_DOT.format(a='c.cv', b='c.cv')})) AS cos
        FROM e, c
    ),
    ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS crn
        FROM scored
    ),
    assign AS (SELECT vec_id AS neighbor_id, cid FROM ranked WHERE crn = 1),
    probe AS (SELECT vec_id AS query_id, cid FROM ranked
              WHERE vec_id < 20 AND crn <= 2),
    pairs AS (
        SELECT p.query_id, a.neighbor_id,
               {_DOT.format(a='q.v', b='n.v')} /
               (sqrt({_DOT.format(a='q.v', b='q.v')}) * sqrt({_DOT.format(a='n.v', b='n.v')})) AS cosine
        FROM probe p
        JOIN assign a USING (cid)
        JOIN e q ON q.vec_id = p.query_id
        JOIN e n ON n.vec_id = a.neighbor_id
        WHERE a.neighbor_id <> p.query_id
    )
    SELECT query_id, neighbor_id, round(cosine, 8) AS cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def embed_ivf_knn(spark: SparkSession, sf_dir: str):
    """IVF-style ANN: deterministic coarse quantizer (vectors id < 16 as
    stand-in centroids), argmax-cosine inverted lists, nprobe=2 probing,
    exact top-5 within the probed lists. Complements embed_lsh_buckets as
    the second scale path (SIM2): candidate count is n/K·nprobe per query
    instead of n, with the centroid table broadcast."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, k=5, n_centroids=16, nprobe=2, query_ids_max=20)


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------


@register(
    "multimodal_decode",
    "MM1,M3",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'img' ELSE 'aud' END AS format
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str):
    """Binary payload → typed metadata via Arrow-batched mapInPandas.

    The decode itself is a deterministic stub (no media libs in container);
    the Spark plumbing — binary column, Arrow batches, typed output schema —
    is the real thing and is what the oracle checks.
    """
    docs = t(spark, sf_dir, "documents")
    return multimodal.decode_metadata(docs)


@register(
    "multimodal_resize",
    "MM1,M3,F6",
    """
    WITH meta AS (
        SELECT doc_id,
               64 + octet_length(encode(text)) % 512 AS w,
               64 + (octet_length(encode(text)) * 7) % 512 AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST((w * 224) // GREATEST(w, h) AS INTEGER) AS out_width,
           CAST((h * 224) // GREATEST(w, h) AS INTEGER) AS out_height,
           CAST((224 * 1000000) // GREATEST(w, h) AS BIGINT) AS scale_num
    FROM meta
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str):
    """Aspect-preserving resize geometry over binary payloads (stubbed
    pixel op, real Arrow plumbing + integer geometry)."""
    docs = t(spark, sf_dir, "documents")
    return multimodal.resize_metadata(docs, target=224)


@register(
    "multimodal_frame_sample",
    "MM1,M3,F14",
    """
    WITH vids AS (
        SELECT doc_id, octet_length(encode(text)) // 100 AS n_frames
        FROM documents
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS frame_idx,
           CAST(k * 100 AS BIGINT) AS frame_offset
    FROM vids, LATERAL unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 4)) t(k)
    WHERE n_frames > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str):
    """Every-4th-frame sampling from a binary video payload — a
    row-expanding mapInPandas stage (one row per sampled frame)."""
    docs = t(spark, sf_dir, "documents")
    return multimodal.sample_frames(docs, frame_bytes=100, stride=4)


@register(
    "multimodal_features",
    "MM1,M1,F4",
    f"""
    SELECT doc_id,
           {", ".join(f"CAST(('0x' || substr(md5(text || '_{i}'), 1, 8)) AS BIGINT) / 4294967296.0 AS f{i}" for i in range(4))}
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str):
    """Deterministic pseudo-embedding per payload (md5-folded features) —
    the feature-extraction stage of a multimodal pipeline with the model
    call stubbed."""
    docs = t(spark, sf_dir, "documents")
    return multimodal.md5_features(docs, dims=4)


@register(
    "multimodal_error_channel",
    "MM1,S13,M3",
    """
    WITH v AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               CASE WHEN text IS NULL THEN 'error:null'
                    WHEN octet_length(encode(text)) = 0 THEN 'error:empty'
                    WHEN octet_length(encode(text)) < 4 THEN 'error:truncated'
                    WHEN unicode(substr(text, 1, 1)) >= 128 THEN 'error:badheader'
                    ELSE 'ok' END AS status
        FROM documents
    )
    SELECT doc_id,
           CAST(n AS INTEGER) AS byte_len,
           CAST(CASE WHEN status = 'ok' THEN 64 + n % 512 END AS INTEGER) AS width,
           CAST(CASE WHEN status = 'ok' THEN 64 + (n * 7) % 512 END AS INTEGER) AS height,
           CASE WHEN status = 'ok'
                THEN CASE WHEN n % 2 = 0 THEN 'img' ELSE 'aud' END END AS format,
           status
    FROM v
    """,
)
def multimodal_error_channel(spark: SparkSession, sf_dir: str):
    """Decode with a PER-PAYLOAD S13 error channel (VERDICT r10 item 5):
    malformed payloads (null / empty / truncated / bad magic byte) become
    typed error ROWS instead of dead Arrow batches or aborted jobs. The
    kernel's per-payload try/except plus the JVM-side validate_payloads
    prefilter are fuzzed with adversarial raw bytes in
    tests/test_multimodal_fuzz.py; this catalog twin oracle-checks the
    status semantics on the documents corpus (whose empty-string docs
    exercise error:empty for real). Composes with
    sources.io.split_error_channel downstream."""
    docs = t(spark, sf_dir, "documents")
    return multimodal.decode_with_errors(docs)


_LSH_BUCKETS_CTE = """
    w AS (
        SELECT d.d, k.k,
               ((1103515245*(d.d*8 + k.k) + 12345) % 2147483648) - 1073741824 AS wq
        FROM generate_series(0, 63) d(d), generate_series(0, 7) k(k)
    ),
    vals AS (
        SELECT vec_id, i - 1 AS d,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS vq
        FROM embeddings, generate_series(1, 64) s(i)
    ),
    proj AS (
        SELECT vec_id, k, CAST(SUM(vq * wq) AS BIGINT) AS s
        FROM vals JOIN w USING (d) GROUP BY 1, 2
    ),
    buckets AS (
        SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id
    )"""


@register(
    "dedup_embed_cosine",
    "DD5,SIM1,SIM2,J12",
    f"""
    WITH {_LSH_BUCKETS_CTE},
    e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, bucket
        FROM embeddings JOIN buckets USING (vec_id)
    ),
    scored AS (
        SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
               round({_DOT.format(a='a.v', b='b.v')} /
                     (sqrt({_DOT.format(a='a.v', b='a.v')}) * sqrt({_DOT.format(a='b.v', b='b.v')})), 8) AS cosine
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT drop_id, COUNT(*) AS n_dups, MIN(keep_id) AS canonical_id,
           MAX(cosine) AS best_cosine
    FROM scored WHERE cosine >= 0.3
    GROUP BY drop_id
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str):
    """Embedding-cosine near-dup removal, scale shape: LSH-bucketed
    candidate generation (equi-join on the integer-deterministic hyperplane
    bucket) + exact sequential-fold cosine confirmation within buckets,
    keep-min-id policy. The O(n²) all-pairs twin is
    similarity.cosine_near_dups (tested at small n); bucketing makes pair
    count Σ_b n_b²/2 — linear-ish at 100 TB."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.lsh_cosine_near_dups(emb, spark, threshold=0.3, planes=8)


@register(
    "split_assign",
    "TS1,P9,A1",
    """
    WITH assigned AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT)
                   % 100 AS bucket
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """,
)
def split_assign(spark: SparkSession, sf_dir: str):
    """Deterministic train/val/test split (80/10/10) by hashed doc id —
    the standard reproducible-split primitive for a training-data
    pipeline. Hash-bucket assignment is stable under repartitioning,
    appends, and engine changes (md5 fold, same algorithm both engines);
    a seed-style salt (':split') decorrelates it from other hash uses of
    the same key. Zero shuffles: pure per-row projection.
    """
    docs = t(spark, sf_dir, "documents")
    bucket = dedup.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


PACK_BUDGET = 2048  # tokens per training pack (context window)
PACK_SHARDS = 32  # shard count — scales with corpus so each shard ≈ one file


@register(
    "pack_sequences",
    "TP1,A25,W7,F13",
    f"""
    WITH toks AS (
        SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS running
        FROM toks
    )
    SELECT shard, CAST((running - n_tokens) // {PACK_BUDGET} AS BIGINT) AS pack_no,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM cum
    GROUP BY shard, pack_no
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str):
    """Sequence packing: concatenate documents into fixed-token-budget
    training packs — the standard pretraining batch-prep step.

    Contiguous-concat semantics: within a shard, documents are laid out in
    doc_id order and a document belongs to the pack where its first token
    lands (token offset // budget); documents straddling a boundary split
    across packs at training time. Expressed as a per-shard running-sum
    window + integer division — exact in both engines.

    Scale: the window partitions by shard, so parallelism = shard count;
    PACK_SHARDS is a corpus-proportional constant (one shard ≈ one output
    file, e.g. 10⁵ shards at 100 TB), never a global window. Token counts
    ride the same BPE-ish regex as text_tokens_fingerprint.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        text.bpe_token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = toks.withColumn("running", F.sum("n_tokens").over(w))
    packed = cum.withColumn(
        "pack_no", F.expr(f"(running - n_tokens) div {PACK_BUDGET}")
    )
    return packed.groupBy("shard", "pack_no").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


_SPLIT_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT) % 100"
)


@register(
    "decontaminate_ngram",
    "TD1,J12,P2,A7",
    f"""
    WITH assigned AS (
        SELECT doc_id, text, {_SPLIT_BUCKET} AS bucket FROM documents
    ),
    train AS (SELECT doc_id, text FROM assigned WHERE bucket < 80),
    test AS (SELECT doc_id, text FROM assigned WHERE bucket >= 90),
    sh_train AS ({_SHINGLES.replace("FROM documents", "FROM train")}),
    sh_test AS (SELECT DISTINCT shingle
                FROM ({_SHINGLES.replace("FROM documents", "FROM test")})),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh_train GROUP BY doc_id),
    ov AS (
        SELECT doc_id, COUNT(*) AS n_overlap
        FROM sh_train JOIN sh_test USING (shingle)
        GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(o.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
           round(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / t.n_shingles, 6)
               AS contamination
    FROM tot t LEFT JOIN ov o USING (doc_id)
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str):
    """Benchmark decontamination: per-train-document 3-gram overlap with the
    held-out test split — the contamination scan every pretraining corpus
    needs before the split ships.

    Uses the same deterministic hash split as split_assign, so the test set
    is stable; its distinct n-grams are a benchmark-sized relation and are
    explicitly broadcast, making the scan a map-side semi-join over the
    train shingle table (no shuffle of the big side at 100 TB). Overlap
    ratio per doc feeds a drop/keep policy downstream (dedup_apply shape).
    """
    docs = t(spark, sf_dir, "documents")
    bucket = dedup.md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 100
    with_bucket = docs.withColumn("bucket", bucket)
    train = with_bucket.filter(F.col("bucket") < 80).select("doc_id", "text")
    test = with_bucket.filter(F.col("bucket") >= 90).select("doc_id", "text")
    sh_train = dedup.shingle_table(train)
    sh_test = dedup.shingle_table(test).select("shingle").distinct()
    tot = sh_train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    ov = (
        sh_train.join(F.broadcast(sh_test), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return tot.join(ov, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
        F.round(
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / F.col("n_shingles"), 6
        ).alias("contamination"),
    )


def _kmeans_oracle(k: int = 8, n_iter: int = 2, dims: int = 64) -> str:
    """CTE-chain twin of similarity.kmeans_quantized — one (distance →
    argmin → lattice-rounded centroid) block per Lloyd iteration."""
    ctes = [
        f"""pts AS (
        SELECT vec_id, i - 1 AS d,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS q
        FROM embeddings, generate_series(1, {dims}) s(i)
    )""",
        f"c0 AS (SELECT vec_id AS cid, d, q AS c FROM pts WHERE vec_id < {k})",
    ]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        ctes.append(
            f"""d{it} AS (
        SELECT p.vec_id, c.cid, SUM((p.q - c.c) * (p.q - c.c)) AS d2
        FROM pts p JOIN {prev} c USING (d) GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""a{it} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM d{it})
        WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{it} AS (
        SELECT a.cid, p.d,
               CAST(round(CAST(SUM(p.q) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS c
        FROM pts p JOIN a{it} a USING (vec_id) GROUP BY 1, 2
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT c.cid, c.d, c.c, s.n_members
    FROM c{n_iter} c
    JOIN (SELECT cid, COUNT(*) AS n_members FROM a{n_iter} GROUP BY cid) s USING (cid)
    """
    )


@register("kmeans_lloyd", "SIM3,J12,A14,M7", _kmeans_oracle())
def kmeans_lloyd(spark: SparkSession, sf_dir: str):
    """Train the IVF coarse quantizer: 2 Lloyd iterations of k=8 k-means in
    quantized-integer space (see similarity.kmeans_quantized for the
    determinism contract and per-iteration scale shape)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.kmeans_quantized(emb, k=8, n_iter=2)


@register(
    "corpus_pipeline",
    "TQ1,DD1,TD1,TS1,P12,A1,U4",
    f"""
    WITH quality AS (
        SELECT doc_id, text FROM documents
        WHERE len(string_split(text, ' ')) >= 5 AND {_hits(_EN)} >= 1
    ),
    kept AS (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   MIN(doc_id) OVER (
                       PARTITION BY md5(trim(regexp_replace(
                           regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                           ' +', ' ', 'g')))
                   ) AS keep_id
            FROM quality
        ) WHERE doc_id = keep_id
    ),
    assigned AS (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT)
                   % 100 AS bucket
        FROM kept
    ),
    corpus AS (SELECT doc_id, text, bucket FROM assigned WHERE bucket < 90),
    bench AS (
        SELECT doc_id, text FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT)
                  % 100 >= 90
    ),
    sh_corpus AS ({_SHINGLES.replace("FROM documents", "FROM corpus")}),
    sh_bench AS (SELECT DISTINCT shingle
                 FROM ({_SHINGLES.replace("FROM documents", "FROM bench")})),
    contaminated AS (
        SELECT DISTINCT doc_id FROM sh_corpus JOIN sh_bench USING (shingle)
    ),
    final AS (
        SELECT CASE WHEN bucket < 80 THEN 'train' ELSE 'val' END AS split,
               doc_id, text
        FROM corpus
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM final GROUP BY split
    """,
)
def corpus_pipeline(spark: SparkSession, sf_dir: str):
    """End-to-end training-corpus build — the four pipeline stages every
    100 TB corpus run chains, composed as ONE oracle-checked query:

    1. quality gate (TQ1): integer predicates only (>= 5 tokens, >= 1
       English stopword hit) — no float thresholds, so the cut is
       bit-identical in both engines;
    2. exact dedup (DD1): keep-lowest-id per normalized-text md5 group
       (window min — one shuffle on the uniformly distributed hash key);
    3. benchmark decontamination (TD1): drop any surviving train/val doc
       sharing a 3-gram shingle with the held-out test-bucket docs; the
       benchmark shingle set is broadcast (real benchmark suites are tiny
       next to the corpus — the decontaminate_ngram posture);
    4. deterministic split (TS1): md5(doc_id||':split') buckets, train/val
       retained, test held out as the benchmark side.

    Output: per-split doc/word/char totals (all integer sums → exact).
    Each stage is also oracle-checked standalone elsewhere in the catalog;
    this entry pins that the COMPOSITION holds end-to-end — the "switch
    your pipeline to this engine" query.

    Scale: stage 1 is a map-side filter; stage 2 one hash shuffle; stage 3
    a map-side broadcast semi-join over the exploded shingles; stage 4 a
    projection. Nothing quadratic, nothing driver-resident beyond the
    benchmark shingle set.
    """
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    quality = docs.filter(
        (F.size(text.tokens(txt)) >= 5) & (text.lang_hits(txt, "en") >= 1)
    ).select("doc_id", "text")

    h = F.md5(dedup.normalize_text(txt))
    w = Window.partitionBy(h)
    kept = (
        quality.withColumn("_keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )

    bucket = dedup.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))) % 100
    corpus = kept.withColumn("bucket", bucket).filter(F.col("bucket") < 90)
    bench = docs.withColumn("bucket", bucket).filter(F.col("bucket") >= 90)

    bench_sh = dedup.shingle_table(bench).select("shingle").distinct()
    contaminated = (
        dedup.shingle_table(corpus)
        .join(F.broadcast(bench_sh), "shingle")
        .select("doc_id")
        .distinct()
    )
    final = corpus.join(contaminated, "doc_id", "left_anti")

    return final.groupBy(
        F.when(F.col("bucket") < 80, "train").otherwise("val").alias("split")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(text.tokens(txt)).cast("long")).alias("total_words"),
        F.sum(F.length(txt).cast("long")).alias("total_chars"),
    )
