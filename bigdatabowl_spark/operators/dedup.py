"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All hashing goes through md5 (identical algorithm in Spark and DuckDB) folded
to a BIGINT, so every operator has a bit-exact SQL oracle twin.

Scale posture (100 TB): shingling is an array transform per row (no shuffle);
the explode→distinct→self-join for Jaccard shuffles on the *shingle* key
(high cardinality, well distributed by the hash itself); MinHash reduces each
doc to a constant-size signature before any pairwise work, and LSH banding
turns candidate generation into an equi-join on band keys — the classic
near-linear near-dup pipeline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def md5_long(c: Column) -> Column:
    """Leading 8 hex chars of md5 as BIGINT (cross-engine deterministic)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def normalize_text(c: Column) -> Column:
    """Canonical form for exact dedup: lowercase, strip non [a-z ], collapse
    whitespace."""
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z ]", "")
    return F.trim(F.regexp_replace(cleaned, r" +", " "))


def shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined) from a single-space-tokenized
    text. Documents with fewer than n tokens yield an empty array.

    NOTE: evaluates `split` once per shifted-slice reference (n times per
    row) — prefer `shingles_from_tokens` over a materialized token-array
    column in hot paths to split exactly once."""
    return shingles_from_tokens(F.split(text, " "), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingle array from an already-split token array column.

    Built as arrays_zip of n shifted slices + one transform — ~1.7× faster
    than a per-index element_at concat (one interpreted lambda call per
    shingle instead of n lookups). The zip pads the shifted tails with
    null; slicing to size−n+1 drops those partial shingles, and docs with
    fewer than n tokens yield an empty array."""
    sz = F.size(toks)
    shifted = [toks.alias("t0")] + [
        F.slice(toks, i + 1, F.greatest(sz - i, F.lit(0))).alias(f"t{i}")
        for i in range(1, n)
    ]
    make = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[f"t{j}"] for j in range(n)]),
    )
    return F.slice(make, 1, F.greatest(sz - n + 1, F.lit(0)))


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups on normalized text (hash-groupBy dedup)."""
    h = F.md5(normalize_text(F.col(text_col))).alias("text_hash")
    return (
        df.groupBy(h)
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs — the base relation for Jaccard/MinHash.

    Tokenizes ONCE into an array column, then shingles from it — keeps the
    per-row cost linear in tokens (see shingles() note)."""
    toked = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    # duplicate (id, shingle) pairs can only arise WITHIN a document, so a
    # per-row array_distinct replaces a global .distinct() — the dedup
    # happens map-side in the same scan, removing an entire shuffle of the
    # exploded table (~2s of the 3.5s shingle_table cost at sf0.1).
    return toked.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_from_tokens(F.col("toks"), n))).alias("shingle"),
    )


def _doc_shingle_counts(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, n_shingles) per document, computed map-side from the shingle
    array — no explode, no shuffle (r12: replaces a groupBy over the
    exploded table that re-ran the whole scan per reference). Documents
    with < n tokens get n_shingles = 0; their rows vanish in the inner
    join against the pair table, exactly as their absence did before."""
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(F.array_distinct(shingles_from_tokens(toks, n))).alias("n_shingles"),
    )


def _shingle_pair_counts(sh: DataFrame, id_col: str) -> DataFrame:
    """(doc1, doc2, n_inter) for every co-shingled ordered pair
    (doc1 < doc2) — one shuffle on the shingle key + array-side
    ordered-pair fan-out (the _copurchase_edges / bpe_pair_counts idiom)
    instead of a self-join that shuffles the exploded table twice and
    replays its scan per side (r12; guide §2.4). Per-shingle ids are
    distinct and sorted, so the expanded pairs are exactly the join's
    a.id < b.id matches; fan-out per shingle is C(doc_freq, 2), the same
    quadratic the join paid, just produced in the reduce task directly."""
    grouped = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ds")
    )
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS doc1, y AS doc2))))"
    )
    return (
        grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2"))
        .agg(F.count("*").alias("n_inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold.

    inter/union counts are integers → the similarity double is exact.

    Scale posture: this is the EXACT baseline — the co-shingle pair
    expansion materializes every co-occurring doc pair, which is
    inherently quadratic in per-shingle document frequency. At corpus
    scale use lsh_candidate_pairs (MinHash banding) for candidate
    generation and verify candidates with this metric; prefix filtering
    would not help at the low thresholds used for near-dup (prefix length
    (1−t)·|d|+1 barely filters below t≈0.7).
    """
    # Pair rows stay narrow (two longs) through the 1M+-row intersection
    # aggregate; union sizes join onto the (much smaller) aggregated pair
    # table afterwards. Measured against carrying n1/n2 through the pair
    # shuffle and against map-side size branches — this shape won at sf0.1.
    sh = shingle_table(df, text_col, id_col, n)
    sizes = _doc_shingle_counts(df, text_col, id_col, n)
    inter = _shingle_pair_counts(sh, id_col)
    sa = sizes.select(F.col(id_col).alias("doc1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col(id_col).alias("doc2"), F.col("n_shingles").alias("n2"))
    out = (
        inter.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc1", "doc2", "n_inter", "n1", "n2", "jaccard")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = min((a_i·h + b_i) mod p) over
    shingle hashes h. Returns one column per hash: sig_0..sig_{k-1}.

    Docs with no shingles (< n tokens) drop out — matching oracle semantics.
    """
    sh = shingle_table(df, text_col, id_col, n).withColumn("h", md5_long(F.col("shingle")))
    aggs = []
    for i in range(num_hashes):
        a_i, b_i = 2 * i + 1, 97 * i + 13
        aggs.append(
            F.min((F.lit(a_i) * F.col("h") + F.lit(b_i)) % F.lit(MINHASH_PRIME)).alias(f"sig_{i}")
        )
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Bands of `band_size` rows each; docs sharing any full band collide.
    Output: (doc1, doc2, n_shared_bands).
    """
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    n_bands = num_hashes // band_size
    band_exprs = []
    for b in range(n_bands):
        parts = [F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
        band_exprs.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *parts).alias("key"))
        )
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_exprs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # r12 (guide §2.4): bucket-and-expand instead of a band self-join —
    # one shuffle on (band, key) + array-side ordered-pair fan-out (the
    # _shingle_pair_counts idiom). The self-join's two sides each replayed
    # the whole scan→shingle→minhash subtree and shuffled the banded
    # table twice; per-bucket ids are distinct and sorted, so the expanded
    # pairs are exactly the join's id< matches and the per-pair count is
    # the number of shared bands, unchanged. Fan-out per bucket is
    # C(bucket, 2) — the same candidate volume the join produced; at
    # 100 TB bucket sizes are bounded by band-width choice (see SH1 note).
    grouped = banded.groupBy("band", "key").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ds")
    )
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS doc1, y AS doc2))))"
    )
    return (
        grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """One Large-Star round (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond", §3): for every node u with neighbourhood Γ(u),
    connect each strictly-larger neighbour to m = min(Γ(u) ∪ {u}).
    Input/output: symmetric-free undirected edge list (a, b), no self-loops.
    """
    m = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_nb"))
        .select("a", F.least("a", "_nb").alias("m"))
    )
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One Small-Star round (ibid.): orient every edge toward its smaller
    endpoint, then for each node u connect u and all its smaller neighbours
    to m = min(Γ≤(u) ∪ {u}). Output is larger→smaller oriented (a > b)."""
    orient = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    m = (
        orient.groupBy("a")
        .agg(F.min("b").alias("_nb"))
        .select("a", F.least("a", "_nb").alias("m"))
    )
    joined = orient.join(m, "a")
    nbr_edges = joined.select(F.col("b").alias("node"), F.col("m"))
    self_edges = m.select(F.col("a").alias("node"), F.col("m"))
    return (
        nbr_edges.union(self_edges)
        .filter(F.col("node") != F.col("m"))
        .select(F.col("node").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        # xor-fold, not sum: order-independent and cannot overflow ANSI long
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 50,
    star_after: int = 3,
) -> DataFrame:
    """Connected components over an undirected edge list.

    Phase 1 — hash-min label propagation: every node starts labelled with
    its own id; each round takes the min label over itself and its
    neighbours. Rounds needed = graph diameter, and near-dup graphs are
    dense local cliques (LSH bands link most pairs directly), so this
    converges in 2-4 rounds on real corpora.

    Phase 2 — if phase 1 has not converged after `star_after` rounds AND
    the un-converged frontier is still a meaningful fraction of the graph
    (> max(64, 1%) of nodes — an adversarial long chain keeps ~half its
    nodes changing every round, while a real dup-graph's tail is a handful
    of stragglers that one more cheap propagation round finishes), switch
    to alternating Large-Star/Small-Star contraction (Kiveris et al. 2014),
    which converges in O(log n) rounds with the same per-round shuffle
    shape. The star phase is seeded with the original edges PLUS the
    current labels-as-edges — each label edge joins a node to a member of
    its own component, so components are preserved and phase-1 progress is
    kept as shortcuts.

    Returns (node, comp) for every node that appears in at least one edge
    (singletons have no duplicates to resolve and are excluded by both this
    and the oracle's recursive CTE); comp = component-minimum id.

    Scale posture (100 TB): every round in both phases is one shuffle on
    the node key plus a map-side min; the driver-side loop is control flow
    only (Pregel-style superstep barrier); all data stays distributed, and
    localCheckpoint truncates the growing lineage each round so the plan
    does not re-execute prior rounds.
    """
    from bigdatabowl_spark.operators.checkpointing import truncate_lineage

    sym = truncate_lineage(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    )
    # fused round 0: label(n) = min(n, min neighbor) in ONE aggregation —
    # replaces the identity init (distinct) plus a full propagation round
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_nb"))
        .select(F.col("a").alias("node"), F.least("a", "_nb").alias("comp"))
    )
    n_nodes = None  # lazily counted only if a star switch is considered
    for rnd in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_min"))
        )
        upd = truncate_lineage(
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left").select(
                "node",
                "comp",
                F.least(
                    F.col("comp"), F.coalesce("nbr_min", "comp")
                ).alias("new_comp"),
            ),
            rnd=rnd + 1,
        )
        changed = upd.filter(F.col("new_comp") != F.col("comp")).count()
        labels = upd.select("node", F.col("new_comp").alias("comp"))
        if changed == 0:
            return labels
        if rnd + 1 >= star_after:
            if n_nodes is None:
                n_nodes = labels.count()
            if changed > max(64, n_nodes // 100):
                break  # large frontier after star_after rounds → long chain
    # Phase 2: star contraction on original edges + label shortcuts.
    star = truncate_lineage(
        sym.filter(F.col("a") != F.col("b"))
        .union(labels.filter(F.col("node") != F.col("comp"))
               .select(F.col("node").alias("a"), F.col("comp").alias("b")))
        .distinct()
    )
    fp = None
    for srnd in range(1, max_iter + 1):
        sym2 = star.union(
            star.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        star = truncate_lineage(_small_star(_large_star(sym2)), rnd=srnd)
        new_fp = _edge_fingerprint(star)
        if new_fp == fp:
            break
        fp = new_fp
    # at the fixpoint every edge is (member → component root)
    roots = star.select(F.col("b").alias("node")).subtract(
        star.select(F.col("a").alias("node"))
    )
    return star.select(F.col("a").alias("node"), F.col("b").alias("comp")).union(
        roots.select("node", F.col("node").alias("comp"))
    )


def dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """End-to-end duplicate-cluster resolution: MinHash+LSH candidate pairs
    → connected components → per-doc (cluster_id, cluster_size,
    is_canonical), canonical = lowest doc id in the cluster.

    This is the stage that turns pairwise near-dup evidence into an
    actionable keep/drop decision per document — the final step of the
    at-scale dedup pipeline (keep `is_canonical`, drop the rest).
    """
    edges = lsh_candidate_pairs(df, text_col, id_col, n, num_hashes, band_size)
    labels = connected_components(edges)
    sizes = labels.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "comp").select(
        F.col("node").alias(id_col),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )


def apply_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    broadcast_drops: bool = True,
) -> DataFrame:
    """Emit the deduplicated corpus: drop exact-text twins (keep lowest id
    per normalized-text hash) and non-canonical members of LSH near-dup
    clusters, via left-anti joins against the two drop lists.

    Exact dedup is kept alongside the LSH pass because documents with fewer
    than `n` tokens have no shingles and are invisible to MinHash — the
    hash-groupBy still catches their identical twins. When the drop lists
    are small relative to the corpus (duplicate rows only — the common
    case), the drop side BROADCASTS into the anti-join: the corpus side is
    never shuffled or sorted — the final pass is map-only over the id
    column (r12; was a SortMergeJoin that exchanged+sorted every corpus id
    against a few-hundred-row right side). No `.distinct()` on the drop
    union — LeftAnti semantics ignore duplicate right rows, and the
    distinct only added a shuffle+aggregate of its own (note: exact-dup ids
    usually appear in BOTH lists, so the broadcast relation carries ~2x
    rows for exact dups; that redundancy is part of the sizing call below).

    broadcast_drops (r13, ADVICE r12): the drop-list size is
    data-dependent — a 20-50% duplicate fraction is realistic in raw web
    corpora, and past Spark's broadcast hard caps (~8 GB / 512M rows) a
    FORCED broadcast hint fails the job outright where a shuffled join
    degrades gracefully. Pass False for high-duplicate corpora to leave
    the strategy to the planner (AQE still converts to a runtime broadcast
    when the built drop list turns out small). The default stays True —
    the §3.1 small-side rule for the corpora this engine stages, kept as a
    caller decision instead of a code edit.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash")
    drop_exact = (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
        .withColumn("keep", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("keep"))
        .select(id_col)
    )
    drop_lsh = (
        connected_components(lsh_candidate_pairs(df, text_col, id_col, n, num_hashes, band_size))
        .filter(F.col("node") != F.col("comp"))
        .select(F.col("node").alias(id_col))
    )
    drops = drop_exact.union(drop_lsh)
    if broadcast_drops:
        drops = F.broadcast(drops)
    return df.select(id_col).join(drops, id_col, "left_anti")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Per-doc SimHash over distinct whitespace tokens.

    bit_j set iff Σ_tokens (2·((h>>j)&1) − 1) > 0, h = md5-folded token hash.
    """
    # distinct (id, tok) pairs can only repeat WITHIN a document, so a
    # map-side array_distinct replaces the global .distinct() — the dedup
    # happens in the same scan and the groupBy below is the plan's only
    # exchange (r12; the shingle_table trick from :84).
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    bit_aggs = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_aggs)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram containment ≥ threshold (either direction).

    Containment(A in B) = |S(A)∩S(B)| / |S(A)| — the asymmetric twin of
    Jaccard that catches a document fully embedded in a larger one (quote
    farms, wrapper boilerplate), which symmetric Jaccard misses when the
    container is much bigger than the containee.

    Scale posture: same EXACT-baseline shape as ngram_jaccard_pairs (the
    co-shingle pair expansion is quadratic in per-shingle doc frequency);
    at corpus scale generate candidates with MinHash banding first and
    verify with this metric. Both directions come from one unordered pair
    aggregate — no doubled pair shuffle.
    """
    sh = shingle_table(df, text_col, id_col, n)
    sizes = _doc_shingle_counts(df, text_col, id_col, n)
    inter = _shingle_pair_counts(sh, id_col)
    sa = sizes.select(F.col(id_col).alias("doc1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col(id_col).alias("doc2"), F.col("n_shingles").alias("n2"))
    out = (
        inter.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn("cont_1in2", F.col("n_inter").cast("double") / F.col("n1"))
        .withColumn("cont_2in1", F.col("n_inter").cast("double") / F.col("n2"))
        .filter(F.greatest(F.col("cont_1in2"), F.col("cont_2in1")) >= threshold)
    )
    return out.select("doc1", "doc2", "n_inter", "cont_1in2", "cont_2in1")
