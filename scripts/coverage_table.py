"""Regenerate COVERAGE.md: SURVEY §2 operator id → catalog queries.

Usage: PYTHONPATH=. python scripts/coverage_table.py
"""

from __future__ import annotations

from collections import defaultdict

import bigdatabowl_spark.plans  # noqa: F401 — populates CATALOG
from bigdatabowl_spark.plans.catalog import CATALOG

HEADER = """# SURVEY §2 operator coverage

Every operator row of `SURVEY.md` §2 (plus the training-data-pipeline and
streaming extensions) mapped to the catalog queries that exercise it. Each
query pairs a Spark DataFrame plan with a DuckDB oracle SQL twin that the
driver hash-compares at sf0.01; `*` marks a rows-only entry for genuinely
non-SQL-expressible kernels (numerics covered by unit tests instead —
tests/test_kernels.py, tests/test_tuning_defense.py).

Generated from the `@register` tags in `bigdatabowl_spark/plans/`;
regenerate with `PYTHONPATH=. python scripts/coverage_table.py`.
"""

SECTIONS = [
    ("Scans / sources / sinks (SURVEY §2.1)", [f"S{i}" for i in range(1, 14)]),
    ("Projections / filters (§2.2)", [f"P{i}" for i in range(1, 16)]),
    ("Joins (§2.3)", [f"J{i}" for i in range(1, 15)]),
    ("Aggregations (§2.4)", [f"A{i}" for i in range(1, 29)]),
    ("Windows (§2.5)", [f"W{i}" for i in range(1, 8)]),
    ("Sorts / top-k (§2.6)", [f"O{i}" for i in range(1, 6)]),
    ("Set operations (§2.7)", [f"U{i}" for i in range(1, 5)]),
    ("Scalar functions (§2.8)", [f"F{i}" for i in range(1, 20)]),
    ("UDF / kernels / models (§2.10)", [f"M{i}" for i in range(1, 10)]),
]


def main() -> None:
    by_id: dict[str, list[str]] = defaultdict(list)
    for name, q in CATALOG.items():
        for tag in q.survey.replace(" ", "").split(","):
            by_id[tag].append(name + ("" if q.oracle else "*"))

    lines = [HEADER]
    seen: set[str] = set()
    for title, ids in SECTIONS:
        seen |= set(ids)
        lines += [f"## {title}", "", "| id | catalog queries |", "|---|---|"]
        for i in ids:
            qs = ", ".join(f"`{n}`" for n in sorted(by_id.get(i, []))) or "—"
            lines.append(f"| {i} | {qs} |")
        lines.append("")
    extra = sorted(k for k in by_id if k not in seen)
    lines += [
        "## Training-data pipeline + streaming (engine extensions)",
        "",
        "| id | meaning | catalog queries |",
        "|---|---|---|",
    ]
    MEANINGS = {
        "S20": "JSONL corpus sink/scan round trip (LLM-corpus interchange)",
        "DD1": "exact dedup (hash-groupBy)",
        "DD2": "n-gram Jaccard near-dup",
        "DD3": "MinHash + LSH banding",
        "DD4": "SimHash",
        "DD5": "embedding-cosine near-dup",
        "DD6": "duplicate-cluster resolution (connected components)",
        "DD7": "dedup apply (emit the kept corpus)",
        "J15": "as-of join (union + ordered window; DuckDB ASOF oracle)",
        "J16": "full outer join (completes the join-type matrix)",
        "SIM1": "brute-force cosine top-k",
        "SIM2": "LSH-bucketed ANN (scale path)",
        "SIM3": "IVF coarse-quantizer training (Lloyd k-means, integer lattice)",
        "MM1": "multimodal binary decode/resize/sample/features",
        "TL1": "language id (n-gram heuristic)",
        "TQ1": "text quality scoring",
        "TT1": "token counting + fingerprinting",
        "TS1": "deterministic train/val/test split (hash buckets)",
        "TP1": "sequence packing into token-budget training packs",
        "TD1": "benchmark decontamination (train/test n-gram overlap)",
        "ST1": "tumbling windows (batch + stream twin)",
        "ST2": "sliding windows",
        "ST3": "session windows (gap-based)",
        "ST4": "custom stateful operator (applyInPandasWithState)",
        "ST5": "streaming exact dedup (dropDuplicatesWithinWatermark)",
        "ST6": "stream-stream interval join (dual watermarks)",
        "ST7": "stream-static enrichment join (broadcast dim per micro-batch)",
        "DD8": "asymmetric containment pairs (doc-in-doc)",
        "DD9": "incremental dedup vs historical corpus (batch ingest mode)",
        "TQ2": "intra-document repetition stats",
        "TQ3": "logistic quality scorer (classifier filtering)",
        "TQ4": "percentile-threshold quality filtering",
        "W8": "rolling z-score anomaly detection (trailing robust stats)",
        "TT2": "vocabulary heavy-hitters (top-k tokens)",
        "TT3": "BPE adjacent-pair counts (tokenizer training step)",
        "TT4": "TF-IDF keyword extraction",
        "TS2": "domain-mixture downsampling (data mixing)",
        "TS3": "temperature-scaled mixture reweighting (alpha=0.5)",
        "TX1": "PII redaction (regex scrub + checksum proof)",
        "TX2": "per-domain composition (URL host parse)",
        "GS1": "multi-granularity rollup (grouping sets, one shuffle)",
        "UV1": "wide-to-long feature melt (native unpivot)",
        "NT1": "per-group decile stratification (ntile window)",
        "RS1": "regular-grid resample + linear interpolation",
        "O7": "distributed global rank/percentile (no single-reducer sort)",
        "FN1": "ordered-funnel sequence matching (chained windows)",
        "TP2": "sliding-window document chunking",
        "MD1": "JSON metadata extraction (schema-on-read)",
        "SK1": "salted skew-safe aggregation (two-phase)",
        "SK2": "salted skew-safe join (replicate small side)",
        "O6": "Z-order (Morton) layout key for multi-dim file pruning",
        "S14": "CDC upsert merge (anti-join + union)",
        "S15": "materialized rollup reuse (continuous aggregate)",
        "DD10": "exact repeated n-gram spans (substring-dedup signal)",
        "SH1": "banded SimHash hamming pairs (DD4 linear-ish candidate path)",
        "SKX1": "KMV distinct-count sketch (mergeable, exact oracle twin)",
        "BF1": "bloom-filter semi-join pruning (runtime-filter pattern)",
        "SCD1": "slowly-changing-dimension type-2 history build",
        "PSI1": "population-stability-index drift between hash splits",
        "MK1": "Markov transition matrix over per-user event sequences",
        "ZM1": "zone-map (data-skipping) pruning statistics per bucket",
        "TT5": "out-of-vocabulary rate vs top-k corpus vocabulary",
        "ER1": "entity-resolution blocking pairs (bounded-block candidate join)",
        "RB1": "robust location/spread (median + MAD) per group",
        "TR1": "time-based RANGE window frame (trailing interval rollup)",
        "TR2": "time-weighted average (step-function integral)",
        "GR1": "triangle count + clustering coefficient (oriented-edge join)",
        "GR2": "PageRank, fixed iterations in exact integer arithmetic",
        "DD11": "prefix-filtered exact set-similarity join (AllPairs/ppjoin)",
        "CO1": "cohort retention matrix (first-activity week x offset)",
        "ST8": "foreachBatch merge sink (versioned state, exactly-once)",
        "SIM4": "product quantization (per-subspace lattice codebooks + codes)",
        "S16": "custom Python DataSource scan over .npy artifacts",
        "ST9": "custom streaming Python data source (offset-tracked artifact dir)",
        "DD12": "semantic dedup over embeddings (SemDeDup, per-cluster cosine)",
        "CDC1": "snapshot diff / change-data-feed derivation (row-hash compare)",
        "DQ1": "data-quality contract checks (pk/fk/domain/not-null suite)",
        "S17": "custom Python DataSource writer (.npy sink, 2-phase commit)",
        "CMS1": "Count-Min sketch heavy hitters (exact integer twin)",
    }
    for i in extra:
        qs = ", ".join(f"`{n}`" for n in sorted(by_id[i]))
        lines.append(f"| {i} | {MEANINGS.get(i, '')} | {qs} |")
    lines.append("")
    n_oracle = sum(1 for q in CATALOG.values() if q.oracle)
    lines.append(
        f"**Catalog: {len(CATALOG)} queries, {n_oracle} oracle-checked, "
        f"{len(CATALOG) - n_oracle} rows-only kernel entries.**"
    )
    with open("COVERAGE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md written: {len(CATALOG)} queries")


if __name__ == "__main__":
    main()
