"""Seeded cross-engine fuzzing of the tokenization-based catalog queries.

The documents testdata is well-behaved prose; the single-space-split
tokenizer contract (operators/text.tokens ↔ DuckDB string_split) has sharp
edges the catalog never exercises: empty text, consecutive / leading /
trailing spaces (empty-string tokens), single-token docs, >VOCAB_SIZE
distinct tokens (OOV paths), and exact frequency ties (vocab id tie-break
on byte order). This fuzzer generates adversarial corpora from fixed
seeds, writes them as a documents.parquet, and runs the REAL catalog
builders (`encode_tokens`, `ngram_lm_score`) against their REAL oracle SQL
on both engines — any split/ordering/rounding divergence reproduces from
the printed seed.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from bigdatabowl_spark.plans.catalog import CATALOG
from tests.oracle_harness import compare

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


SEEDS = range(6)


def _gen_docs(seed: int) -> pd.DataFrame:
    rng = random.Random(seed)
    # Zipf-ish shared vocabulary + a long unique tail so some seeds
    # overflow encode_tokens' 256-id vocab (OOV path) and some do not;
    # test_fuzz_corpora_cover_both_vocab_regimes pins that both regimes
    # actually occur across SEEDS.
    head = [f"w{i}" for i in range(rng.choice([40, 300]))]
    rows = []
    for doc_id in range(rng.randint(40, 120)):
        n = rng.randint(0, 30)
        toks = []
        for j in range(n):
            r = rng.random()
            if r < 0.70:
                toks.append(head[min(int(rng.expovariate(0.08)), len(head) - 1)])
            elif r < 0.92:
                toks.append(rng.choice(head))  # uniform: reaches the full head
            else:
                toks.append(f"u{doc_id}x{j}")  # unique tail (guaranteed OOV)
        text = " ".join(toks)
        # adversarial whitespace mutations (both engines must agree on
        # the empty-string tokens these create)
        r = rng.random()
        if r < 0.1:
            text = " " + text
        elif r < 0.2:
            text = text + " "
        elif r < 0.3:
            text = text.replace(" ", "  ", 1)
        elif r < 0.35:
            text = ""
        rows.append({"doc_id": doc_id, "text": text})
    return pd.DataFrame(rows)


def _run_pair(spark, tmp_path, name: str, docs: pd.DataFrame, seed: int):
    sf_dir = str(tmp_path / f"fuzz{seed}")
    docs_path = f"{sf_dir}/documents.parquet"
    import os

    os.makedirs(sf_dir, exist_ok=True)
    docs.to_parquet(docs_path, index=False)

    q = CATALOG[name]
    spark_df = q.builder(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_path}'"
    )
    duck_df = con.execute(q.oracle).df()
    problems = compare(spark_df, duck_df)
    assert not problems, f"seed={seed} query={name}: {problems}"


@pytest.mark.parametrize("seed", SEEDS)
def test_encode_tokens_fuzz(spark, tmp_path, seed):
    _run_pair(spark, tmp_path, "encode_tokens", _gen_docs(seed), seed)


@pytest.mark.parametrize("seed", SEEDS)
def test_ngram_lm_score_fuzz(spark, tmp_path, seed):
    _run_pair(spark, tmp_path, "ngram_lm_score", _gen_docs(seed), seed)


def test_fuzz_corpora_cover_both_vocab_regimes():
    """Guard the fuzzer itself: across SEEDS, at least one corpus must
    overflow encode_tokens' 256-id vocabulary (exercising the OOV coalesce
    and the LIMIT-256 truncation tie-break) and at least one must fit
    inside it — otherwise those branches are dead in every fuzz case."""
    distincts = [
        len({tok for text in _gen_docs(s)["text"] for tok in text.split(" ")})
        for s in SEEDS
    ]
    assert any(d > 256 for d in distincts), distincts
    assert any(d <= 256 for d in distincts), distincts
