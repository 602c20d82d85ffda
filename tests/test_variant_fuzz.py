"""Seeded cross-engine fuzzing of semi-structured (JSON/Variant) access.

The catalog's f_json_props / f_variant_props only ever see the testdata's
flat ``{"k": int}`` props. This fuzzer generates adversarial JSON — nested
objects, missing keys, null values, strings with punctuation/spaces, and
mixed-type fields — and pins that Spark's typed `variant_get` on a
`parse_json` Variant extracts the SAME values DuckDB's JSONPath operators
do: bigint leaves, string leaves, nested paths, and NULL for absent or
type-mismatched gets. Any divergence reproduces from the printed seed.
"""

from __future__ import annotations

import json
import random

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # randomized/long-poll sweep: redundant
# with the default-run catalog oracle + unit gates; deselected by default
# so the suite fits the verify wall budget (r13). Run via -m "" / -m slow.


SEEDS = range(6)

_WORDS = ["alpha", "beta gamma", "x,y;z", "(top)", "q-r_s", "0nine", ""]


def _gen_props(seed: int) -> pd.DataFrame:
    rng = random.Random(1000 + seed)
    rows = []
    for rid in range(rng.randint(60, 150)):
        obj = {}
        if rng.random() < 0.9:
            # type surprise (ADVICE r6: this dimension must hit an
            # EXTRACTED field): 'a' is usually an int, sometimes a
            # digit-string (typed get casts it: Spark variant_get and
            # DuckDB TRY_CAST both yield the number), sometimes a
            # non-numeric string (both yield NULL)
            r = rng.random()
            if r < 0.7:
                obj["a"] = rng.randint(-10**9, 10**9)
            elif r < 0.85:
                obj["a"] = str(rng.randint(-10**6, 10**6))
            else:
                obj["a"] = rng.choice(["12x", "nine", "1.5.2", ""])
        if rng.random() < 0.8:
            # 'b' extracted as string; sometimes an int (both engines
            # render the digits)
            obj["b"] = (
                rng.randint(0, 10**6)
                if rng.random() < 0.25
                else rng.choice(_WORDS)
            )
        if rng.random() < 0.7:
            # 'c' is usually an object; sometimes a SCALAR, so the
            # '$.c.d' path navigates into a non-object (NULL in both)
            r = rng.random()
            if r < 0.6:
                obj["c"] = {"d": rng.randint(0, 10**6)}
            elif r < 0.8:
                obj["c"] = {}
            else:
                obj["c"] = rng.randint(0, 100)
        if rng.random() < 0.3:
            obj["e"] = None
        if rng.random() < 0.2:
            obj["f"] = [1, 2, 3]
        rows.append({"rid": rid, "props": json.dumps(obj)})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("seed", SEEDS)
def test_variant_extraction_matches_duckdb_jsonpath(spark, tmp_path, seed):
    import pyspark.sql.functions as F

    from tests.oracle_harness import compare

    docs = _gen_props(seed)
    path = str(tmp_path / f"props{seed}.parquet")
    docs.to_parquet(path, index=False)

    df = spark.read.parquet(path)
    v = F.parse_json(F.col("props"))
    spark_df = df.select(
        "rid",
        F.try_variant_get(v, "$.a", "bigint").alias("a_int"),
        F.try_variant_get(v, "$.b", "string").alias("b_str"),
        F.try_variant_get(v, "$.c.d", "bigint").alias("cd_int"),
        F.try_variant_get(v, "$.absent", "bigint").alias("missing"),
    )
    con = duckdb.connect()
    duck_df = con.execute(
        f"""
        SELECT rid,
               TRY_CAST(props ->> '$.a' AS BIGINT) AS a_int,
               props ->> '$.b' AS b_str,
               TRY_CAST(props ->> '$.c.d' AS BIGINT) AS cd_int,
               TRY_CAST(props ->> '$.absent' AS BIGINT) AS missing
        FROM '{path}'
        """
    ).df()
    problems = compare(spark_df, duck_df)
    assert not problems, f"seed={seed}: {problems}"
