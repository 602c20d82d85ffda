"""Prior-artifact lifecycle: fit → parquet → reload → broadcast (S4/S5/S11).

The reference persists its historical priors as CSV artifacts (in/p_t.csv,
in/T_given_L.csv) and reloads them into ndarrays at kernel start
(play_eppa_cpu.py:72-77). Spark-first equivalent: priors live relationally as
parquet tables (partition-prunable, schema-checked), and are reconstructed
into the small dense ndarrays only at the kernel boundary, where they ride
the applyInPandas closure (one broadcast per executor).

The reload collect is bounded by construction — p_t is 54 rows, P(T|L) is
60×40 = 2,400 rows — so the driver-side materialization is a few KB no
matter the corpus scale that produced the fit.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import SparkSession

from bigdatabowl_spark.kernels.eppa import EppaPriors
from bigdatabowl_spark.kernels.priors import (
    T_given_L_prior,
    p_t_prior,
    priors_to_tables,
)

# Artifact root inside the repo tree (absolute so foreign-cwd driver sessions
# resolve the same location as test sessions).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_ARTIFACT_DIR = os.path.join(_REPO_ROOT, "spark-warehouse", "artifacts", "priors")


def save_priors(
    spark: SparkSession,
    out_dir: str = DEFAULT_ARTIFACT_DIR,
    priors: EppaPriors | None = None,
) -> dict[str, str]:
    """Persist the prior arrays as parquet tables (overwrite → idempotent,
    the S12 resume property: a re-run converges to the same artifact)."""
    priors = priors or EppaPriors.default()
    p_t_df, t_l_df = priors_to_tables(spark, priors.p_t, priors.T_given_L)
    paths = {
        "p_t": os.path.join(out_dir, "p_t"),
        "T_given_L": os.path.join(out_dir, "T_given_L"),
    }
    # coalesce(1): each artifact is ≤2,400 rows — one file per artifact reads
    # back with a single task and no small-file explosion
    p_t_df.coalesce(1).write.mode("overwrite").parquet(paths["p_t"])
    t_l_df.coalesce(1).write.mode("overwrite").parquet(paths["T_given_L"])
    return paths


def load_priors(spark: SparkSession, out_dir: str = DEFAULT_ARTIFACT_DIR) -> EppaPriors:
    """Reload parquet prior artifacts into dense ndarrays (S5: table → tensor).

    Missing-value cells default to 0.0; shapes are fixed by the artifact
    contract (p_t: 54, T|L: 60×40) exactly as the reference's reshape
    assumes (play_eppa_cpu.py:73).
    """
    p_t_rows = spark.read.parquet(os.path.join(out_dir, "p_t")).collect()
    p_t = np.zeros(54, dtype=np.float64)
    for r in p_t_rows:
        p_t[r["frame_to_pass"] - 1] = r["p"]
    t_l_rows = spark.read.parquet(os.path.join(out_dir, "T_given_L")).collect()
    T_L = np.zeros((60, 40), dtype=np.float64)
    for r in t_l_rows:
        T_L[r["dist"] - 1, r["T"] - 1] = r["p"]
    return EppaPriors(p_t=p_t, T_given_L=T_L)


def roundtrip_priors(spark: SparkSession, out_dir: str = DEFAULT_ARTIFACT_DIR) -> EppaPriors:
    """Full save→reload cycle returning the reloaded priors."""
    save_priors(spark, out_dir)
    return load_priors(spark, out_dir)


__all__ = [
    "DEFAULT_ARTIFACT_DIR",
    "save_priors",
    "load_priors",
    "roundtrip_priors",
    "p_t_prior",
    "T_given_L_prior",
]
