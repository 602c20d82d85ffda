"""Historical-prior fitting (SURVEY Phase 2): p(t), P(T|L) from pass tables.

The reference fits gamma distributions to throw-time and time-of-flight
histograms (historical-L-T.ipynb · cells 5,12,25 — A20/A21) with scipy.
scipy is not available here, so the MLE is pure NumPy: Newton iteration on
the gamma log-likelihood using a digamma/trigamma series approximation —
executed per group inside applyInPandas (Arrow-batched, one group per task).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bigdatabowl_spark.kernels.params import N_TOF, tof_values

# ------------------------------------------------------------------ digamma


def _digamma(x: np.ndarray) -> np.ndarray:
    """ψ(x) via recurrence + asymptotic series (|err| < 1e-12 for x ≥ 6)."""
    x = np.asarray(x, dtype=np.float64)
    result = np.zeros_like(x)
    # recurrence ψ(x) = ψ(x+1) − 1/x until x ≥ 6
    xw = x.copy()
    for _ in range(8):
        small = xw < 6.0
        if not small.any():
            break
        result = np.where(small, result - 1.0 / xw, result)
        xw = np.where(small, xw + 1.0, xw)
    inv = 1.0 / xw
    inv2 = inv * inv
    series = (
        np.log(xw)
        - 0.5 * inv
        - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 / 252))
    )
    return result + series


def _trigamma(x: np.ndarray) -> np.ndarray:
    """ψ'(x) via recurrence + asymptotic series."""
    x = np.asarray(x, dtype=np.float64)
    result = np.zeros_like(x)
    xw = x.copy()
    for _ in range(8):
        small = xw < 6.0
        if not small.any():
            break
        result = np.where(small, result + 1.0 / (xw * xw), result)
        xw = np.where(small, xw + 1.0, xw)
    inv = 1.0 / xw
    inv2 = inv * inv
    series = inv * (1.0 + 0.5 * inv + inv2 * (1.0 / 6 - inv2 * (1.0 / 30 - inv2 / 42)))
    return result + series


def gamma_mle(values: np.ndarray, iters: int = 30) -> tuple[float, float]:
    """MLE (shape k, scale θ) of a gamma distribution, pure NumPy.

    Newton on k: f(k) = ln k − ψ(k) − (ln x̄ − mean(ln x)); θ = x̄/k.
    Moment-matched start; matches scipy.stats.gamma.fit(floc=0) to ~1e-8 —
    validated differentially in tests/test_gamma_mle.py against an
    independent solver (bisection + a higher-order digamma series) of the
    same score equation scipy's floc=0 MLE solves.
    """
    v = np.asarray(values, dtype=np.float64)
    v = v[v > 0]
    if v.size < 2:
        return float("nan"), float("nan")
    mean = v.mean()
    s = np.log(mean) - np.log(v).mean()
    k = (3 - s + np.sqrt((s - 3) ** 2 + 24 * s)) / (12 * s)  # Minka init
    for _ in range(iters):
        fk = np.log(k) - _digamma(np.array([k]))[0] - s
        fpk = 1.0 / k - _trigamma(np.array([k]))[0]
        step = fk / fpk
        k_new = k - step
        if k_new <= 0:
            k_new = k / 2
        if abs(k_new - k) < 1e-12:
            k = k_new
            break
        k = k_new
    return float(k), float(mean / k)


def gamma_pdf(x: np.ndarray, shape: float, scale: float) -> np.ndarray:
    """Gamma pdf without scipy (log-gamma via Stirling/Lanczos-free route)."""
    from math import lgamma

    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    xp = x[pos]
    log_pdf = (
        (shape - 1) * np.log(xp) - xp / scale - shape * np.log(scale) - lgamma(shape)
    )
    out[pos] = np.exp(log_pdf)
    return out


# ------------------------------------------------------- distributed fitting


def fit_gamma_by_group(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """A20: per-group gamma MLE via applyInPandas (one group per Arrow batch).

    Reference: groupby.apply(gamma.fit) (historical-L-T.ipynb · cell 12).
    Scale: groups shuffle once on the group key; the fit is O(n) per group.
    """
    schema = ", ".join(f"{c} string" for c in group_cols) + ", shape double, scale double, n long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        shape, scale = gamma_mle(pdf[value_col].to_numpy())
        row = {c: str(pdf[c].iloc[0]) for c in group_cols}
        row.update({"shape": shape, "scale": scale, "n": len(pdf)})
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(fit, schema)


def p_t_prior(max_frames: int = 54, shape: float = 4.0, scale: float = 6.5) -> np.ndarray:
    """p(t): probability the pass is thrown at frame t after snap, as a
    normalized gamma pdf over 1..max_frames (in/p_t.csv equivalent —
    54 rows, historical-L-T.ipynb · cells 5-7)."""
    t = np.arange(1, max_frames + 1, dtype=np.float64)
    p = gamma_pdf(t, shape, scale)
    return p / p.sum()


def T_given_L_prior(max_dist: int = 60) -> np.ndarray:
    """(L=60, T=40) P(time-of-flight | throw distance): gamma around the
    ballistic time for each 1-yd distance bin (in/T_given_L.csv equivalent,
    2400 rows; consumed reshaped (60,40) play_eppa_cpu.py:73)."""
    tof = tof_values()  # (T,)
    out = np.zeros((max_dist, N_TOF), dtype=np.float64)
    for L in range(1, max_dist + 1):
        mean_t = 0.08 * L + 0.6  # ~ballistic: longer throws fly longer
        k = 12.0
        p = gamma_pdf(tof, k, mean_t / k)
        total = p.sum()
        out[L - 1] = p / total if total > 0 else 0.0
    return out


def priors_to_tables(spark, p_t: np.ndarray, T_L: np.ndarray) -> tuple[DataFrame, DataFrame]:
    """Materialize prior arrays as small DataFrames (parquet-able artifacts,
    S4/S11 equivalents — the engine stores priors relationally, broadcasts
    ndarrays only inside kernels)."""
    from bigdatabowl_spark.sources.tables import local_rows_df

    p_t_df = local_rows_df(
        spark,
        [(i + 1, float(p)) for i, p in enumerate(p_t)],
        "frame_to_pass int, p double",
    )
    rows = [
        (L + 1, t_i + 1, float(T_L[L, t_i]))
        for L in range(T_L.shape[0])
        for t_i in range(T_L.shape[1])
    ]
    t_l_df = local_rows_df(spark, rows, "dist int, T int, p double")
    return p_t_df, t_l_df
