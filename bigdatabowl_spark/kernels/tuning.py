"""Physics-parameter tuning (SURVEY §2.10 M5, §3.3).

The reference tunes sigmoid/trajectory params (σ, λ_off/def, α) with torch
Adam over a DataLoader of per-play tensors
(completion_probability_torch.py:219-566). Spark-first split:

- the DATASET is pure DataFrame ops (filters, event self-join for ball
  start/end, outcome labels — PlaysDataset, :22-216) producing one row per
  true pass with model features and the completion outcome;
- the FIT is model training, not query execution (SURVEY §7 Phase 5): the
  featurized table is orders-of-magnitude smaller than tracking (one row
  per pass), so it collects to the driver where full-batch Adam on the
  binary-cross-entropy loss runs in NumPy (torch used instead when
  importable — same update rule). At 100 TB of tracking the pass table is
  still ~1e6 rows × a few floats — driver-safe by construction.

The fitted scalars feed EppaParams (kernels/params.py), mirroring how the
reference's tuned_model.pt feeds params.py:4-12.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

try:  # optional accelerator; the NumPy path is the contract
    import torch  # noqa: F401

    _HAS_TORCH = True
except Exception:  # pragma: no cover - container has no torch
    _HAS_TORCH = False


def pass_dataset(norm: DataFrame) -> DataFrame:
    """One row per true pass: features + completion outcome.

    Reference: PlaysDataset ETL (completion_probability_torch.py:22-216) —
    ball-start row (pass_forward) self-joined to ball-end row
    (pass_arrived) per play (J7), out-of-bounds passes dropped (J8),
    outcome from the result event. Features here are the ones our kernel's
    completion sigmoid consumes: pass distance and nearest-defender
    distance at arrival.
    """
    from pyspark.sql import Window

    # earliest qualifying frame per play — dropDuplicates without an order
    # would pick an arbitrary row when a play has both pass_arrived and an
    # outcome event (nondeterministic across runs/partitionings)
    w_first = Window.partitionBy("gameId", "playId").orderBy("frameId")
    ball = norm.filter(F.col("nflId") == 0)
    start = (
        ball.filter(F.col("event") == "pass_forward")
        .withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select("gameId", "playId", F.col("x").alias("sx"), F.col("y").alias("sy"))
    )
    end = (
        ball.filter(F.col("event").isin("pass_arrived", "pass_outcome_caught", "pass_outcome_incomplete"))
        .withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select("gameId", "playId", "frameId", F.col("x").alias("ex"), F.col("y").alias("ey"))
    )
    passes = (
        start.join(end, ["gameId", "playId"])
        # J8: drop passes landing off-field (completion_probability_torch.py:81-82)
        .filter(F.col("ex").between(0, 120) & F.col("ey").between(0, 160.0 / 3))
    )
    # nearest defender to the arrival point on the arrival frame
    defenders = norm.filter(F.col("team_pos") == "DEF").select(
        "gameId", "playId", "frameId", "x", "y"
    )
    with_def = passes.join(defenders, ["gameId", "playId", "frameId"], "left")
    # x*x, not pow(x, 2): POWER may differ from multiplication in the last
    # ulp between engines; products keep the oracle twin bit-exact
    dx, dy = F.col("x") - F.col("ex"), F.col("y") - F.col("ey")
    d_def = F.sqrt(dx * dx + dy * dy)
    px, py = F.col("ex") - F.col("sx"), F.col("ey") - F.col("sy")
    feats = (
        with_def.groupBy("gameId", "playId", "sx", "sy", "ex", "ey")
        .agg(F.min(d_def).alias("nearest_def_dist"))
        .withColumn("pass_dist", F.sqrt(px * px + py * py))
    )
    # outcome label: play contains a caught event (A15-style flag)
    outcome = norm.groupBy("gameId", "playId").agg(
        F.max(
            F.when(F.col("event") == "pass_outcome_caught", 1).otherwise(0)
        ).alias("completed")
    )
    return feats.join(outcome, ["gameId", "playId"]).select(
        "gameId", "playId", "pass_dist", "nearest_def_dist", "completed"
    )


@dataclass
class TunedParams:
    w_dist: float
    w_def: float
    bias: float
    loss: float
    n_iter: int

    def predict(self, pass_dist: np.ndarray, nearest_def_dist: np.ndarray) -> np.ndarray:
        z = self.w_dist * pass_dist + self.w_def * nearest_def_dist + self.bias
        return 1.0 / (1.0 + np.exp(-z))


MAX_FIT_ROWS = 2_000_000  # ~50 MB of float64 features — driver-safe


def fit_completion_params(
    dataset: DataFrame,
    lr: float = 0.05,
    n_iter: int = 500,
    seed_params: tuple[float, float, float] = (0.0, 0.0, 0.0),
    max_rows: int = MAX_FIT_ROWS,
) -> TunedParams:
    """Full-batch Adam on BCE for the 3-parameter completion sigmoid.

    Deterministic: fixed init, full-batch gradients (no shuffling), fixed
    iteration count — the analytic twin of the reference's torch loop
    (completion_probability_torch.py:520-559) without DataLoader sampling.

    The driver-side collect is bounded: at most ``max_rows`` rows are
    brought back, chosen deterministically (ordered by play key, not an
    arbitrary partition prefix) so the fit is reproducible whatever the
    cluster partitioning. A 3-parameter sigmoid saturates far below the cap,
    so the capped fit equals the full fit wherever both are feasible.
    """
    keys = [c for c in ("gameId", "playId") if c in dataset.columns] or [
        "pass_dist",
        "nearest_def_dist",
        "completed",
    ]
    capped = dataset.orderBy(*keys).limit(max_rows)
    pdf = capped.select("pass_dist", "nearest_def_dist", "completed").toPandas()
    X = np.stack(
        [
            pdf["pass_dist"].to_numpy(np.float64),
            pdf["nearest_def_dist"].to_numpy(np.float64),
            np.ones(len(pdf)),
        ],
        axis=1,
    )
    y = pdf["completed"].to_numpy(np.float64)
    theta = np.array(seed_params, dtype=np.float64)
    m = np.zeros(3)
    v = np.zeros(3)
    b1, b2, eps = 0.9, 0.999, 1e-8
    loss = float("nan")
    for t in range(1, n_iter + 1):
        z = X @ theta
        p = 1.0 / (1.0 + np.exp(-z))
        loss = float(-np.mean(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12)))
        g = X.T @ (p - y) / len(y)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        theta = theta - lr * mh / (np.sqrt(vh) + eps)
    return TunedParams(
        w_dist=float(theta[0]),
        w_def=float(theta[1]),
        bias=float(theta[2]),
        loss=loss,
        n_iter=n_iter,
    )
