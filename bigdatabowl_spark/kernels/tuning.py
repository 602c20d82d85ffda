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


# ---------------------------------------------------------------------------
# Per-player padded-tensor completion model (the reference's J-feature form)
# ---------------------------------------------------------------------------

MAX_PLAYERS = 17  # the reference 0-pads every frame's player tensor to a
# fixed row count before batching (completion_probability_torch.py:205-216).
# When a play fields MORE than MAX_PLAYERS non-QB players, the tensor keeps
# the MAX_PLAYERS CLOSEST to the ball-end point (deterministic nflId
# tiebreak) — the arrival contest is distance-driven, so the far tail is
# the right thing to drop, and the policy is explicit rather than an
# accidental lowest-id slice.

_PLAYER_TENSOR_SCHEMA = (
    "gameId long, playId long, row int, dist double, tof double, "
    "is_off double, is_pad double, completed double"
)


def play_player_tensors(norm: DataFrame) -> DataFrame:
    """Per-play padded player tensors for the physics-parameter fit.

    The reference's PlaysDataset emits one (max_num, 13) float tensor per
    frame — player kinematics + ball start/end + time-of-flight, 0-padded
    to a fixed row count so frames batch into one rectangular tensor
    (completion_probability_torch.py:186-216). Same contract here as a
    DataFrame: exactly MAX_PLAYERS rows per play (is_pad marks the fill),
    each row carrying the arrival-contest features the p_int sigmoid
    consumes — distance from the player to the ball-end point and the
    pass's time of flight — plus the side flag and the play's completion
    label. applyInPandas, one play per Arrow batch, same partitioning as
    every kernel query (millions of plays → ample parallelism).
    """
    import pandas as pd

    def emit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        game, play = int(pdf["gameId"].iloc[0]), int(pdf["playId"].iloc[0])
        ball = pdf[pdf["nflId"] == 0]
        # sort like `arrive` below: with multiple pass_forward events the
        # first THROW frame must not depend on Arrow row order (ADVICE r5)
        throw = ball[ball["event"] == "pass_forward"].sort_values("frameId")
        arrive = ball[ball["event"].isin(
            ["pass_arrived", "pass_outcome_caught", "pass_outcome_incomplete"]
        )].sort_values("frameId")
        cols = ["gameId", "playId", "row", "dist", "tof", "is_off", "is_pad", "completed"]
        if throw.empty or arrive.empty:
            return pd.DataFrame(columns=cols)
        t_frame = int(throw["frameId"].iloc[0])
        a_frame = int(arrive["frameId"].iloc[0])
        ex, ey = float(arrive["x"].iloc[0]), float(arrive["y"].iloc[0])
        tof = (a_frame - t_frame) / 10.0  # 10 Hz tracking
        completed = float((pdf["event"] == "pass_outcome_caught").any())
        players = pdf[
            (pdf["frameId"] == a_frame)
            & (pdf["nflId"] != 0)
            & (pdf["position"] != "QB")
        ].sort_values("nflId")
        dx = players["x"].to_numpy(np.float64) - ex
        dy = players["y"].to_numpy(np.float64) - ey
        dist_all = np.sqrt(dx * dx + dy * dy)
        # keep the MAX_PLAYERS closest contestants (stable sort preserves
        # the nflId order as the tiebreak) — see the MAX_PLAYERS comment
        keep = np.argsort(dist_all, kind="stable")[:MAX_PLAYERS]
        keep.sort()  # back to nflId order within the kept set
        dist = dist_all[keep]
        is_off = (players["team_pos"].to_numpy() == "OFF").astype(np.float64)[keep]
        n = len(dist)
        pad = MAX_PLAYERS - n
        return pd.DataFrame(
            {
                "gameId": game,
                "playId": play,
                "row": np.arange(MAX_PLAYERS, dtype=np.int32),
                "dist": np.concatenate([dist, np.zeros(pad)]),
                "tof": tof,
                "is_off": np.concatenate([is_off, np.zeros(pad)]),
                "is_pad": np.concatenate([np.zeros(n), np.ones(pad)]),
                "completed": completed,
            }
        )

    return norm.groupBy("gameId", "playId").applyInPandas(emit, _PLAYER_TENSOR_SCHEMA)


@dataclass
class PlayerModelParams:
    tti_sigma: float
    tti_lambda_off: float
    tti_lambda_def: float
    loss: float
    n_iter: int


def _completion_prob(
    theta: np.ndarray,
    dist: np.ndarray,   # (B, MAX_PLAYERS)
    tof: np.ndarray,    # (B,)
    is_off: np.ndarray,  # (B, MAX_PLAYERS)
    valid: np.ndarray,   # (B, MAX_PLAYERS) 1 - is_pad
    s_max: float = 9.25,
    reax_t: float = 0.2,
) -> np.ndarray:
    """Forward pass of the per-player completion model.

    Per player: reach time = dist/s_max + reax_t (the reference's fixed
    a_max/s_max kinematics collapsed to the top-speed bound), then the
    p_int sigmoid in the reference's pi/(sqrt(3)*sigma) parameterization
    (play_eppa_cpu.py:294-300). Teams combine as independent events with a
    lambda EXPONENT on the miss product — 1 - prod(1-p)^lambda — which is
    the smooth (always-valid) form of the reference's multiplicative
    lambda*p weighting; lambda=1 recovers the exact independent union.
    Completion = P(some offender reaches) * P(no defender reaches).
    """
    sigma, lam_off, lam_def = theta
    t_reach = dist / s_max + reax_t
    z = (tof[:, None] - t_reach) * (np.pi / (np.sqrt(3.0) * sigma))
    p = 1.0 / (1.0 + np.exp(-np.clip(z, -60, 60)))
    log_miss = np.log1p(-np.clip(p, 0.0, 1.0 - 1e-12)) * valid
    off_term = (log_miss * is_off).sum(axis=1)
    def_term = (log_miss * (1.0 - is_off)).sum(axis=1)
    p_off = 1.0 - np.exp(lam_off * off_term)
    p_def = 1.0 - np.exp(lam_def * def_term)
    return p_off * (1.0 - p_def)


def fit_player_completion_params(
    dataset: DataFrame,
    lr: float = 0.02,
    n_iter: int = 2000,
    seed_params: tuple[float, float, float] = (0.9, 1.0, 1.0),
    max_rows: int = MAX_FIT_ROWS,
) -> PlayerModelParams:
    """Fit (tti_sigma, tti_lambda_off, tti_lambda_def) on padded player
    tensors — the reference's torch Adam/BCE tuning loop
    (completion_probability_torch.py:480-559) as deterministic full-batch
    NumPy over the play_player_tensors table.

    Gradients are central differences over the 3 physics parameters (6
    forward passes per step — exact enough at h=1e-6 and free of autograd
    machinery), the update is textbook Adam with fixed init and iteration
    count, so the fit is bit-reproducible. The collect is bounded by
    max_rows TOTAL rows (floored to a whole-play multiple so the reshape
    stays rectangular) and deterministically ordered like
    fit_completion_params — same ~50 MB driver budget, not per-play.
    """
    lim = (max_rows // MAX_PLAYERS) * MAX_PLAYERS
    rows = (
        dataset.orderBy("gameId", "playId", "row")
        .limit(lim)
        .select("gameId", "playId", "row", "dist", "tof", "is_off", "is_pad", "completed")
        .toPandas()
    )
    n_plays = len(rows) // MAX_PLAYERS
    if n_plays == 0:
        return PlayerModelParams(*seed_params, loss=float("nan"), n_iter=0)
    dist = rows["dist"].to_numpy(np.float64).reshape(n_plays, MAX_PLAYERS)
    is_off = rows["is_off"].to_numpy(np.float64).reshape(n_plays, MAX_PLAYERS)
    valid = 1.0 - rows["is_pad"].to_numpy(np.float64).reshape(n_plays, MAX_PLAYERS)
    tof = rows["tof"].to_numpy(np.float64).reshape(n_plays, MAX_PLAYERS)[:, 0]
    y = rows["completed"].to_numpy(np.float64).reshape(n_plays, MAX_PLAYERS)[:, 0]

    def bce(theta: np.ndarray) -> float:
        p = _completion_prob(theta, dist, tof, is_off, valid)
        p = np.clip(p, 1e-9, 1.0 - 1e-9)
        return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))

    theta = np.array(seed_params, dtype=np.float64)
    m = np.zeros(3)
    v = np.zeros(3)
    b1, b2, eps, h = 0.9, 0.999, 1e-8, 1e-6
    loss = float("nan")
    for t in range(1, n_iter + 1):
        g = np.empty(3)
        for j in range(3):
            up, dn = theta.copy(), theta.copy()
            up[j] += h
            dn[j] -= h
            g[j] = (bce(up) - bce(dn)) / (2 * h)
        loss = bce(theta)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        theta = theta - lr * mh / (np.sqrt(vh) + eps)
        theta[0] = max(theta[0], 1e-3)  # sigma stays positive
    return PlayerModelParams(
        tti_sigma=float(theta[0]),
        tti_lambda_off=float(theta[1]),
        tti_lambda_def=float(theta[2]),
        loss=loss,
        n_iter=n_iter,
    )
