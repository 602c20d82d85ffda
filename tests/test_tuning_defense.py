"""M5 (parameter tuning) and M6 (defensive optimizer) tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bigdatabowl_spark.kernels.defense import (
    OptimizeConfig,
    optimize_defense,
    optimize_defense_frame,
)
from bigdatabowl_spark.kernels.eppa import EppaPriors
from bigdatabowl_spark.kernels.params import EppaParams
from bigdatabowl_spark.kernels.tuning import fit_completion_params, pass_dataset


@pytest.fixture(scope="module")
def pass_norm(spark):
    """Two plays with full pass lifecycle events; play 300 completes,
    play 400 does not."""
    rows = []
    for pid, caught in ((300, True), (400, False)):
        for fid in range(1, 26):
            if fid == 2:
                event = "ball_snap"
            elif fid == 18:
                event = "pass_forward"
            elif fid == 23:
                event = "pass_arrived"
            elif fid == 24:
                event = "pass_outcome_caught" if caught else "pass_outcome_incomplete"
            else:
                event = None
            bx = 30.0 + 0.5 * fid
            rows.append((1, pid, fid, event, 0, "Football", None, "FTBL", bx, 26.5, 5.0, 0.0))
            rows.append((1, pid, fid, event, 99, "QB", "QB", "OFF", 30.0, 26.5, 0.0, 0.0))
            for nid, pos, tp, x0, y0, vx, vy in [
                (11, "WR", "OFF", 40.0, 10.0, 5.0, 0.0),
                (12, "WR", "OFF", 45.0, 26.0, 2.0, 1.0),
                (21, "CB", "DEF", 42.0, 12.0 + (0.0 if caught else 8.0), -1.0, 0.5),
                (22, "S", "DEF", 47.0, 28.0, 0.0, -1.0),
            ]:
                rows.append((1, pid, fid, event, nid, f"P{nid}", pos, tp,
                             x0 + 0.3 * fid, y0, vx, vy))
    return spark.createDataFrame(
        rows,
        "gameId long, playId long, frameId int, event string, nflId long, "
        "displayName string, position string, team_pos string, x double, "
        "y double, v_x double, v_y double",
    )


def test_pass_dataset(spark, pass_norm):
    pdf = pass_dataset(pass_norm).toPandas().sort_values("playId")
    assert len(pdf) == 2  # one row per true pass (J7 self-join)
    assert pdf["completed"].tolist() == [1, 0]
    assert (pdf["pass_dist"] > 0).all()
    assert (pdf["nearest_def_dist"] > 0).all()


def test_fit_completion_params(spark):
    """BCE fit separates a synthetic separable dataset: completions happen
    when the nearest defender is far — w_def must come out positive and
    the loss must beat the coin-flip baseline ln(2)."""
    rng = np.random.default_rng(11)
    n = 400
    d_def = rng.uniform(0.5, 12.0, n)
    dist = rng.uniform(2.0, 40.0, n)
    completed = (d_def > 5.0).astype(int)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"pass_dist": dist, "nearest_def_dist": d_def, "completed": completed}
        )
    )
    fit = fit_completion_params(df, n_iter=800)
    assert fit.w_def > 0
    assert fit.loss < np.log(2.0)
    # determinism: same data, same init, same trajectory
    fit2 = fit_completion_params(df, n_iter=800)
    assert fit.w_dist == fit2.w_dist and fit.loss == fit2.loss


def test_fit_collect_is_bounded(spark):
    """M5's driver-side collect must be capped: with max_rows=k the fit
    consumes exactly the first k rows in deterministic key order — verified
    by fitting an explicitly pre-truncated twin of the same data."""
    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "pass_dist": rng.uniform(2.0, 40.0, n),
            "nearest_def_dist": rng.uniform(0.5, 12.0, n),
            "completed": (rng.uniform(size=n) > 0.5).astype(int),
        }
    )
    df = spark.createDataFrame(pdf)
    capped = fit_completion_params(df, n_iter=100, max_rows=50)
    head = pdf.sort_values(["pass_dist", "nearest_def_dist", "completed"]).head(50)
    truncated = fit_completion_params(spark.createDataFrame(head), n_iter=100)
    assert capped.w_dist == truncated.w_dist
    assert capped.loss == truncated.loss


def _def_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "nflId": [11, 12, 21, 22],
            "x": [44.0, 46.0, 52.0, 55.0],
            "y": [10.0, 40.0, 20.0, 35.0],
            "v_x": [5.0, 4.0, 0.0, 0.0],
            "v_y": [0.0, 0.0, 0.0, 0.0],
            "team_pos": ["OFF", "OFF", "DEF", "DEF"],
            "position": ["WR", "WR", "CB", "S"],
        }
    )


def test_optimize_defense_frame_improves():
    placed, before, after = optimize_defense_frame(
        _def_frame(),
        ball_start=np.array([35.0, 26.5]),
        frames_after_snap=20,
        params=EppaParams(),
        priors=EppaPriors.default(),
        cfg=OptimizeConfig(max_candidates=64),
    )
    assert len(placed) == 2  # one placement per defender
    assert np.isfinite([before, after]).all()
    # greedy argmin over candidates that include near-ballistic cells
    # must not concede more than the un-optimized projection
    assert after <= before + 1e-9
    # placements stay on the field
    assert placed["x_opt"].between(0, 120).all()
    assert placed["y_opt"].between(0, 54).all()


def test_optimize_defense_deterministic():
    kw = dict(
        ball_start=np.array([35.0, 26.5]),
        frames_after_snap=20,
        params=EppaParams(),
        priors=EppaPriors.default(),
        cfg=OptimizeConfig(max_candidates=32),
    )
    a = optimize_defense_frame(_def_frame(), **kw)
    b = optimize_defense_frame(_def_frame(), **kw)
    pd.testing.assert_frame_equal(a[0], b[0])
    assert a[1] == b[1] and a[2] == b[2]


def test_optimize_defense_spark(spark, pass_norm):
    out = optimize_defense(
        pass_norm, cfg=OptimizeConfig(max_candidates=24)
    ).toPandas()
    # 2 plays × 2 defenders
    assert len(out) == 4
    assert set(out["playId"]) == {300, 400}
    assert (out["eppa_after"] <= out["eppa_before"] + 1e-9).all()


def test_analytics_layer(spark, pass_norm):
    """Phase-4 read side over actual kernel outputs."""
    from bigdatabowl_spark.kernels.eppa import eppa_pass_summary, eppa_player_stats
    from bigdatabowl_spark.kernels.tuning import pass_dataset
    from bigdatabowl_spark.plans.analytics import (
        play_rankings,
        player_eppa_rankings,
        throw_calibration,
    )

    ps = eppa_pass_summary(pass_norm)
    stats = eppa_player_stats(pass_norm)

    ranks = player_eppa_rankings(stats, ps, spark).toPandas()
    assert not ranks.empty
    assert (ranks["n_plays"] >= 1).all()
    # weights renormalize within play: per-player weighted eppa is finite
    assert np.isfinite(ranks["weighted_eppa"]).all()
    assert (ranks["invariant_violations"] == 0).all()

    plays = play_rankings(ps).toPandas()
    assert set(plays["playId"]) <= {300, 400}
    assert plays["max_eppa1"].is_monotonic_decreasing

    cal = throw_calibration(ps, pass_dataset(pass_norm)).toPandas()
    assert not cal.empty
    assert cal["mean_predicted"].between(0, 1).all()
    assert cal["empirical_rate"].between(0, 1).all()
    assert (cal["invariant_violations"] == 0).all()


def test_optimize_defense_rollout(spark, pass_norm):
    """Multi-step rollout: defenders carry optimized state across re-plan
    frames; each step's result still improves on its projection."""
    out = optimize_defense(
        pass_norm, cfg=OptimizeConfig(max_candidates=16, n_steps=2, frame_stride=2)
    ).toPandas()
    # 2 plays × 2 steps × 2 defenders
    assert len(out) == 8
    assert set(out.groupby("playId")["frameId"].nunique()) == {2}
    assert (out["eppa_after"] <= out["eppa_before"] + 1e-9).all()


# ------------------------------------------------- padded player-tensor fit


def test_play_player_tensors_padded_contract(spark, pass_norm):
    """Every play emits exactly MAX_PLAYERS rows, real players first, pad
    rows flagged — the reference's fixed-shape tensor contract
    (completion_probability_torch.py:205-216)."""
    from bigdatabowl_spark.kernels.tuning import MAX_PLAYERS, play_player_tensors

    pdf = play_player_tensors(pass_norm).toPandas()
    for (_, _), grp in pdf.groupby(["gameId", "playId"]):
        assert len(grp) == MAX_PLAYERS
        grp = grp.sort_values("row")
        pads = grp["is_pad"].to_numpy()
        # pads are a suffix: once padding starts it never stops
        assert (np.diff(pads) >= 0).all()
        real = grp[grp["is_pad"] == 0]
        assert len(real) >= 2  # both sides present
        assert set(real["is_off"].unique()) <= {0.0, 1.0}
        assert (grp["tof"] > 0).all()


def test_play_player_tensors_overflow_keeps_closest(spark):
    """A play fielding MORE than MAX_PLAYERS non-QB players must keep the
    MAX_PLAYERS CLOSEST to the ball-end point — an explicit contest-driven
    truncation, not a silent lowest-nflId slice (the engine's own
    tracking_from_events fixture fields 20 non-QB players)."""
    from bigdatabowl_spark.kernels.tuning import MAX_PLAYERS, play_player_tensors

    n_players = MAX_PLAYERS + 3
    rows = []
    for fid, event in [(1, "pass_forward"), (3, "pass_arrived"), (4, "pass_outcome_caught")]:
        rows.append((1, 1, fid, event, 0, "Football", None, "FTBL", 50.0, 26.5, 0.0, 0.0))
        for j in range(n_players):
            # player j sits exactly j yards from the ball-end point
            rows.append(
                (1, 1, fid, event, 100 + j, f"P{j}", "WR",
                 "OFF" if j % 2 == 0 else "DEF", 50.0 + j, 26.5, 0.0, 0.0)
            )
    norm = spark.createDataFrame(
        rows,
        "gameId long, playId long, frameId int, event string, nflId long, "
        "displayName string, position string, team_pos string, x double, "
        "y double, v_x double, v_y double",
    )
    pdf = play_player_tensors(norm).toPandas().sort_values("row")
    assert len(pdf) == MAX_PLAYERS
    assert (pdf["is_pad"] == 0).all()  # overflow play: no pad rows
    # kept distances are exactly the MAX_PLAYERS smallest (0..MAX_PLAYERS-1)
    assert sorted(pdf["dist"].tolist()) == pytest.approx(list(range(MAX_PLAYERS)))


def test_fit_player_completion_recovers_planted_params(spark):
    """Planted-parameter recovery on a synthetic play set: soft labels are
    generated from the model at (sigma*, lambda_off*, lambda_def*); the
    deterministic Adam fit must recover all three physics parameters."""
    from bigdatabowl_spark.kernels.tuning import (
        MAX_PLAYERS,
        _completion_prob,
        fit_player_completion_params,
    )

    rng = np.random.default_rng(42)
    n_plays = 256
    true = np.array([0.55, 1.3, 0.7])
    n_real = rng.integers(10, MAX_PLAYERS + 1, n_plays)
    is_off = (rng.random((n_plays, MAX_PLAYERS)) < 0.5).astype(float)
    # receivers contest the catch point; defenders trail it — otherwise
    # P(no defender arrives) saturates at 0 and the labels are uninformative
    dist_off = rng.uniform(0.5, 9.0, (n_plays, MAX_PLAYERS))
    dist_def = rng.uniform(9.0, 28.0, (n_plays, MAX_PLAYERS))
    dist = np.where(is_off > 0, dist_off, dist_def)
    valid = (np.arange(MAX_PLAYERS)[None, :] < n_real[:, None]).astype(float)
    tof = rng.uniform(0.8, 2.5, n_plays)
    y = _completion_prob(true, dist, tof, is_off, valid)
    assert 0.05 < y.mean() < 0.95  # labels are informative, not saturated

    rows = []
    for b in range(n_plays):
        for r in range(MAX_PLAYERS):
            rows.append(
                (
                    1,
                    b + 1,
                    r,
                    float(dist[b, r] * valid[b, r]),
                    float(tof[b]),
                    float(is_off[b, r] * valid[b, r]),
                    float(1.0 - valid[b, r]),
                    float(y[b]),
                )
            )
    ds = spark.createDataFrame(
        rows,
        "gameId long, playId long, row int, dist double, tof double, "
        "is_off double, is_pad double, completed double",
    )
    fit = fit_player_completion_params(ds, lr=0.02, n_iter=2000)
    assert fit.tti_sigma == pytest.approx(true[0], abs=0.03)
    assert fit.tti_lambda_off == pytest.approx(true[1], abs=0.08)
    assert fit.tti_lambda_def == pytest.approx(true[2], abs=0.08)
    assert fit.loss < 0.7


def test_fit_player_completion_deterministic(spark):
    """Same input -> bit-identical fit (fixed init, full batch, fixed
    iteration count — the reproducibility contract of the NumPy twin)."""
    from bigdatabowl_spark.kernels.tuning import fit_player_completion_params

    rows = [
        (1, p, r, float(2.0 + r % 5), 1.5, float(r % 2), 0.0, float(p % 2))
        for p in range(1, 9)
        for r in range(17)
    ]
    schema = (
        "gameId long, playId long, row int, dist double, tof double, "
        "is_off double, is_pad double, completed double"
    )
    a = fit_player_completion_params(spark.createDataFrame(rows, schema), n_iter=50)
    b = fit_player_completion_params(spark.createDataFrame(rows, schema), n_iter=50)
    assert (a.tti_sigma, a.tti_lambda_off, a.tti_lambda_def, a.loss) == (
        b.tti_sigma,
        b.tti_lambda_off,
        b.tti_lambda_def,
        b.loss,
    )
