"""Per-step wall profile of the EPPA frame kernel (pure NumPy, no Spark).

Times each numbered step of kernels/eppa.frame_surfaces by replaying the
same operations on the same workspace, then cross-checks that one real
frame_surfaces call costs about the sum of the steps. Run on an idle box;
used in round 12 to decide which kernel stage to optimize (step 8's
path-index computation turned out to be ball-position-invariant).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from bigdatabowl_spark.kernels import eppa as E
from bigdatabowl_spark.kernels.params import (
    DT,
    FIELD_X,
    FIELD_Y,
    N_CELLS,
    N_TOF,
    EppaParams,
    field_grid,
    tof_values,
)


def make_players(J: int = 20, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "x": rng.uniform(10, 50, J),
            "y": rng.uniform(2, 50, J),
            "v_x": rng.uniform(-5, 5, J),
            "v_y": rng.uniform(-3, 3, J),
            "team_pos": ["OFF", "DEF"] * (J // 2),
            "nflId": np.arange(100, 100 + J),
            "position": ["WR", "CB"] * (J // 2),
        }
    )


def timeit(fn, n: int = 10) -> float:
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000.0


def main() -> None:
    players = make_players()
    ball = np.array([30.0, 26.5])
    params = EppaParams()
    priors = E.EppaPriors.default()
    grid = field_grid()
    tof = tof_values()
    px = players[["x", "y"]].to_numpy(np.float64)
    pv = players[["v_x", "v_y"]].to_numpy(np.float64)
    is_off = (players["team_pos"] == "OFF").to_numpy()
    J = len(players)
    F_, T = N_CELLS, N_TOF
    chunk = 330
    _ws = E._ws

    for _ in range(3):
        E.frame_surfaces(players, ball, 15, params, priors)

    t_full = timeit(lambda: E.frame_surfaces(players, ball, 15, params, priors), n=5)

    t_pif = timeit(
        lambda: E.player_intercept_field(px, pv, grid, tof, params, reuse=True)
    )
    d_mag, p_int = E.player_intercept_field(px, pv, grid, tof, params, reuse=True)

    idx_off = np.flatnonzero(is_off)
    idx_def = np.flatnonzero(~is_off)
    team_mask = np.zeros((J, 2))
    team_mask[idx_off, 0] = 1.0
    team_mask[idx_def, 1] = 1.0

    def step6():
        team_sums = _ws("fs.team_sums", (F_ * T, 2))
        raw_sums = _ws("fs.raw_sums", (F_ * T, 2))
        with np.errstate(divide="ignore"):
            for lo in range(0, F_, chunk):
                hi = min(lo + chunk, F_)
                np.matmul(
                    p_int[lo:hi].reshape((hi - lo) * T, J),
                    team_mask,
                    out=raw_sums[lo * T : hi * T],
                )
                lc = _ws("fs.log_chunk", (hi - lo, T, J))
                np.minimum(p_int[lo:hi], 1.0 - 1e-12, out=lc)
                np.maximum(lc, 0.0, out=lc)
                np.negative(lc, out=lc)
                np.log1p(lc, out=lc)
                np.matmul(
                    lc.reshape((hi - lo) * T, J),
                    team_mask,
                    out=team_sums[lo * T : hi * T],
                )

    t6 = timeit(step6)

    # team exp/partition block (between step 6's loop and step 7)
    def step6b():
        team_sums = _ws("fs.team_sums", (F_ * T, 2))
        p_off = _ws("fs.p_off", (F_, T))
        po = p_off.reshape(-1)
        np.exp(team_sums[:, 0], out=po)
        np.subtract(1.0, po, out=po)
        p_def = _ws("fs.p_def", (F_, T))
        pd_ = p_def.reshape(-1)
        np.exp(team_sums[:, 1], out=pd_)
        np.subtract(1.0, pd_, out=pd_)
        p_any = _ws("fs.p_any", (F_, T))
        pa = p_any.reshape(-1)
        np.add(team_sums[:, 0], team_sums[:, 1], out=pa)
        np.exp(pa, out=pa)
        np.subtract(1.0, pa, out=pa)
        denom = _ws("fs.denom", (F_, T))
        np.add(p_off, p_def, out=denom)
        denom += 1e-12
        p_off_part = _ws("fs.p_off_part", (F_, T))
        np.multiply(p_any, p_off, out=p_off_part)
        p_off_part /= denom
        p_def_part = _ws("fs.p_def_part", (F_, T))
        np.multiply(p_any, p_def, out=p_def_part)
        p_def_part /= denom

    t6b = timeit(step6b)

    def step7():
        L = np.sqrt(((grid - ball[None, :]) ** 2).sum(-1))
        Lbin = np.clip(np.rint(L).astype(np.int64), 1, 60) - 1
        mask = (L > 1.0) & (L <= 60.0)
        h = _ws("fs.h", (F_, T))
        np.take(priors.T_given_L, Lbin, axis=0, out=h, mode="clip")
        h *= priors.p_t[14]
        h *= mask[:, None]
        h_sum = h.sum()
        trans_prior = _ws("fs.trans_prior", (F_, T))
        if h_sum > 0:
            np.divide(h, h_sum, out=trans_prior)

    t7 = timeit(step7)

    frac, zv = E._traj_constants(params)
    steps = np.arange(N_TOF, dtype=np.int32)[None, :, None]
    p_off_part = _ws("fs.p_off_part", (F_, T))
    p_def_part = _ws("fs.p_def_part", (F_, T))

    def step8(cold=False):
        # the real kernel step-8 (compact since r12 opt round 1): cold=True
        # clears the ball-path cache so index construction is included
        if cold:
            E._PATH_CACHE.clear()
        E._ppc_surfaces(p_off_part, p_def_part, ball, params, chunk)

    t8 = timeit(lambda: step8(cold=True))
    t8_gather = timeit(step8)  # warm: path indices from _PATH_CACHE
    t8_idx = max(t8 - t8_gather, 0.0)

    trans_prior = _ws("fs.trans_prior", (F_, T))
    ppc_off = _ws("fs.ppc_off", (F_, T))

    def step10_11():
        trans = _ws("fs.trans", (F_, T))
        np.clip(ppc_off, 1e-12, None, out=trans)
        np.power(trans, params.alpha, out=trans)
        trans *= trans_prior
        t_sum = trans.sum()
        if t_sum > 0:
            trans /= t_sum

    t10 = timeit(step10_11)

    def step12():
        weight = _ws("fs.tmp_ft", (F_, T))
        raw_sums = _ws("fs.raw_sums", (F_ * T, 2))
        eppa_ft = _ws("fs.eppa_ft", (F_, T))
        np.divide(eppa_ft.reshape(-1), raw_sums[:, 0] + 1e-12, out=weight.reshape(-1))
        np.matmul(weight.reshape(1, F_ * T), p_int.reshape(F_ * T, J))

    t12 = timeit(step12)

    def copies():
        for name in (
            "fs.p_off", "fs.p_def", "fs.ppc_off", "fs.ppc_def",
            "fs.trans_prior", "fs.trans", "fs.value_ft", "fs.eppa_ft",
        ):
            _ws(name, (F_, T)).copy()

    t_cp = timeit(copies)

    print(f"frame_surfaces full      : {t_full:7.1f} ms")
    print(f"  steps 1-5 (p_int)      : {t_pif:7.1f} ms")
    print(f"  step 6 (log1p+dgemm)   : {t6:7.1f} ms")
    print(f"  step 6b (exp/partition): {t6b:7.1f} ms")
    print(f"  step 7 (trans prior)   : {t7:7.1f} ms")
    print(f"  step 8 cold (build idx): {t8:7.1f} ms")
    print(f"    index computation    : {t8_idx:7.1f} ms (cold - warm)")
    print(f"  step 8 warm (cache hit): {t8_gather:7.1f} ms")
    print(f"  step 10 (power/trans)  : {t10:7.1f} ms")
    print(f"  step 12 (attribution)  : {t12:7.1f} ms")
    print(f"  result copies          : {t_cp:7.1f} ms")
    accounted = t_pif + t6 + t6b + t7 + t8_gather + t10 + t12 + t_cp
    print(f"  accounted (warm step 8): {accounted:7.1f} ms "
          f"({100 * accounted / t_full:.0f}% of full)")


if __name__ == "__main__":
    main()
