"""Property-based kernel invariants (hypothesis).

SURVEY §5.2: the reference left its probability-mass asserts commented out
(play_eppa_cpu.py:338-339). Here they hold for ARBITRARY player
configurations, not one fixture: probabilities bounded, team catch mass
partitioned, trajectory-integrated mass ≤ 1, surfaces finite, and the
kernel pure (same input → bit-identical output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from bigdatabowl_spark.kernels.eppa import EppaPriors, frame_surfaces
from bigdatabowl_spark.kernels.params import EppaParams, N_CELLS, N_TOF

_PRIORS = EppaPriors.default()
_PARAMS = EppaParams()


@st.composite
def player_frames(draw):
    n_off = draw(st.integers(1, 6))
    n_def = draw(st.integers(1, 6))
    n = n_off + n_def
    xs = draw(st.lists(st.floats(1.0, 119.0), min_size=n, max_size=n))
    ys = draw(st.lists(st.floats(1.0, 52.0), min_size=n, max_size=n))
    vx = draw(st.lists(st.floats(-9.0, 9.0), min_size=n, max_size=n))
    vy = draw(st.lists(st.floats(-9.0, 9.0), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "nflId": np.arange(1, n + 1),
            "x": xs,
            "y": ys,
            "v_x": vx,
            "v_y": vy,
            "team_pos": ["OFF"] * n_off + ["DEF"] * n_def,
            "position": ["WR"] * n_off + ["CB"] * n_def,
        }
    )


@settings(max_examples=15, deadline=None)
@given(
    players=player_frames(),
    bx=st.floats(5.0, 115.0),
    by=st.floats(2.0, 51.0),
    fas=st.integers(14, 47),
)
def test_kernel_invariants(players, bx, by, fas):
    s = frame_surfaces(players, np.array([bx, by]), fas, _PARAMS, _PRIORS)

    for key in ("p_off", "p_def", "ppc_off", "ppc_def"):
        arr = s[key]
        assert arr.shape == (N_CELLS, N_TOF)
        assert np.isfinite(arr).all(), key
        assert (arr >= -1e-12).all() and (arr <= 1 + 1e-9).all(), key

    # partition invariant (the reference's commented assert): per-step team
    # catch probabilities split p_any, so integrated mass can't exceed 1
    assert (s["ppc_off"] + s["ppc_def"] <= 1 + 1e-9).all()

    # transition prior and posterior are distributions over (F, T)
    assert abs(s["trans_prior"].sum() - 1.0) < 1e-9
    assert abs(s["trans"].sum() - 1.0) < 1e-9
    assert (s["trans"] >= 0).all()

    # surfaces finite; expected points bounded by the EP curve range
    assert np.isfinite(s["eppa_ft"]).all()
    assert (s["xepa_comp"] <= 7.0 + 1e-9).all()
    assert (s["xepa_comp"] >= -2.0 - 1e-9).all()


@settings(max_examples=5, deadline=None)
@given(players=player_frames(), fas=st.integers(14, 47))
def test_kernel_pure(players, fas):
    a = frame_surfaces(players, np.array([35.0, 26.5]), fas, _PARAMS, _PRIORS)
    b = frame_surfaces(players, np.array([35.0, 26.5]), fas, _PARAMS, _PRIORS)
    np.testing.assert_array_equal(a["eppa_ft"], b["eppa_ft"])
    np.testing.assert_array_equal(a["trans"], b["trans"])
