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


# ---------------------------------------------------------------------------
# FlatForest property fuzz: arbitrary tree shapes score like a per-row walk
# ---------------------------------------------------------------------------


@st.composite
def random_tree(draw, n_features: int):
    """A random binary tree in xgboost's node layout (root 0, children at
    later indices, -1 leaf markers, leaf value riding split_conditions)."""
    lc, rc, si, sc, dl = [], [], [], [], []

    def add_node(depth_left: int) -> int:
        i = len(lc)
        lc.append(-2)  # placeholders patched below (list must grow first)
        rc.append(-2)
        si.append(0)
        sc.append(0.0)
        dl.append(0)
        is_leaf = depth_left == 0 or draw(st.booleans())
        if is_leaf:
            lc[i] = rc[i] = -1
            sc[i] = draw(st.floats(-2.0, 2.0, allow_nan=False))
        else:
            si[i] = draw(st.integers(0, n_features - 1))
            sc[i] = draw(st.floats(-1.5, 1.5, allow_nan=False))
            dl[i] = int(draw(st.booleans()))
            lc[i] = add_node(depth_left - 1)
            rc[i] = add_node(depth_left - 1)
        return i

    add_node(draw(st.integers(0, 4)))
    return {
        "left_children": lc,
        "right_children": rc,
        "split_indices": si,
        "split_conditions": sc,
        "default_left": dl,
    }


@st.composite
def random_forest_and_X(draw):
    from bigdatabowl_spark.kernels.ensemble import FlatForest

    n_features = draw(st.integers(1, 5))
    n_class = draw(st.integers(1, 4))
    n_trees = draw(st.integers(1, 5))
    trees = [draw(random_tree(n_features)) for _ in range(n_trees)]
    info = [draw(st.integers(0, n_class - 1)) for _ in range(n_trees)]
    # every class needs >=1 tree? margins only touches classes present; the
    # epvals length fixes C regardless, so uncovered classes just carry
    # base_score — fine.
    base_score = draw(st.floats(-1.0, 1.0, allow_nan=False))
    forest = FlatForest.from_node_arrays(
        trees,
        info,
        np.arange(n_class, dtype=np.float64),
        base_score=base_score,
    )
    n_rows = draw(st.integers(1, 8))
    X = np.array(
        [
            [
                draw(
                    st.one_of(
                        st.floats(-3.0, 3.0, allow_nan=False), st.just(np.nan)
                    )
                )
                for _ in range(n_features)
            ]
            for _ in range(n_rows)
        ],
        dtype=np.float64,
    )
    return forest, trees, info, base_score, X


def _walk_row(tree: dict, x: np.ndarray) -> float:
    """Per-row pure-Python reference traversal (xgboost semantics)."""
    i = 0
    while tree["left_children"][i] != -1:
        v = x[tree["split_indices"][i]]
        if np.isnan(v):
            go_left = bool(tree["default_left"][i])
        else:
            go_left = v < tree["split_conditions"][i]
        i = tree["left_children"][i] if go_left else tree["right_children"][i]
    return tree["split_conditions"][i]


@settings(max_examples=60, deadline=None)
@given(data=random_forest_and_X())
def test_forest_margins_match_per_row_walk(data):
    """Vectorized depth-many gather scoring == naive per-row traversal for
    ARBITRARY tree shapes (ragged, leaf-only, NaN features, any
    default_left pattern) — and the xgboost-JSON codec round-trips the
    structure byte-for-byte."""
    from bigdatabowl_spark.kernels.xgb_json import (
        forest_from_xgb_json,
        forest_to_xgb_json,
    )

    forest, trees, info, base_score, X = data
    got = forest.margins(X)
    n_class = forest.n_classes
    want = np.full((len(X), n_class), base_score, dtype=np.float64)
    for t, (tree, c) in enumerate(zip(trees, info)):
        for r in range(len(X)):
            want[r, c] += _walk_row(tree, X[r])
    assert np.array_equal(got, want)

    back = forest_from_xgb_json(forest_to_xgb_json(forest))
    for f in (
        "feat", "thr", "left", "right", "default_left", "leaf_val",
        "offsets", "depth", "tree_class",
    ):
        assert (getattr(forest, f) == getattr(back, f)).all(), f
    assert back.base_score == forest.base_score


@settings(max_examples=40, deadline=None)
@given(data=random_forest_and_X(), drops=st.lists(st.floats(0.0, 1.5, allow_nan=False), min_size=0, max_size=8))
def test_dart_document_scores_like_weighted_walk(data, drops):
    """A dart save_model layout (gradient_booster.model.gbtree nesting +
    per-tree weight_drop) over ARBITRARY hypothesis-generated tree shapes
    loads and scores like the per-row walk with each tree's leaf scaled by
    its drop weight (missing weights default to 1.0 — xgboost pads) —
    fuzzing the r7 dart path the fixed fixture can't enumerate."""
    from bigdatabowl_spark.kernels.xgb_json import forest_from_xgb_json

    forest, trees, info, base_score, X = data
    n_class = forest.n_classes
    doc = {
        "version": [2, 0, 3],
        "learner": {
            "learner_model_param": {
                "num_class": str(n_class),
                "base_score": repr(base_score),
            },
            "objective": {"name": "multi:softprob"},
            "gradient_booster": {
                "name": "dart",
                "model": {
                    "gbtree": {
                        "gbtree_model_param": {"num_trees": str(len(trees))},
                        "tree_info": list(info),
                        "trees": trees,
                    },
                    "weight_drop": [repr(w) for w in drops],
                },
            },
        },
    }
    dart = forest_from_xgb_json(doc)
    got = dart.margins(X)
    want = np.full((len(X), n_class), base_score, dtype=np.float64)
    for t, (tree, c) in enumerate(zip(trees, info)):
        w = drops[t] if t < len(drops) else 1.0
        for r in range(len(X)):
            want[r, c] += w * _walk_row(tree, X[r])
    assert np.allclose(got, want, rtol=0, atol=1e-12)
