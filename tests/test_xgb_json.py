"""Model-artifact pluggability: FlatForest <-> xgboost JSON (VERDICT r5
item 1). The reference loads version-pinned xgboost/treelite binaries
(play_eppa_cpu.py:80-87) trained at default depth (Rishav's xyac.ipynb ·
cells 5-11); these tests prove a real xgboost JSON artifact of ANY depth
drops into the kernel's scorer without touching kernel code."""

from __future__ import annotations

import numpy as np

from bigdatabowl_spark.kernels.ensemble import FlatForest, TreeEnsemble
from bigdatabowl_spark.kernels.xgb_json import (
    ensemble_to_xgb_json,
    forest_from_xgb_json,
    forest_to_xgb_json,
    load_xgb_json,
    save_xgb_json,
)

_FOREST_FIELDS = (
    "feat", "thr", "left", "right", "default_left", "leaf_val",
    "offsets", "depth", "tree_class", "epvals",
)


def _assert_forests_identical(a: FlatForest, b: FlatForest):
    for f in _FOREST_FIELDS:
        x, y = getattr(a, f), getattr(b, f)
        assert x.dtype == y.dtype and x.shape == y.shape, f
        assert (x == y).all(), f
    assert a.base_score == b.base_score


def test_depth2_roundtrip_byte_for_byte(tmp_path):
    """The legacy depth-2 artifact emitted in xgboost's schema reconstructs
    with identical node arrays and scores bit-identically."""
    ens = TreeEnsemble.default()
    path = str(tmp_path / "model.json")
    save_xgb_json(ens, path)
    back = load_xgb_json(path)
    _assert_forests_identical(ens.to_forest(), back)
    rng = np.random.default_rng(7)
    X = rng.standard_normal((500, 26))
    assert (ens.margins(X) == back.margins(X)).all()
    assert (ens.expectation(X) == back.expectation(X)).all()


def test_depth4_roundtrip_byte_for_byte(tmp_path):
    """A depth-4 forest — deeper than any hand path — survives
    save_model-JSON round trip with every array identical (VERDICT r5 #1
    'done' criterion)."""
    forest = FlatForest.default_deep(depth=4)
    assert int(forest.depth.max()) == 4
    path = str(tmp_path / "deep.json")
    save_xgb_json(forest, path)
    back = load_xgb_json(path)
    _assert_forests_identical(forest, back)
    rng = np.random.default_rng(13)
    X = rng.standard_normal((400, 26))
    assert (forest.expectation(X) == back.expectation(X)).all()


def _leaf(v):
    return float(v)


def _asymmetric_model() -> dict:
    """A handcrafted 'real' xgboost JSON model: 2 classes x 2 trees with
    ASYMMETRIC child splits, one depth-1 tree, one leaf-only tree —
    shapes a generic trained model actually produces."""
    def depth2(fa, ta, fL, tL, l0, l1, fR, tR, l2, l3):
        return {
            "left_children": [1, 3, 5, -1, -1, -1, -1],
            "right_children": [2, 4, 6, -1, -1, -1, -1],
            "parents": [2147483647, 0, 0, 1, 1, 2, 2],
            "split_indices": [fa, fL, fR, 0, 0, 0, 0],
            "split_conditions": [ta, tL, tR, _leaf(l0), _leaf(l1), _leaf(l2), _leaf(l3)],
            "default_left": [1] * 3 + [0] * 4,
        }

    def depth1(fa, ta, lv, rv):
        return {
            "left_children": [1, -1, -1],
            "right_children": [2, -1, -1],
            "parents": [2147483647, 0, 0],
            "split_indices": [fa, 0, 0],
            "split_conditions": [ta, _leaf(lv), _leaf(rv)],
            "default_left": [1, 0, 0],
        }

    def leaf_only(v):
        return {
            "left_children": [-1],
            "right_children": [-1],
            "parents": [2147483647],
            "split_indices": [0],
            "split_conditions": [_leaf(v)],
            "default_left": [0],
        }

    trees = [
        depth2(3, 0.1, 5, -0.2, 0.11, -0.07, 9, 0.4, 0.23, -0.19),
        depth2(0, -0.5, 2, 0.3, -0.31, 0.02, 2, 0.9, 0.05, -0.12),
        depth1(7, 0.25, 0.4, -0.4),
        leaf_only(0.125),
    ]
    return {
        "version": [1, 7, 6],
        "learner": {
            "learner_model_param": {"num_class": "2", "num_feature": "26"},
            "objective": {"name": "multi:softprob"},
            "gradient_booster": {
                "name": "gbtree",
                "model": {
                    "gbtree_model_param": {"num_trees": "4"},
                    "tree_info": [0, 1, 0, 1],
                    "trees": trees,
                },
            },
        },
    }


def _traverse(tree: dict, x: np.ndarray) -> float:
    """Reference single-row traversal of an xgboost JSON tree (NaN routes
    per default_left, like xgboost's missing-value handling)."""
    i = 0
    while tree["left_children"][i] != -1:
        f, t = tree["split_indices"][i], tree["split_conditions"][i]
        if np.isnan(x[f]):
            go_left = bool(tree["default_left"][i])
        else:
            go_left = x[f] < t
        i = tree["left_children"][i] if go_left else tree["right_children"][i]
    return tree["split_conditions"][i]


def _margins_by_traversal(doc: dict, X: np.ndarray) -> np.ndarray:
    trees = doc["learner"]["gradient_booster"]["model"]["trees"]
    info = doc["learner"]["gradient_booster"]["model"]["tree_info"]
    n_class = int(doc["learner"]["learner_model_param"]["num_class"])
    base = float(doc["learner"].get("learner_model_param", {}).get("base_score", 0))
    want = np.full((len(X), n_class), base)
    for i in range(len(X)):
        for tree, cls in zip(trees, info):
            want[i, cls] += _traverse(tree, X[i])
    return want


def test_asymmetric_model_scores_like_direct_traversal():
    doc = _asymmetric_model()
    forest = forest_from_xgb_json(doc)
    rng = np.random.default_rng(11)
    X = rng.standard_normal((200, 26))
    got = forest.margins(X)
    want = _margins_by_traversal(doc, X)
    assert got.shape == want.shape
    assert (got == want).all()  # bit-exact: same adds in the same order


def test_deeper_trees_score_like_direct_traversal():
    """Depth-3 graft (the case the pre-r6 loader REJECTED) plus unbalanced
    branches now score bit-identically to traversal."""
    doc = _asymmetric_model()
    t = doc["learner"]["gradient_booster"]["model"]["trees"][0]
    # graft a third level under node 3 of the first tree
    t["left_children"] = [1, 3, 5, 7, -1, -1, -1, -1, -1]
    t["right_children"] = [2, 4, 6, 8, -1, -1, -1, -1, -1]
    t["parents"] = [2147483647, 0, 0, 1, 1, 2, 2, 3, 3]
    t["split_indices"] = [3, 5, 9, 12, 0, 0, 0, 0, 0]
    t["split_conditions"] = [0.1, -0.2, 0.4, 0.7, -0.07, 0.23, -0.19, 0.31, -0.44]
    t["default_left"] = [1, 0, 1, 0, 0, 0, 0, 0, 0]
    forest = forest_from_xgb_json(doc)
    assert int(forest.depth.max()) == 3
    rng = np.random.default_rng(17)
    X = rng.standard_normal((300, 26))
    assert (forest.margins(X) == _margins_by_traversal(doc, X)).all()
    # and the emitted schema is self-consistent: save -> load is identical
    _assert_forests_identical(forest, forest_from_xgb_json(forest_to_xgb_json(forest)))


def test_nan_routes_per_default_left():
    """Missing features route per node default_left, not through < thr
    (ADVICE r5: NaN would otherwise always go right)."""
    doc = _asymmetric_model()
    forest = forest_from_xgb_json(doc)
    rng = np.random.default_rng(23)
    X = rng.standard_normal((120, 26))
    X[X < -0.8] = np.nan  # scatter NaNs over split features
    assert np.isnan(X).any()
    assert (forest.margins(X) == _margins_by_traversal(doc, X)).all()


def test_base_score_is_margin_offset():
    """learner base_score shifts every class margin (softprob-invariant)
    — ADVICE r5: previously ignored."""
    doc = _asymmetric_model()
    doc["learner"]["learner_model_param"]["base_score"] = "0.5"
    forest = forest_from_xgb_json(doc)
    assert forest.base_score == 0.5
    rng = np.random.default_rng(29)
    X = rng.standard_normal((50, 26))
    assert (forest.margins(X) == _margins_by_traversal(doc, X)).all()
    doc["learner"]["learner_model_param"]["base_score"] = "0"
    flat = forest_from_xgb_json(doc)
    assert np.allclose(forest.margins(X), flat.margins(X) + 0.5)
    assert (forest.softprob(X) == flat.softprob(X)).all() or np.allclose(
        forest.softprob(X), flat.softprob(X)
    )


def test_roundtrip_through_emitted_schema_matches_traversal():
    """to_json -> traversal of the EMITTED document agrees with the source
    depth-2 ensemble (schema is self-consistent, not just invertible)."""
    ens = TreeEnsemble.default()
    doc = ensemble_to_xgb_json(ens)
    rng = np.random.default_rng(3)
    X = rng.standard_normal((100, 26))
    assert (ens.margins(X) == _margins_by_traversal(doc, X)).all()


def test_depth6_default_depth_roundtrip(tmp_path):
    """Depth-6 — xgboost's actual default, the depth the reference's value
    models train at (Rishav's xyac.ipynb · cells 5-11) — loads, round-trips
    byte-for-byte, and scores bit-identically after reload."""
    forest = FlatForest.default_deep(depth=6, trees_per_class=1)
    assert int(forest.depth.max()) == 6
    path = str(tmp_path / "deep6.json")
    save_xgb_json(forest, path)
    back = load_xgb_json(path)
    _assert_forests_identical(forest, back)
    rng = np.random.default_rng(31)
    X = rng.standard_normal((300, 26))
    assert (forest.expectation(X) == back.expectation(X)).all()


def test_unsupported_layouts_raise():
    """Categorical splits, vector leaves, and non-tree boosters fail loudly
    instead of silently mis-scoring."""
    import copy

    import pytest as _pytest

    base = _asymmetric_model()

    cat = copy.deepcopy(base)
    t0 = cat["learner"]["gradient_booster"]["model"]["trees"][0]
    t0["split_type"] = [1] + [0] * 6
    with _pytest.raises(ValueError, match="categorical"):
        forest_from_xgb_json(cat)

    vec = copy.deepcopy(base)
    v0 = vec["learner"]["gradient_booster"]["model"]["trees"][0]
    v0["tree_param"] = {"size_leaf_vector": "8"}
    with _pytest.raises(ValueError, match="vector leaves"):
        forest_from_xgb_json(vec)

    lin = copy.deepcopy(base)
    lin["learner"]["gradient_booster"]["name"] = "gblinear"
    with _pytest.raises(ValueError, match="booster"):
        forest_from_xgb_json(lin)


def test_verbatim_xgboost2_binary_document_loads_and_scores():
    """A document with EXACTLY the field set a real `xgboost>=2.0`
    `Booster.save_model('*.json')` writes for a binary-logistic model —
    JSON booleans in default_left, scientific-notation base_score string,
    num_class "0", iteration_indptr, populated feature_names/types,
    non-zero base_weights/loss_changes/sum_hessian, 2147483647 parent
    sentinels — loads without touching kernel code and margins match
    single-row traversal of the printed trees PLUS the objective's
    prob-to-margin link on base_score (binary:logistic stores base_score
    in probability space; real output_margin=True adds logit(0.5) = 0,
    NOT 0.5 — ADVICE r6 medium), including NaN routing per default_left.
    Guards against the loader silently depending on OUR emitter's field
    subset rather than xgboost's."""
    doc = {
        "learner": {
            "attributes": {
                "best_iteration": "1",
                "best_score": "0.23",
                "scikit_learn": '{"_estimator_type": "classifier"}',
            },
            "feature_names": ["f0", "f1", "f2"],
            "feature_types": ["float", "float", "int"],
            "gradient_booster": {
                "model": {
                    "gbtree_model_param": {
                        "num_parallel_tree": "1",
                        "num_trees": "2",
                    },
                    "iteration_indptr": [0, 1, 2],
                    "tree_info": [0, 0],
                    "trees": [
                        {
                            # depth-2 asymmetric: node 1 is internal, node 2 a leaf
                            "base_weights": [0.1, -0.2, 0.3, 0.4, -0.5],
                            "categories": [],
                            "categories_nodes": [],
                            "categories_segments": [],
                            "categories_sizes": [],
                            "default_left": [True, False, False, False, False],
                            "id": 0,
                            "left_children": [1, 3, -1, -1, -1],
                            "loss_changes": [12.5, 3.25, 0.0, 0.0, 0.0],
                            "parents": [2147483647, 0, 0, 1, 1],
                            "right_children": [2, 4, -1, -1, -1],
                            "split_conditions": [0.5, -1.25, 0.7, 0.4, -0.5],
                            "split_indices": [0, 2, 0, 0, 0],
                            "split_type": [0, 0, 0, 0, 0],
                            "sum_hessian": [40.0, 22.0, 18.0, 12.0, 10.0],
                            "tree_param": {
                                "num_deleted": "0",
                                "num_feature": "3",
                                "num_nodes": "5",
                                "size_leaf_vector": "1",
                            },
                        },
                        {
                            "base_weights": [0.0, 0.2, -0.1],
                            "categories": [],
                            "categories_nodes": [],
                            "categories_segments": [],
                            "categories_sizes": [],
                            "default_left": [False, False, False],
                            "id": 1,
                            "left_children": [1, -1, -1],
                            "loss_changes": [5.0, 0.0, 0.0],
                            "parents": [2147483647, 0, 0],
                            "right_children": [2, -1, -1],
                            "split_conditions": [2.0, 0.25, -0.125],
                            "split_indices": [1, 0, 0],
                            "split_type": [0, 0, 0],
                            "sum_hessian": [40.0, 25.0, 15.0],
                            "tree_param": {
                                "num_deleted": "0",
                                "num_feature": "3",
                                "num_nodes": "3",
                                "size_leaf_vector": "1",
                            },
                        },
                    ],
                },
                "name": "gbtree",
            },
            "learner_model_param": {
                "base_score": "5E-1",
                "boost_from_average": "1",
                "num_class": "0",
                "num_feature": "3",
                "num_target": "1",
            },
            "objective": {
                "name": "binary:logistic",
                "reg_loss_param": {"scale_pos_weight": "1"},
            },
        },
        "version": [2, 0, 3],
    }
    forest = forest_from_xgb_json(doc)
    assert forest.n_trees == 2 and forest.n_classes == 1
    # binary:logistic: saved base_score 5E-1 is a PROBABILITY; the margin
    # offset is logit(0.5) = 0 (xgboost ObjFunction::ProbToMargin)
    assert forest.base_score == 0.0

    X = np.array(
        [
            [0.4, 1.0, -2.0],   # t0: left then f2<-1.25 → left leaf 0.4; t1: f1<2 → 0.25
            [0.6, 3.0, 0.0],    # t0: right leaf 0.7;                t1: right → -0.125
            [np.nan, 1.0, 0.0], # t0 root: NaN + default_left=True → left, f2=0<-1.25? no → leaf -0.5
            [0.4, np.nan, -2.0],# t1 root: NaN + default_left=False → right → -0.125
        ]
    )
    got = forest.margins(X)[:, 0]
    want = np.array(
        [0.4 + 0.25,
         0.7 + (-0.125),
         (-0.5) + 0.25,
         0.4 + (-0.125)]
    )
    assert np.array_equal(got, want)

    # a non-symmetric probability exercises the logit link with a non-zero
    # offset: logit(0.2) = log(0.25)
    import copy as _copy
    import math as _math

    skewed = _copy.deepcopy(doc)
    skewed["learner"]["learner_model_param"]["base_score"] = "2E-1"
    assert forest_from_xgb_json(skewed).base_score == _math.log(0.2 / 0.8)

    # load → save → load preserves the node arrays verbatim
    _assert_forests_identical(forest, forest_from_xgb_json(forest_to_xgb_json(forest)))


def _chain_tree(feats, thrs, leaves, default_left=0):
    """A depth-len(feats) 'comb': internal node i routes left to internal
    node i+1 (last one to a leaf), right to its own leaf — the asymmetric
    deep chains real depth-6 trained trees actually contain."""
    d = len(feats)
    n = 2 * d + 1
    lc = [i + 1 if i < d else -1 for i in range(n)]
    rc = [d + 1 + i if i < d else -1 for i in range(n)]
    si = list(feats) + [0] * (d + 1)
    sc = list(thrs) + [float(v) for v in leaves]  # leaves[0] = deepest-left
    # reorder leaves: positions d..2d are (deepest-left, right-of-0..d-1)
    parents = [2147483647] + [i for i in range(d)] + list(range(d))
    return {
        "base_weights": [round(0.01 * i - 0.03, 3) for i in range(n)],
        "categories": [],
        "categories_nodes": [],
        "categories_segments": [],
        "categories_sizes": [],
        "default_left": [bool((default_left + i) % 2) for i in range(d)]
        + [False] * (d + 1),
        "id": 0,
        "left_children": lc,
        "loss_changes": [float(max(d - i, 0)) for i in range(n)],
        "parents": parents,
        "right_children": rc,
        "split_conditions": sc,
        "split_indices": si,
        "split_type": [0] * n,
        "sum_hessian": [float(n - i) for i in range(n)],
        "tree_param": {
            "num_deleted": "0",
            "num_feature": "26",
            "num_nodes": str(n),
            "size_leaf_vector": "1",
        },
    }


def test_verbatim_xgboost2_softprob_depth6_document_loads_and_scores():
    """The reference's actual model class — multi:softprob at xgboost's
    default depth 6 (Rishav's xyac.ipynb · cells 5-11) — with the exact
    field set a real `xgboost>=2` save_model writes (iteration_indptr,
    softmax_multiclass_param, default base_score "5E-1"). softprob's
    ProbToMargin is identity, so base_score 0.5 IS the uniform margin
    offset (softmax-invariant), unlike the binary:logistic doc above."""
    trees = [
        _chain_tree(
            feats=[3, 11, 7, 0, 19, 25],
            thrs=[0.5, -0.25, 1.5, 0.0, -1.0, 2.25],
            leaves=[0.31, -0.11, 0.07, -0.22, 0.15, 0.4, -0.05],
            default_left=c,
        )
        for c in range(3)
    ] + [
        _chain_tree(
            feats=[1, 2, 3, 4, 5, 6],
            thrs=[-0.5, 0.25, -1.5, 0.75, 1.0, -2.0],
            leaves=[-0.09, 0.18, -0.27, 0.36, -0.45, 0.54, -0.63],
            default_left=c + 1,
        )
        for c in range(3)
    ]
    doc = {
        "learner": {
            "attributes": {},
            "feature_names": [f"f{i}" for i in range(26)],
            "feature_types": ["float"] * 26,
            "gradient_booster": {
                "model": {
                    "gbtree_model_param": {
                        "num_parallel_tree": "1",
                        "num_trees": "6",
                    },
                    "iteration_indptr": [0, 3, 6],
                    "tree_info": [0, 1, 2, 0, 1, 2],
                    "trees": trees,
                },
                "name": "gbtree",
            },
            "learner_model_param": {
                "base_score": "5E-1",
                "boost_from_average": "1",
                "num_class": "3",
                "num_feature": "26",
                "num_target": "1",
            },
            "objective": {
                "name": "multi:softprob",
                "softmax_multiclass_param": {"num_class": "3"},
            },
        },
        "version": [2, 0, 3],
    }
    forest = forest_from_xgb_json(doc)
    assert forest.n_trees == 6 and forest.n_classes == 3
    assert int(forest.depth.max()) == 6
    assert forest.base_score == 0.5  # identity link for softprob

    rng = np.random.default_rng(41)
    X = rng.standard_normal((250, 26))
    X[X > 1.7] = np.nan  # exercise default_left on the deep chains
    assert np.isnan(X).any()
    assert (forest.margins(X) == _margins_by_traversal(doc, X)).all()

    # load → save → load preserves the node arrays verbatim
    _assert_forests_identical(forest, forest_from_xgb_json(forest_to_xgb_json(forest)))


def test_dart_document_unwraps_nesting_and_scales_by_weight_drop():
    """A real dart save_model nests the tree model under
    gradient_booster.model.gbtree and carries per-tree weight_drop; leaf
    outputs are scaled by weight_drop[t] at predict time (ADVICE r6: the
    flat layout would KeyError and unweighted sums would mis-score)."""
    inner = _asymmetric_model()["learner"]["gradient_booster"]["model"]
    drops = [0.7, 1.0, 0.4, 0.25]
    doc = {
        "version": [2, 0, 3],
        "learner": {
            "learner_model_param": {"num_class": "2", "num_feature": "26"},
            "objective": {"name": "multi:softprob"},
            "gradient_booster": {
                "name": "dart",
                "model": {
                    "gbtree": inner,
                    "weight_drop": [str(w) for w in drops],
                },
            },
        },
    }
    forest = forest_from_xgb_json(doc)
    rng = np.random.default_rng(43)
    X = rng.standard_normal((150, 26))
    X[X < -1.6] = np.nan

    trees = inner["trees"]
    info = inner["tree_info"]
    want = np.zeros((len(X), 2))
    for i in range(len(X)):
        for w, tree, cls in zip(drops, trees, info):
            want[i, cls] += w * _traverse(tree, X[i])
    assert np.allclose(forest.margins(X), want, rtol=0, atol=0)

    # dart re-serializes as an equivalent plain-gbtree doc (weights folded)
    folded = forest_from_xgb_json(forest_to_xgb_json(forest))
    assert (folded.margins(X[:20]) == forest.margins(X[:20])).all()


def test_base_score_links_log_and_unknown():
    """Poisson/gamma/tweedie use a log link; unknown objectives raise
    instead of silently guessing identity."""
    import copy
    import math

    doc = _asymmetric_model()
    doc["learner"]["learner_model_param"]["num_class"] = "1"
    doc["learner"]["gradient_booster"]["model"]["tree_info"] = [0, 0, 0, 0]
    doc["learner"]["learner_model_param"]["base_score"] = "2.5"
    for obj in ("count:poisson", "reg:gamma", "reg:tweedie"):
        d = copy.deepcopy(doc)
        d["learner"]["objective"] = {"name": obj}
        assert forest_from_xgb_json(d).base_score == math.log(2.5)

    bad = copy.deepcopy(doc)
    bad["learner"]["objective"] = {"name": "survival:cox"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown objective"):
        forest_from_xgb_json(bad)

    # out-of-domain probability for a logistic objective fails loudly
    neg = copy.deepcopy(doc)
    neg["learner"]["objective"] = {"name": "binary:logistic"}
    neg["learner"]["learner_model_param"]["base_score"] = "1.5"
    with _pytest.raises(ValueError, match="outside"):
        forest_from_xgb_json(neg)


def test_logitraw_base_score_uses_logit_link():
    """binary:logitraw's base_score link is LOGIT, not identity (ADVICE r7):
    xgboost's LogisticRaw overrides PredTransform/gradients but inherits
    LogisticRegression::ProbToMargin (src/objective/regression_loss.h), so
    the saved base_score is a probability in (0,1) whose margin offset is
    logit(p). The two links coincide only at the default 0.5 (logit = 0)."""
    import copy
    import math

    import pytest as _pytest

    doc = _asymmetric_model()
    doc["learner"]["learner_model_param"]["num_class"] = "1"
    doc["learner"]["gradient_booster"]["model"]["tree_info"] = [0, 0, 0, 0]
    doc["learner"]["objective"] = {"name": "binary:logitraw"}

    # default base_score: logit(0.5) = 0 — identical to identity, which is
    # why the old (wrong) identity classification never mis-scored fixtures
    doc["learner"]["learner_model_param"]["base_score"] = "5E-1"
    assert forest_from_xgb_json(doc).base_score == 0.0

    # non-default: logit(0.7), NOT 0.7
    skewed = copy.deepcopy(doc)
    skewed["learner"]["learner_model_param"]["base_score"] = "0.7"
    assert forest_from_xgb_json(skewed).base_score == math.log(0.7 / (1 - 0.7))

    # the inherited ProbToMargin CHECK requires (0,1) even though logitraw
    # predictions themselves are unbounded margins
    bad = copy.deepcopy(doc)
    bad["learner"]["learner_model_param"]["base_score"] = "1.5"
    with _pytest.raises(ValueError, match="outside"):
        forest_from_xgb_json(bad)


def test_random_dart_forests_agree_across_four_paths(spark, sf_dir, tmp_path):
    """Generalizes m1e_dart_forest_score from one pinned document to
    RANDOM dart forests: jittered thresholds/leaves + random drop weights,
    serialized to a dart doc, loaded (weights folded into leaves), staged,
    then scored over an orders slice by all three Spark inference paths
    (relational join walk, vectorized NumPy UDF, compiled nested-CASE) and
    the DuckDB node walk — all four must agree row-for-row. Weight
    exactness is a non-issue by construction: folding happens ONCE at
    load, every path reads the same staged leaf bytes."""
    import duckdb

    from bigdatabowl_spark.plans.round6 import (
        _compiled_score,
        _m1b_oracle,
        _udf_score,
        _walk_score,
        scaled_forest,
    )
    from bigdatabowl_spark.sources.artifacts import save_forest

    where = "o_orderkey % 20 = 0"
    for seed in (3, 9, 27):
        rng = np.random.default_rng(seed)
        base = scaled_forest()
        trees = []
        for t in range(base.n_trees):
            nodes = base.tree_nodes(t)
            lc = nodes["left_children"]
            sc = list(nodes["split_conditions"])
            for i in range(len(lc)):
                if lc[i] != -1:
                    sc[i] = float(sc[i]) * float(rng.uniform(0.8, 1.2))
                else:
                    sc[i] = float(sc[i]) + float(rng.uniform(-1.0, 1.0))
            nodes["split_conditions"] = sc
            trees.append(nodes)
        f = FlatForest.from_node_arrays(
            trees, [int(c) for c in base.tree_class], base.epvals.copy()
        )
        doc = forest_to_xgb_json(f)
        booster = doc["learner"]["gradient_booster"]
        doc["learner"]["gradient_booster"] = {
            "name": "dart",
            "model": {
                "gbtree": booster["model"],
                "weight_drop": [
                    float(rng.uniform(0.25, 1.5)) for _ in range(f.n_trees)
                ],
            },
        }
        loaded = forest_from_xgb_json(doc)
        stage = str(tmp_path / f"stage_{seed}")
        save_forest(spark, loaded, stage)

        spark_sides = [
            sorted(tuple(r) for r in path(spark, sf_dir, stage, where).collect())
            for path in (_walk_score, _udf_score, _compiled_score)
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
        )
        oracle = sorted(
            tuple(r)
            for r in con.execute(
                _m1b_oracle(stage=stage, where=f"WHERE {where}")
            ).fetchall()
        )
        con.close()
        assert len(oracle) > 0
        assert spark_sides[0] == spark_sides[1] == spark_sides[2] == oracle, seed
