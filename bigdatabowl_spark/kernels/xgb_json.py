"""XGBoost JSON-model codec for the kernel's TreeEnsemble.

The reference version-pins compiled xgboost/treelite binaries and loads
them at startup (play_eppa_cpu.py:80-87). xgboost itself is not installed
in this environment, so the kernel scores through the NumPy TreeEnsemble —
this module proves the ARTIFACT pluggability: the stand-in ensemble is
emitted in xgboost's native ``save_model(...json)`` schema (learner /
gradient_booster / model / trees with flat node arrays, leaf values held in
``split_conditions`` at leaf positions, per-tree class ids in
``tree_info``), and the loader reconstructs a TreeEnsemble from ANY
depth-<=2 multiclass xgboost JSON model:

- a tree whose left and right children split on the same (feature,
  threshold) maps to one TreeEnsemble row (byte-for-byte round trip for
  our own artifacts);
- a tree with ASYMMETRIC child splits — the general real-model case —
  decomposes into two TreeEnsemble rows (left-branch leaves with the
  right side zeroed, and vice versa). Adding the zero contribution is
  IEEE-exact, so the decomposed ensemble scores bit-identically to direct
  traversal of the source tree;
- depth-1 and leaf-only trees embed as constant-leaf rows.

Depth > 2 raises: the vectorized kernel's two-level contract is documented
(kernels/ensemble.py) and the reference's value models are shallow; a
deeper model needs a kernel widening, not silent truncation.
"""

from __future__ import annotations

import json

import numpy as np

from bigdatabowl_spark.kernels.ensemble import TreeEnsemble

_INT_MAX = 2147483647  # xgboost's "no parent" sentinel


def ensemble_to_xgb_json(ens: TreeEnsemble) -> dict:
    """Serialize a TreeEnsemble as an xgboost ``save_model`` JSON document.

    Each depth-2 tree becomes the 7-node layout (root, two internal
    children, four leaves); leaf values ride in ``split_conditions`` at
    leaf node positions, exactly as xgboost's JSON schema stores them.
    """
    n_trees = len(ens.feat_a)
    trees = []
    for t in range(n_trees):
        l0, l1, l2, l3 = (float(v) for v in ens.leaves[t])
        trees.append(
            {
                "id": t,
                "left_children": [1, 3, 5, -1, -1, -1, -1],
                "right_children": [2, 4, 6, -1, -1, -1, -1],
                "parents": [_INT_MAX, 0, 0, 1, 1, 2, 2],
                "split_indices": [
                    int(ens.feat_a[t]), int(ens.feat_b[t]), int(ens.feat_b[t]),
                    0, 0, 0, 0,
                ],
                "split_conditions": [
                    float(ens.thr_a[t]), float(ens.thr_b[t]), float(ens.thr_b[t]),
                    l0, l1, l2, l3,
                ],
                "default_left": [1, 1, 1, 0, 0, 0, 0],
                "split_type": [0] * 7,
                "base_weights": [0.0] * 7,
                "loss_changes": [0.0] * 7,
                "sum_hessian": [0.0] * 7,
                "categories": [],
                "categories_nodes": [],
                "categories_segments": [],
                "categories_sizes": [],
                "tree_param": {
                    "num_nodes": "7",
                    "num_feature": str(
                        int(max(ens.feat_a.max(), ens.feat_b.max())) + 1
                        if n_trees
                        else 0
                    ),
                    "size_leaf_vector": "1",
                },
            }
        )
    n_class = ens.n_classes
    return {
        "version": [1, 7, 6],
        "learner": {
            "attributes": {},
            "feature_names": [],
            "feature_types": [],
            "learner_model_param": {
                "base_score": "0",
                "boost_from_average": "1",
                "num_class": str(n_class),
                "num_feature": "26",
                "num_target": "1",
            },
            "objective": {
                "name": "multi:softprob",
                "softmax_multiclass_param": {"num_class": str(n_class)},
            },
            "gradient_booster": {
                "name": "gbtree",
                "model": {
                    "gbtree_model_param": {
                        "num_trees": str(n_trees),
                        "num_parallel_tree": "1",
                    },
                    "tree_info": [int(c) for c in ens.tree_class],
                    "trees": trees,
                },
            },
        },
    }


def _emit_side(tree: dict, node: int, fa: int, ta: float, side: str, rows: list):
    """Append TreeEnsemble rows for one child branch of a depth-2 root.

    ``side='L'`` fills leaves[0:2] (reached when the root test is true) and
    zeroes leaves[2:4]; ``side='R'`` the reverse. A leaf child embeds as a
    constant pair so the second-level test is irrelevant.
    """
    lc, rc = tree["left_children"], tree["right_children"]
    si, scond = tree["split_indices"], tree["split_conditions"]
    if lc[node] == -1:  # leaf child: constant contribution on this side
        v = float(scond[node])
        pair = (v, v)
    else:
        ll, rr = lc[node], rc[node]
        if lc[ll] != -1 or lc[rr] != -1:
            raise NotImplementedError(
                "xgb_json: tree deeper than 2 levels — the vectorized "
                "TreeEnsemble kernel's depth-2 contract does not cover it"
            )
        pair = None
    if pair is not None:
        fb, tb = 0, np.inf  # X[:,0] < inf is always true; both leaves equal
        l_yes, l_no = pair
    else:
        fb, tb = int(si[node]), float(scond[node])
        l_yes, l_no = float(scond[lc[node]]), float(scond[rc[node]])
    if side == "L":
        rows.append((fa, ta, fb, tb, (l_yes, l_no, 0.0, 0.0)))
    else:
        rows.append((fa, ta, fb, tb, (0.0, 0.0, l_yes, l_no)))


def ensemble_from_xgb_json(doc: dict) -> TreeEnsemble:
    """Reconstruct a TreeEnsemble from an xgboost JSON model document."""
    learner = doc["learner"]
    model = learner["gradient_booster"]["model"]
    n_class = int(learner["learner_model_param"]["num_class"]) or 1
    tree_info = model["tree_info"]
    rows: list = []  # (fa, ta, fb, tb, (l0, l1, l2, l3))
    classes: list = []

    for tree, cls in zip(model["trees"], tree_info):
        lc, rc = tree["left_children"], tree["right_children"]
        si, scond = tree["split_indices"], tree["split_conditions"]
        before = len(rows)
        if lc[0] == -1:  # root is a leaf: constant margin for the class
            v = float(scond[0])
            rows.append((0, np.inf, 0, np.inf, (v, v, v, v)))
        else:
            fa, ta = int(si[0]), float(scond[0])
            left, right = lc[0], rc[0]
            both_internal = lc[left] != -1 and lc[right] != -1
            if (
                both_internal
                and si[left] == si[right]
                and scond[left] == scond[right]
                and lc[lc[left]] == -1 and lc[rc[left]] == -1
                and lc[lc[right]] == -1 and lc[rc[right]] == -1
            ):
                # symmetric second level (our own artifacts): one row,
                # byte-for-byte with the source ensemble
                rows.append(
                    (
                        fa, ta, int(si[left]), float(scond[left]),
                        (
                            float(scond[lc[left]]), float(scond[rc[left]]),
                            float(scond[lc[right]]), float(scond[rc[right]]),
                        ),
                    )
                )
            else:
                _emit_side(tree, left, fa, ta, "L", rows)
                _emit_side(tree, right, fa, ta, "R", rows)
        classes.extend([int(cls)] * (len(rows) - before))

    from bigdatabowl_spark.kernels.ensemble import EPVALS

    epvals = EPVALS[:n_class].copy() if n_class <= len(EPVALS) else np.arange(
        n_class, dtype=np.float64
    )
    return TreeEnsemble(
        feat_a=np.array([r[0] for r in rows], dtype=np.int64),
        thr_a=np.array([r[1] for r in rows], dtype=np.float64),
        feat_b=np.array([r[2] for r in rows], dtype=np.int64),
        thr_b=np.array([r[3] for r in rows], dtype=np.float64),
        leaves=np.array([r[4] for r in rows], dtype=np.float64),
        tree_class=np.array(classes, dtype=np.int64),
        epvals=epvals,
    )


def save_xgb_json(ens: TreeEnsemble, path: str) -> None:
    with open(path, "w") as f:
        json.dump(ensemble_to_xgb_json(ens), f)


def load_xgb_json(path: str) -> TreeEnsemble:
    with open(path) as f:
        return ensemble_from_xgb_json(json.load(f))
