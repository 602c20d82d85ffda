"""Vectorized tree-ensemble value models at the reference's inference width.

The reference scores every hypothetical pass of a frame — 264,000 rows
(6,600 cells × 40 times-of-flight) × 26 features — through treelite-compiled
8-class softprob XGBoost models, then takes the expectation over the class
value vector (play_eppa_cpu.py:424-459; epvals :136-149). This module is the
NumPy equivalent — no Python per-row loop, no external model runtime:

- ``TreeEnsemble``: the depth-2 fast path (two vectorized ``np.where`` per
  tree), kept for the compiled-to-SQL relational twin and as the fastest
  scorer when a model is genuinely shallow.
- ``FlatForest``: ARBITRARY-depth trees held as flat node arrays
  (feat/thr/left/right/default_left/leaf_val) and walked with depth-many
  vectorized gather rounds (``np.take`` + masked child select), so a real
  xgboost ``model.json`` of any depth (the reference's value models train at
  xgboost's default depth 6 — Rishav's xyac.ipynb · cells 5-11) scores
  bit-identically to single-row traversal with no per-row Python. NaN
  features route per node ``default_left`` exactly as xgboost does, and the
  learner ``base_score`` is applied as the uniform margin offset.

The default specs mirror plans/advanced.py's relational ensemble (same
class/tree counts) but are independent artifacts: the kernel consumes them
as broadcast closure constants (S4/S6), the relational query compiles its
spec to SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

N_FEATURES = 26
N_CLASSES = 8
EPVALS = np.array([7.0, -7.0, 3.0, -3.0, 2.0, -2.0, 0.0, 1.0])


@dataclass(frozen=True)
class TreeEnsemble:
    """Depth-2 softprob ensemble: tree t routes on (feat_a[t] < thr_a[t],
    feat_b[t] < thr_b[t]) into leaves[t, 0..3]; margins accumulate per
    tree_class[t]; softmax over classes; expectation over epvals."""

    feat_a: np.ndarray  # (n_trees,) int
    thr_a: np.ndarray  # (n_trees,) float
    feat_b: np.ndarray  # (n_trees,) int
    thr_b: np.ndarray  # (n_trees,) float
    leaves: np.ndarray  # (n_trees, 4) float
    tree_class: np.ndarray  # (n_trees,) int
    epvals: np.ndarray  # (n_classes,) float

    @property
    def n_classes(self) -> int:
        return len(self.epvals)

    @classmethod
    def default(cls, trees_per_class: int = 2) -> "TreeEnsemble":
        """Deterministic 8-class × trees_per_class spec over 26 features —
        leaf weights in [-0.5, 0.5] keep margins softmax-conditioned."""
        fa, ta, fb, tb, lv, tc = [], [], [], [], [], []
        for c in range(N_CLASSES):
            for j in range(trees_per_class):
                fa.append((2 * c + j) % N_FEATURES)
                fb.append((2 * c + j + 7) % N_FEATURES)
                # thresholds sit mid-range of the standardized features
                ta.append(0.5 * ((c + j) % 3 - 1))
                tb.append(0.25 * ((c + 2 * j) % 5 - 2))
                lv.append(
                    [((c * 31 + j * 17 + k * 7) % 11 - 5) / 10.0 for k in range(4)]
                )
                tc.append(c)
        return cls(
            feat_a=np.array(fa, dtype=np.int64),
            thr_a=np.array(ta, dtype=np.float64),
            feat_b=np.array(fb, dtype=np.int64),
            thr_b=np.array(tb, dtype=np.float64),
            leaves=np.array(lv, dtype=np.float64),
            tree_class=np.array(tc, dtype=np.int64),
            epvals=EPVALS.copy(),
        )

    def margins(self, X: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(N, 26) → (N, C) class margins. Two vectorized where's per tree."""
        n = X.shape[0]
        m = out if out is not None else np.empty((n, self.n_classes))
        m[:] = 0.0
        for t in range(len(self.feat_a)):
            a = X[:, self.feat_a[t]] < self.thr_a[t]
            b = X[:, self.feat_b[t]] < self.thr_b[t]
            l0, l1, l2, l3 = self.leaves[t]
            m[:, self.tree_class[t]] += np.where(
                a, np.where(b, l0, l1), np.where(b, l2, l3)
            )
        return m

    def softprob(self, X: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(N, 26) → (N, C) softmax probabilities (max-shifted, stable)."""
        m = self.margins(X, out=out)
        m -= m.max(axis=1, keepdims=True)
        np.exp(m, out=m)
        m /= m.sum(axis=1, keepdims=True)
        return m

    def expectation(self, X: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(N, 26) → (N,) expectation of epvals under the softprob — the
        reference's `softprob @ epvals` step (play_eppa_cpu.py:459)."""
        p = self.softprob(X, out=out)
        return p @ self.epvals

    def to_forest(self) -> "FlatForest":
        """Re-express the depth-2 spec as a FlatForest (7-node trees in
        xgboost's node layout: root 0, internal 1-2, leaves 3-6). Scores
        bit-identically INCLUDING on NaN inputs: TreeEnsemble's `<`
        comparison routes NaN right, so every node emits default_left=0 —
        a default_left=1 here would silently flip NaN routing in the
        converted forest (round-6 review finding)."""
        trees = []
        for t in range(len(self.feat_a)):
            l0, l1, l2, l3 = (float(v) for v in self.leaves[t])
            trees.append(
                {
                    "left_children": [1, 3, 5, -1, -1, -1, -1],
                    "right_children": [2, 4, 6, -1, -1, -1, -1],
                    "split_indices": [
                        int(self.feat_a[t]), int(self.feat_b[t]),
                        int(self.feat_b[t]), 0, 0, 0, 0,
                    ],
                    "split_conditions": [
                        float(self.thr_a[t]), float(self.thr_b[t]),
                        float(self.thr_b[t]), l0, l1, l2, l3,
                    ],
                    "default_left": [0] * 7,
                }
            )
        return FlatForest.from_node_arrays(
            trees, [int(c) for c in self.tree_class], self.epvals.copy()
        )


@dataclass(frozen=True)
class FlatForest:
    """Arbitrary-depth softprob forest as flat node arrays.

    Nodes of all trees are concatenated; tree t owns the contiguous slice
    ``[offsets[t], offsets[t+1])`` with its root at ``offsets[t]``.
    ``left``/``right`` hold GLOBAL node indices; a leaf points at itself
    (self-loop), which makes the traversal branch-free: every routing round
    just gathers children, and rows already at a leaf stay put. ``thr`` is
    the split condition for internal nodes; ``leaf_val`` the additive margin
    at leaves (0 for internal). ``depth[t]`` is the number of routing rounds
    that pins every row of tree t at a leaf.

    Traversal is the reference's treelite/xgboost semantics
    (play_eppa_cpu.py:80-87 loads such models): ``x[feat] < thr`` routes
    left, NaN routes per ``default_left``, leaf margins accumulate into
    ``tree_class[t]``, ``base_score`` offsets every class margin.
    """

    feat: np.ndarray  # (n_nodes,) int64 split feature (0 at leaves)
    thr: np.ndarray  # (n_nodes,) float64 split condition (0.0 at leaves)
    left: np.ndarray  # (n_nodes,) int64 global child (self at leaves)
    right: np.ndarray  # (n_nodes,) int64 global child (self at leaves)
    default_left: np.ndarray  # (n_nodes,) bool — NaN routing
    leaf_val: np.ndarray  # (n_nodes,) float64 margin (0.0 at internal)
    offsets: np.ndarray  # (n_trees+1,) int64 node-slice boundaries
    depth: np.ndarray  # (n_trees,) int64 routing rounds per tree
    tree_class: np.ndarray  # (n_trees,) int64
    epvals: np.ndarray  # (n_classes,) float64
    base_score: float = 0.0

    @property
    def n_classes(self) -> int:
        return len(self.epvals)

    @property
    def n_trees(self) -> int:
        return len(self.tree_class)

    @classmethod
    def from_node_arrays(
        cls,
        trees: list[dict],
        tree_info: list[int],
        epvals: np.ndarray,
        base_score: float = 0.0,
    ) -> "FlatForest":
        """Build from per-tree xgboost-style node arrays (``left_children``
        / ``right_children`` / ``split_indices`` / ``split_conditions`` /
        ``default_left`` with -1 leaf children and leaf values riding in
        ``split_conditions``). Node order is preserved verbatim per tree, so
        json → forest → json round-trips byte-for-byte."""
        feat, thr, left, right, dleft, leaf_val = [], [], [], [], [], []
        offsets = [0]
        depths = []
        for tree in trees:
            lc, rc = tree["left_children"], tree["right_children"]
            si, sc = tree["split_indices"], tree["split_conditions"]
            dl = tree.get("default_left") or [0] * len(lc)
            base = offsets[-1]
            n = len(lc)
            # per-node depth below root via one pass (children appear after
            # parents in xgboost's layout is NOT guaranteed, so walk from root)
            node_depth = [0] * n
            stack = [0]
            max_d = 0
            while stack:
                i = stack.pop()
                if lc[i] != -1:
                    d = node_depth[i] + 1
                    node_depth[lc[i]] = node_depth[rc[i]] = d
                    max_d = max(max_d, d)
                    stack.append(lc[i])
                    stack.append(rc[i])
            depths.append(max_d)
            for i in range(n):
                if lc[i] == -1:  # leaf: self-loop, margin in leaf_val
                    feat.append(0)
                    thr.append(0.0)
                    left.append(base + i)
                    right.append(base + i)
                    dleft.append(False)
                    leaf_val.append(float(sc[i]))
                else:
                    feat.append(int(si[i]))
                    thr.append(float(sc[i]))
                    left.append(base + lc[i])
                    right.append(base + rc[i])
                    dleft.append(bool(dl[i]))
                    leaf_val.append(0.0)
            offsets.append(base + n)
        return cls(
            feat=np.array(feat, dtype=np.int64),
            thr=np.array(thr, dtype=np.float64),
            left=np.array(left, dtype=np.int64),
            right=np.array(right, dtype=np.int64),
            default_left=np.array(dleft, dtype=np.bool_),
            leaf_val=np.array(leaf_val, dtype=np.float64),
            offsets=np.array(offsets, dtype=np.int64),
            depth=np.array(depths, dtype=np.int64),
            tree_class=np.array([int(c) for c in tree_info], dtype=np.int64),
            epvals=np.asarray(epvals, dtype=np.float64),
            base_score=float(base_score),
        )

    def tree_nodes(self, t: int) -> dict:
        """Tree t back as xgboost-style LOCAL node arrays (serializer view)."""
        lo, hi = int(self.offsets[t]), int(self.offsets[t + 1])
        lc, rc, si, sc, dl = [], [], [], [], []
        for g in range(lo, hi):
            if self.left[g] == g:  # leaf
                lc.append(-1)
                rc.append(-1)
                si.append(0)
                sc.append(float(self.leaf_val[g]))
                dl.append(0)
            else:
                lc.append(int(self.left[g] - lo))
                rc.append(int(self.right[g] - lo))
                si.append(int(self.feat[g]))
                sc.append(float(self.thr[g]))
                dl.append(int(self.default_left[g]))
        return {
            "left_children": lc,
            "right_children": rc,
            "split_indices": si,
            "split_conditions": sc,
            "default_left": dl,
        }

    @classmethod
    def default_deep(
        cls, depth: int = 4, trees_per_class: int = 2, n_classes: int = N_CLASSES
    ) -> "FlatForest":
        """Deterministic complete-depth ensemble over 26 features — the
        stand-in for the reference's default-depth trained value models.
        Leaf weights in [-0.5, 0.5] keep margins softmax-conditioned."""
        trees, info = [], []
        tid = 0
        for c in range(n_classes):
            for j in range(trees_per_class):
                n_internal = (1 << depth) - 1
                n = (1 << (depth + 1)) - 1
                lc = [2 * i + 1 if i < n_internal else -1 for i in range(n)]
                rc = [2 * i + 2 if i < n_internal else -1 for i in range(n)]
                si, sc, dl = [], [], []
                for i in range(n):
                    if i < n_internal:
                        si.append((2 * c + 3 * j + 5 * i) % N_FEATURES)
                        sc.append(0.25 * ((c + j + i) % 7 - 3))
                        dl.append((c + i) % 2)
                    else:
                        si.append(0)
                        k = i - n_internal
                        sc.append(((c * 31 + j * 17 + k * 7 + tid) % 11 - 5) / 10.0)
                        dl.append(0)
                trees.append(
                    {
                        "left_children": lc,
                        "right_children": rc,
                        "split_indices": si,
                        "split_conditions": sc,
                        "default_left": dl,
                    }
                )
                info.append(c)
                tid += 1
        return cls.from_node_arrays(trees, info, EPVALS[:n_classes].copy())

    def margins(self, X: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(N, F) → (N, C) class margins: depth-many vectorized gather
        rounds per tree (``np.take`` on the node arrays + one fancy gather
        on X per round) — no per-row Python at any depth."""
        n = X.shape[0]
        m = out if out is not None else np.empty((n, self.n_classes))
        m[:] = self.base_score
        rows = np.arange(n)
        any_nan = bool(np.isnan(X).any())
        for t in range(self.n_trees):
            cur = np.full(n, self.offsets[t], dtype=np.int64)
            for _ in range(int(self.depth[t])):
                f = self.feat[cur]
                x = X[rows, f]
                go_left = x < self.thr[cur]
                if any_nan:
                    isnan = np.isnan(x)
                    if isnan.any():
                        go_left = np.where(isnan, self.default_left[cur], go_left)
                cur = np.where(go_left, self.left[cur], self.right[cur])
            m[:, self.tree_class[t]] += self.leaf_val[cur]
        return m

    def softprob(self, X: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(N, F) → (N, C) softmax probabilities (max-shifted, stable)."""
        m = self.margins(X, out=out)
        m -= m.max(axis=1, keepdims=True)
        np.exp(m, out=m)
        m /= m.sum(axis=1, keepdims=True)
        return m

    def expectation(self, X: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(N, F) → (N,) expectation of epvals under the softprob."""
        p = self.softprob(X, out=out)
        return p @ self.epvals


def pass_feature_matrix(
    grid: np.ndarray,
    tof: np.ndarray,
    ball_start: np.ndarray,
    nearest_def: np.ndarray,
    ppc_off: np.ndarray,
    ppc_def: np.ndarray,
    trans_prior: np.ndarray,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Build the (F·T, 26) per-hypothetical-pass feature matrix.

    Mirrors the reference's frame feature assembly (play_eppa_cpu.py:
    424-456): geometry of the throw (end point, length, air time), arrival
    contest state (nearest defender, per-team catch probabilities), the
    historical prior, and standardized interaction terms padding the vector
    to the model's 26-column contract.
    """
    F, T = ppc_off.shape
    X = out if out is not None else np.empty((F * T, N_FEATURES))
    ex = grid[:, 0]
    ey = grid[:, 1]
    dx = ex - ball_start[0]
    dy = ey - ball_start[1]
    L = np.sqrt(dx * dx + dy * dy)

    def put(i: int, col_f: np.ndarray | None = None, col_ft: np.ndarray | None = None):
        if col_f is not None:  # broadcast a per-cell column across T
            X[:, i] = np.repeat(col_f, T)
        else:
            X[:, i] = col_ft.reshape(-1)

    tof_row = np.tile(tof, F)
    put(0, col_f=(ex - 60.0) / 60.0)
    put(1, col_f=(ey - 26.65) / 26.65)
    put(2, col_f=(L - 30.0) / 30.0)
    X[:, 3] = (tof_row - tof.mean()) / tof.std()
    put(4, col_f=(nearest_def - 10.0) / 10.0)
    put(5, col_ft=ppc_off - 0.5)
    put(6, col_ft=ppc_def - 0.5)
    put(7, col_ft=trans_prior * (ppc_off.size) - 1.0)  # prior vs uniform
    put(8, col_f=(dx - 20.0) / 20.0)
    put(9, col_f=dy / 26.65)
    # interaction / polynomial padding to the 26-column contract
    X[:, 10] = X[:, 2] * X[:, 3]
    X[:, 11] = X[:, 4] * X[:, 5]
    X[:, 12] = X[:, 0] * X[:, 0]
    X[:, 13] = X[:, 1] * X[:, 1]
    X[:, 14] = X[:, 2] * X[:, 2]
    X[:, 15] = X[:, 3] * X[:, 3]
    X[:, 16] = X[:, 0] * X[:, 3]
    X[:, 17] = X[:, 1] * X[:, 3]
    X[:, 18] = X[:, 4] * X[:, 3]
    X[:, 19] = X[:, 5] - X[:, 6]
    X[:, 20] = X[:, 5] * X[:, 6]
    X[:, 21] = X[:, 7] * X[:, 5]
    X[:, 22] = X[:, 0] * X[:, 4]
    X[:, 23] = X[:, 2] * X[:, 4]
    X[:, 24] = X[:, 2] * X[:, 5]
    X[:, 25] = X[:, 8] * X[:, 9]
    return X
