"""Vectorized tree-ensemble value models at the reference's inference width.

The reference scores every hypothetical pass of a frame — 264,000 rows
(6,600 cells × 40 times-of-flight) × 26 features — through treelite-compiled
8-class softprob XGBoost models, then takes the expectation over the class
value vector (play_eppa_cpu.py:424-459; epvals :136-149). This module is the
NumPy equivalent: depth-2 trees held as flat arrays, traversed with
vectorized comparisons (two `np.where` per tree), so a 264k×26 batch scores
in a few ms per tree — no Python per-row loop, no external model runtime.

The default spec mirrors plans/advanced.py's relational ensemble (same
class/tree counts) but is an independent artifact: the kernel consumes it as
a broadcast closure constant (S4/S6), the relational query compiles its spec
to SQL.
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
