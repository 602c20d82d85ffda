"""Physics/model parameters and grid constants for the EPPA kernel.

Values mirror the reference's tuned scalars (analysis/models/params.py:4-12)
and grid constants (analysis/models/consts.py:5-11): a 120×55-yard cell grid
(F=6,600) × 40 times-of-flight — 264,000 hypothetical passes per frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

FIELD_X = 120  # cells along x (consts.py:5-11)
FIELD_Y = 55
N_CELLS = FIELD_X * FIELD_Y  # F = 6600
N_TOF = 40  # times of flight, 0.1s steps
DT = 0.1
G = 10.72468  # projectile gravity, yd/s² (play_eppa_cpu.py:340-351)


@dataclass(frozen=True)
class EppaParams:
    """Tuned physics parameters (params.py:4-12)."""

    a_max: float = 7.67
    s_max: float = 9.42
    reax_t: float = 0.0
    tti_sigma: float = 0.31
    alpha: float = 1.2
    z_min: float = 1.0
    z_max: float = 3.0
    def_beta: float = 1.0


def field_grid() -> np.ndarray:
    """(F, 2) float64 cell centers — x fastest axis flattening y·120+x
    (play_eppa_cpu.py:352 ravel convention)."""
    xs = np.arange(FIELD_X, dtype=np.float64) + 0.5
    ys = np.arange(FIELD_Y, dtype=np.float64) + 0.5
    gx, gy = np.meshgrid(xs, ys)  # (Y, X)
    return np.stack([gx.ravel(), gy.ravel()], axis=1)  # row-major: y·120+x


def tof_values() -> np.ndarray:
    """(T,) float64 times of flight 0.1..4.0 s."""
    return (np.arange(N_TOF, dtype=np.float64) + 1.0) * DT
