"""Differential validation of the NumPy gamma MLE (VERDICT r4 item 6).

kernels/priors.py claims gamma_mle matches scipy.stats.gamma.fit(floc=0)
to ~1e-8. scipy is not installed in this environment, so the claim is
checked against an INDEPENDENT high-precision solver of the same score
equation scipy's floc=0 MLE solves:

    ln(k) - psi(k) = ln(mean(x)) - mean(ln x),   theta = mean(x) / k

- psi here is an independent implementation (recurrence shift to x >= 20
  plus the Bernoulli asymptotic series through 1/x^10 — |err| < 1e-14,
  far past the 1e-8 tolerance under test), NOT the kernel's 6-shift
  3-term series;
- the root is found by bisection (not the kernel's Newton), so solver,
  psi, and tolerance are all independent of the code under test.

A disagreement beyond 1e-8 relative means the kernel's digamma series or
Newton iteration drifted — exactly what a scipy fixture would catch.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from bigdatabowl_spark.kernels.priors import _digamma, gamma_mle


def psi_ref(x: float) -> float:
    """Independent digamma: shift to >= 20, Bernoulli series to 1/x^10."""
    acc = 0.0
    while x < 20.0:
        acc -= 1.0 / x
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    series = (
        math.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12.0
                  - inv2 * (1.0 / 120.0
                            - inv2 * (1.0 / 252.0
                                      - inv2 * (1.0 / 240.0
                                                - inv2 / 132.0))))
    )
    return acc + series


def solve_k(s: float) -> float:
    """Bisection root of f(k) = ln k - psi(k) - s on (1e-8, 1e8)."""
    f = lambda k: math.log(k) - psi_ref(k) - s  # noqa: E731
    lo, hi = 1e-8, 1e8
    assert f(lo) > 0 > f(hi)  # f is strictly decreasing in k
    for _ in range(200):
        mid = math.sqrt(lo * hi)  # geometric bisection: k spans 16 decades
        if f(mid) > 0:
            lo = mid
        else:
            hi = mid
    return math.sqrt(lo * hi)


def test_kernel_digamma_vs_independent_series():
    # the kernel's 8-shift 3-term series is good to ~2e-9 at x=0.05 (shift
    # lands at 8.05) — an order tighter than the 1e-8 fit claim it feeds
    for x in [0.05, 0.3, 0.9, 1.0, 1.5, 2.7, 5.0, 6.0, 10.0, 42.0, 500.0]:
        got = float(_digamma(np.array([x]))[0])
        assert got == pytest.approx(psi_ref(x), abs=5e-9), x


# (seed, true_shape, true_scale, n) — data is regenerated in-test; the
# fitted values are compared to the independent root for THAT data, so the
# fixtures need no vendored constants, only positive samples of assorted
# shapes (sub-1 shapes stress the digamma recurrence, large shapes the
# asymptotic series).
FIXTURES = [
    (0, 0.4, 2.0, 400),
    (1, 0.9, 0.5, 300),
    (2, 1.0, 1.0, 500),
    (3, 2.34, 6.5, 250),
    (4, 4.0, 6.5, 1000),  # the p(t) prior's parameter neighborhood
    (5, 7.7, 0.08, 600),
    (6, 12.0, 1.4, 350),  # the T|L prior's k=12 neighborhood
    (7, 55.0, 3.0, 800),
]


@pytest.mark.parametrize("seed,shape,scale,n", FIXTURES)
def test_gamma_mle_matches_independent_root(seed, shape, scale, n):
    rng = np.random.default_rng(seed)
    x = rng.gamma(shape, scale, n)
    k_hat, theta_hat = gamma_mle(x)
    s = math.log(x.mean()) - float(np.log(x).mean())
    k_ref = solve_k(s)
    theta_ref = x.mean() / k_ref
    assert k_hat == pytest.approx(k_ref, rel=1e-8)
    assert theta_hat == pytest.approx(theta_ref, rel=1e-8)


def test_gamma_mle_degenerate_inputs():
    nan = gamma_mle(np.array([5.0]))  # < 2 positive points
    assert math.isnan(nan[0]) and math.isnan(nan[1])
    nan2 = gamma_mle(np.array([-1.0, 0.0]))  # nothing positive survives
    assert math.isnan(nan2[0])
