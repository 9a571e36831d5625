"""Property test: random scalar bilevel programs with closed-form solutions.

Instance family::

    follower:  min_y  ½ a (y − (c x + d))²      s.t. lo ≤ y ≤ hi
    leader:    min_x  (x − tx)² + w (y − ty)²   s.t. |x| ≤ X

The follower map is y*(x) = clip(c x + d, lo, hi) — three affine pieces.
The solver computes *local* Stackelberg points (like the reference), so the
property checked is the analytic local-optimality condition: at the solution,
the leader's directional derivative along EVERY piece of the follower map
active at x* must be nonnegative into the feasible directions.  This is the
randomized analogue of the reference's 8-point golden table."""

import math

import numpy as np
import pytest

import qpn_tpu as qt
from qpn_tpu.frontend import QPNetBuilder, variable


def _build(a, c, d, lo, hi, tx, ty, w, X):
    x = variable("x")
    y = variable("y")
    b = QPNetBuilder(x, y)
    cid_f = b.add_constraint([y], [lo], [hi])
    fol = b.add_qp(0.5 * a * (y - (c * x + d)) ** 2, [cid_f], y)
    cid_l = b.add_constraint([x], [-X], [X])
    led = b.add_qp((x - tx) ** 2 + w * (y - ty) ** 2, [cid_l], x)
    b.add_edges([(led, fol)])
    b.assign_constraint_groups()
    return b.net


def _leader_obj(x, y, tx, ty, w):
    return (x - tx) ** 2 + w * (y - ty) ** 2


def _pieces(c, d, lo, hi, X, tol=1e-6):
    """(x-interval, slope, intercept) of each piece of y*(x) on [-X, X]."""
    out = []
    if abs(c) > 1e-12:
        x_lo = (lo - d) / c
        x_hi = (hi - d) / c
        left, right = min(x_lo, x_hi), max(x_lo, x_hi)
        low_iv = (-X, left) if c > 0 else (right, X)
        hi_iv = (right, X) if c > 0 else (-X, left)
        for (iv, yv) in ((low_iv, lo), (hi_iv, hi)):
            a_, b_ = max(iv[0], -X), min(iv[1], X)
            if a_ <= b_ + tol:
                out.append(((a_, b_), 0.0, yv))
        a_, b_ = max(left, -X), min(right, X)
        if a_ <= b_ + tol:
            out.append(((a_, b_), c, d))
    else:
        yconst = min(max(d, lo), hi)
        out.append(((-X, X), 0.0, yconst))
    return out


def _is_local_opt(x_opt, c, d, lo, hi, tx, ty, w, X, tol=1e-4):
    """Local Stackelberg optimality: on every piece active at x*, the leader
    derivative must be ≥0 toward the right end and ≤0 toward the left end of
    the feasible directions available on that piece."""
    for (a_, b_), m_, k_ in _pieces(c, d, lo, hi, X):
        if not (a_ - tol <= x_opt <= b_ + tol):
            continue
        # leader along the piece: φ(x) = (x-tx)² + w (m x + k - ty)²
        grad = 2 * (x_opt - tx) + 2 * w * m_ * (m_ * x_opt + k_ - ty)
        can_right = x_opt < b_ - tol
        can_left = x_opt > a_ + tol
        if can_right and grad < -tol:
            return False
        if can_left and grad > tol:
            return False
    return True


@pytest.mark.parametrize("seed", range(12))
def test_random_scalar_bilevel(seed):
    rng = np.random.default_rng(seed)
    a = 0.5 + rng.random()
    c = rng.uniform(-1.5, 1.5)
    d = rng.uniform(-1, 1)
    lo = rng.uniform(-2, -0.2)
    hi = rng.uniform(0.2, 2)
    tx = rng.uniform(-2, 2)
    ty = rng.uniform(-2, 2)
    w = 0.3 + rng.random()
    X = 3.0
    qpn = _build(a, c, d, lo, hi, tx, ty, w, X)
    ret = qt.solve(qpn, np.zeros(2))
    assert ret.solved, f"seed {seed} failed: {getattr(ret, 'error', None)}"
    x_opt, y_opt = ret.x_opt
    # solver point must be consistent with the follower map ...
    assert np.isclose(y_opt, min(max(c * x_opt + d, lo), hi), atol=1e-4)
    # ... and be a local Stackelberg point of the piecewise-affine bilevel
    assert _is_local_opt(x_opt, c, d, lo, hi, tx, ty, w, X), \
        (seed, x_opt, y_opt)


@pytest.mark.parametrize("seed", range(8))
def test_random_two_player_nash(seed):
    """Unconstrained-interior LQ Nash games have the closed-form equilibrium
    from stacking both players' stationarity conditions; the solver must
    reproduce it when the box is slack."""
    rng = np.random.default_rng(100 + seed)
    a1, a2 = 1.0 + rng.random(2)          # own-curvatures (convex)
    b1, b2 = rng.uniform(-0.8, 0.8, 2)    # couplings
    t1, t2 = rng.uniform(-1, 1, 2)
    # players: min_x1 ½a1 x1² + b1 x1 x2 − t1 x1 ; min_x2 ½a2 x2² + b2 x1 x2 − t2 x2
    K = np.array([[a1, b1], [b2, a2]])
    if abs(np.linalg.det(K)) < 1e-3:
        pytest.skip("near-singular stationarity system")
    x_star = np.linalg.solve(K, np.array([t1, t2]))
    if np.abs(x_star).max() > 4.5:
        pytest.skip("equilibrium outside the test box")

    x1 = variable("x1")
    x2 = variable("x2")
    b = QPNetBuilder(x1, x2)
    c1 = b.add_constraint([x1], [-5.0], [5.0])
    c2 = b.add_constraint([x2], [-5.0], [5.0])
    b.add_qp(0.5 * a1 * x1 * x1 + b1 * x1 * x2 - t1 * x1, [c1], x1)
    b.add_qp(0.5 * a2 * x2 * x2 + b2 * x1 * x2 - t2 * x2, [c2], x2)
    b.add_edges([])
    b.assign_constraint_groups()
    ret = qt.solve(b.net, np.zeros(2))
    assert ret.solved
    assert np.allclose(ret.x_opt, x_star, atol=1e-6), (seed, ret.x_opt, x_star)
