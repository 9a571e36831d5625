"""Correctness of the fused Pallas Lemke pivot kernel (interpret mode).

The kernel (ops/lemke_pallas.py) must follow the same almost-complementary
path discipline as the XLA while_loop engine: same status codes, same
pivot counts, and terminal complementary bases that refactorize to
machine-precision residuals on the ORIGINAL f64 data.  Degenerate lanes
may legitimately settle on a *different* complementary basis than the XLA
engine (f32 tie ordering differs between summation orders); the audit is
therefore solution-level, matching the framework's own acceptance gate
(reference: check_avi_solution, avi.jl:148-156).
"""

import numpy as np
import pytest

from qpn_tpu.ops.avi import natural_residual_np
from qpn_tpu.ops.lemke import (LEMKE_SUCCESS, refactor_batch_np,
                               solve_lemke_batch_state)
from qpn_tpu.ops.lemke_pallas import solve_lemke_batch_state_pallas


def _f32(a):
    return np.asarray(a, dtype=np.float32)


def _run_both(M, q, l, u, vm, max_pivots=1024):
    B, n = q.shape
    z0 = np.zeros((B, n), dtype=np.float32)
    args = (_f32(M), _f32(q), _f32(l), _f32(u), z0, np.asarray(vm, bool))
    kw = dict(tol=1e-6, piv_tol=1e-5, max_pivots=max_pivots)
    P = tuple(np.asarray(a) for a in
              solve_lemke_batch_state_pallas(*args, interpret=True, **kw))
    X = tuple(np.asarray(a) for a in solve_lemke_batch_state(*args, **kw))
    return P, X


def _refactor_resid(M, q, l, u, vm, basis, val):
    z, ok = refactor_batch_np(np.float64(M), np.float64(q), np.float64(l),
                              np.float64(u), basis, val,
                              np.asarray(vm, bool))
    r = natural_residual_np(M, q, l, u, z, vm)
    return z, ok, r


def test_random_pd_avis_match_xla_engine():
    rng = np.random.default_rng(3)
    B, n = 8, 12
    A = rng.standard_normal((B, n, n))
    M = np.einsum("bij,bkj->bik", A, A) + 0.1 * np.eye(n)[None]
    q = rng.standard_normal((B, n))
    l = np.full((B, n), -np.inf)
    u = np.full((B, n), np.inf)
    l[:, :4] = 0.0
    u[:, 4:7] = 0.5          # finite boxes exercise bound flips
    l[:, 7] = u[:, 7] = 0.3  # pinned row
    vm = np.ones((B, n), dtype=bool)
    (zP, stP, pivP, basP, valP), (zX, stX, pivX, basX, valX) = \
        _run_both(M, q, l, u, vm)
    assert (stP == LEMKE_SUCCESS).all()
    np.testing.assert_array_equal(stP, stX)
    np.testing.assert_array_equal(pivP, pivX)
    _, ok, r = _refactor_resid(M, q, l, u, vm, basP, valP)
    assert ok.all()
    assert r.max() < 1e-9


def test_padding_mask_and_solved_at_start():
    rng = np.random.default_rng(7)
    B, n = 4, 10
    nv = 6                                   # last 4 vars are padding
    A = rng.standard_normal((B, nv, nv))
    M = np.zeros((B, n, n))
    M[:, :nv, :nv] = np.einsum("bij,bkj->bik", A, A) + 0.2 * np.eye(nv)
    q = np.zeros((B, n))
    q[:, :nv] = rng.standard_normal((B, nv))
    l = np.zeros((B, n))
    u = np.full((B, n), np.inf)
    # lane 0 solved at start: q >= 0 with l=0 boxes means z=0 is a solution
    q[0, :nv] = np.abs(q[0, :nv]) + 0.1
    vm = np.zeros((B, n), dtype=bool)
    vm[:, :nv] = True
    (zP, stP, pivP, basP, valP), (zX, stX, pivX, basX, valX) = \
        _run_both(M, q, l, u, vm)
    assert (stP == LEMKE_SUCCESS).all()
    assert pivP[0] == 0 and pivX[0] == 0      # solved-at-start short-circuit
    assert np.all(zP[:, nv:] == 0.0)
    _, ok, r = _refactor_resid(M, q, l, u, vm, basP, valP)
    assert ok.all() and r.max() < 1e-9


def test_kkt_scenario_ensemble_end_to_end():
    from qpn_tpu.models.robust_avoid import scenario_batch_gavis
    batch = scenario_batch_gavis(num_scenarios=16, T=2, num_obj=1,
                                 num_poly_faces=4, seed=0)
    M, q, l, u = batch["M"], batch["q"], batch["l"], batch["u"]
    vm = batch["mask"]
    (zP, stP, pivP, basP, valP), (zX, stX, pivX, basX, valX) = \
        _run_both(M, q, l, u, vm)
    np.testing.assert_array_equal(stP, stX)
    np.testing.assert_array_equal(pivP, pivX)
    assert (stP == LEMKE_SUCCESS).all()
    _, ok, r = _refactor_resid(M, q, l, u, vm, basP, valP)
    assert ok.all() and r.max() < 1e-9


def test_structured_route_with_pallas_engine():
    """solve_kkt_avi_batch with the forced Pallas engine certifies to the
    same tolerance as the default engine on the scenario ensemble."""
    from qpn_tpu.config import CONFIG
    from qpn_tpu.models.robust_avoid import scenario_batch_gavis
    from qpn_tpu.ops.avi import solve_kkt_avi_batch
    batch = scenario_batch_gavis(num_scenarios=8, T=2, num_obj=1,
                                 num_poly_faces=4, seed=1)
    M, q, l, u = batch["M"], batch["q"], batch["l"], batch["u"]
    vm, structure = batch["mask"], batch["structure"]
    old = CONFIG.lemke_kernel
    try:
        CONFIG.lemke_kernel = "pallas"
        res = solve_kkt_avi_batch(M, q, l, u, vm, structure, tol=1e-10)
    finally:
        CONFIG.lemke_kernel = old
    assert np.asarray(res.converged).all()
    assert np.asarray(res.resid).max() <= 1e-10


def test_xla_fallback_on_pallas_failure(monkeypatch):
    """A Pallas-layer failure must fall back to the XLA engine, visibly."""
    import qpn_tpu.ops.lemke as lemke_mod
    from qpn_tpu.config import CONFIG
    from qpn_tpu.utils.metrics import METRICS

    def boom(*a, **k):
        raise RuntimeError("mosaic compile failure (simulated)")

    import qpn_tpu.ops.lemke_pallas as lp
    monkeypatch.setattr(lp, "solve_lemke_batch_state_pallas", boom)
    monkeypatch.setattr(lemke_mod, "_PALLAS_FAILED", set())
    # this test exercises the PRODUCTION fallback; the suite-wide strict
    # mode (conftest) would turn the simulated failure into a raise
    monkeypatch.setattr(CONFIG, "pallas_strict", False)
    old = CONFIG.lemke_kernel
    rng = np.random.default_rng(0)
    n = 6
    B = 8      # >= the auto-dispatch lane-tile gate
    A = rng.standard_normal((B, n, n))
    M = np.einsum("bij,bkj->bik", A, A) + 0.1 * np.eye(n)[None]
    q = rng.standard_normal((B, n))
    l = np.zeros((B, n))
    u = np.full((B, n), np.inf)
    before = METRICS.counters.get("lemke_pallas_fallback", 0)
    try:
        CONFIG.lemke_kernel = "pallas"
        args = (_f32(M), _f32(q), _f32(l), _f32(u),
                np.zeros((B, n), np.float32), np.ones((B, n), bool))
        z, st, piv, basis, val = lemke_mod.solve_lemke_batch_state_auto(
            *args, tol=1e-6, piv_tol=1e-5, max_pivots=256)
        # the failing signature is memoized: the retry neither re-attempts
        # the ~1s remote compile nor bumps the metric again
        z2, st2, *_ = lemke_mod.solve_lemke_batch_state_auto(
            *args, tol=1e-6, piv_tol=1e-5, max_pivots=256)
    finally:
        CONFIG.lemke_kernel = old
    assert (np.asarray(st) == LEMKE_SUCCESS).all()
    assert (np.asarray(st2) == LEMKE_SUCCESS).all()
    assert METRICS.counters.get("lemke_pallas_fallback", 0) == before + 1


def test_small_batches_skip_pallas(monkeypatch):
    """Sub-8 batches must not attempt the Pallas route at all (Mosaic
    miscompiles (1, n) reduction shapes; failed remote compiles cost ~1s
    per call — the sequential-baseline pathology)."""
    import qpn_tpu.ops.lemke as lemke_mod
    from qpn_tpu.config import CONFIG

    def boom(*a, **k):
        raise AssertionError("pallas engine must not be called at B<8")

    import qpn_tpu.ops.lemke_pallas as lp
    monkeypatch.setattr(lp, "solve_lemke_batch_state_pallas", boom)
    rng = np.random.default_rng(1)
    n = 6
    A = rng.standard_normal((2, n, n))
    M = np.einsum("bij,bkj->bik", A, A) + 0.1 * np.eye(n)[None]
    q = rng.standard_normal((2, n))
    old = CONFIG.lemke_kernel
    try:
        CONFIG.lemke_kernel = "pallas"
        z, st, piv, basis, val = lemke_mod.solve_lemke_batch_state_auto(
            _f32(M), _f32(q), _f32(np.zeros((2, n))),
            _f32(np.full((2, n), np.inf)), np.zeros((2, n), np.float32),
            np.ones((2, n), bool), tol=1e-6, piv_tol=1e-5, max_pivots=256)
    finally:
        CONFIG.lemke_kernel = old
    assert (np.asarray(st) == LEMKE_SUCCESS).all()


def _rand_psd_lcp(B, n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n))
    M = np.einsum("bij,bkj->bik", A, A) + 0.1 * np.eye(n)[None]
    q = rng.standard_normal((B, n))
    l = np.zeros((B, n))
    u = np.full((B, n), np.inf)
    vm = np.ones((B, n), bool)
    return M, q, l, u, vm


def test_non_power_of_two_batch_pads():
    """B not a multiple of the lane tile must pad (lane-0 copies) rather
    than collapse the tile to the (1, n) shapes Mosaic miscompiles; padded
    results are sliced off and match the XLA engine lane-for-lane."""
    for B in (3, 13, 33):
        M, q, l, u, vm = _rand_psd_lcp(B, 7, seed=B)
        P, X = _run_both(M, q, l, u, vm)
        zP, stP, pivP, basisP, valP = P
        zX, stX, pivX, basisX, valX = X
        assert zP.shape == (B, 7)
        assert (stP == LEMKE_SUCCESS).all()
        np.testing.assert_array_equal(stP, stX)
        np.testing.assert_array_equal(pivP, pivX)
        _, ok, r = _refactor_resid(M, q, l, u, vm, basisP, valP)
        assert ok.all() and r.max() <= 1e-10


def test_pivot_budget_parity_with_xla():
    """Budget-limited lanes must agree with the XLA engine: same pivot
    counts and the same LEMKE_MAX statuses (both engines execute at most
    max_pivots-1 body iterations)."""
    M, q, l, u, vm = _rand_psd_lcp(8, 12, seed=7)
    for mp in (4, 8, 1024):
        P, X = _run_both(M, q, l, u, vm, max_pivots=mp)
        _, stP, pivP, _, _ = P
        _, stX, pivX, _, _ = X
        np.testing.assert_array_equal(stP, stX)
        np.testing.assert_array_equal(pivP, pivX)
        assert (pivP <= mp).all()
