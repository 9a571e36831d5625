"""Tests for the native C++ host pivot engine (native/qpn_host.cpp
qpn_lemke_batch + ops/lemke.solve_lp_host_batch) and the trajectory-safe
engine routing in geometry/setops.py.

The host engine re-creates PATH's pivoting role (reference avi.jl:63-77)
for the small geometry-query LPs (sets.jl:377-407 support, sets.jl:591-642
emptiness) on exact shapes, bypassing device dispatch.  Trajectory safety:
only value-determined results (support values, emptiness verdicts outside
the strict-row boundary band) may come from the pivot engine; witness
points stay with the ADMM engine (see config.NumericConfig docs).
"""

import numpy as np
import pytest

from qpn_tpu.ops import batch_qp
from qpn_tpu.ops.lemke import (LEMKE_SUCCESS, solve_lemke_np,
                               solve_lp_host_batch)
from qpn_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library unavailable")


def nat_res(M, q, l, u, z):
    F = M @ z + q
    with np.errstate(invalid="ignore"):
        proj = np.clip(z - F, l, u)
    return np.abs(z - proj).max()


class TestNativeLemkeBatch:
    def test_matches_python_oracle(self):
        from tests.test_lemke import random_box_avi
        rng = np.random.default_rng(11)
        for kind in range(4):
            Ms, qs, ls, us = [], [], [], []
            for _ in range(8):
                M, q, l, u = random_box_avi(rng, 9, kind)
                Ms.append(M)
                qs.append(q)
                ls.append(l)
                us.append(u)
            M, q, l, u = map(np.stack, (Ms, qs, ls, us))
            out = native.lemke_batch(M, q, l, u)
            assert out is not None
            z, status, piv = out
            for b in range(8):
                zp, stp, _ = solve_lemke_np(M[b], q[b], l[b], u[b])
                assert status[b] == stp, (kind, b)
                if status[b] == LEMKE_SUCCESS:
                    assert nat_res(M[b], q[b], l[b], u[b], z[b]) <= 1e-7
                    # both engines run the identical pivot rule -> same path
                    np.testing.assert_allclose(z[b], zp, atol=1e-7)

    def test_warm_start_path(self):
        rng = np.random.default_rng(3)
        n = 6
        R = rng.standard_normal((n, n))
        M = (R @ R.T + 0.5 * np.eye(n))[None]
        q = rng.standard_normal((1, n))
        l = np.zeros((1, n))
        u = np.full((1, n), np.inf)
        z, st, piv = native.lemke_batch(M, q, l, u)
        assert st[0] == LEMKE_SUCCESS
        # re-solve warm-started at the solution: ~no pivots needed
        z2, st2, piv2 = native.lemke_batch(M, q, l, u, z0=z)
        assert st2[0] == LEMKE_SUCCESS
        assert piv2[0] <= piv[0]
        np.testing.assert_allclose(z2[0], z[0], atol=1e-8)


class TestHostLPBatch:
    def test_matches_admm_objectives(self):
        rng = np.random.default_rng(7)
        B, m, n = 16, 8, 5
        A = rng.standard_normal((B, m, n))
        c = rng.standard_normal((B, n))
        x0 = rng.standard_normal((B, n))
        Ax0 = np.einsum("bmn,bn->bm", A, x0)
        l = Ax0 - np.abs(rng.standard_normal((B, m))) - 0.1
        u = Ax0 + np.abs(rng.standard_normal((B, m))) + 0.1
        eye = np.tile(np.eye(n)[None], (B, 1, 1))
        A2 = np.concatenate([A, eye], axis=1)
        l2 = np.concatenate([l, np.full((B, n), -5.0)], axis=1)
        u2 = np.concatenate([u, np.full((B, n), 5.0)], axis=1)
        # ragged row masks: drop a random tail row in half the lanes
        mask = np.ones((B, m + n), dtype=bool)
        mask[::2, m - 1] = False
        sol = solve_lp_host_batch(c, A2, l2, u2, mask)
        assert sol is not None
        ref = batch_qp.solve_qp_batch_padded(
            np.zeros((B, n, n)), c, A2, l2, u2, mask, _no_lemke=True)
        for b in range(B):
            assert sol.status[b] == batch_qp.SOLVED
            np.testing.assert_allclose(sol.obj[b], np.asarray(ref.obj)[b],
                                       atol=1e-5)
            act = np.nonzero(mask[b])[0]
            g = c[b] + A2[b][act].T @ np.asarray(sol.y[b])[act]
            np.testing.assert_allclose(g, 0.0, atol=1e-7)

    def test_unbounded_status(self):
        n = 3
        A = np.zeros((1, 2, n))
        A[0, 0, 0] = 1.0
        A[0, 1, 1] = 1.0
        c = np.zeros((1, n))
        c[0, 0] = 1.0
        l = np.array([[-np.inf, -1.0]])
        u = np.array([[5.0, 1.0]])
        mask = np.ones((1, 2), dtype=bool)
        sol = solve_lp_host_batch(c, A, l, u, mask)
        assert sol is not None
        assert sol.status[0] == batch_qp.DUAL_INFEASIBLE


class TestVerdictOnlyRouting:
    def _fresh(self):
        from qpn_tpu.geometry.query_cache import CACHE
        CACHE.clear()

    def test_empty_verdicts_match_admm(self):
        from qpn_tpu.config import CONFIG
        from qpn_tpu.geometry.poly import random_polys_of_dim
        from qpn_tpu.geometry.setops import is_empty_batch
        rng = np.random.default_rng(5)
        polys = random_polys_of_dim(rng, 30, 3)
        old = CONFIG.empty_engine
        try:
            self._fresh()
            CONFIG.empty_engine = "admm"
            ref = is_empty_batch(polys)
            self._fresh()
            CONFIG.empty_engine = "host"
            got = is_empty_batch(polys)
        finally:
            CONFIG.empty_engine = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_witness_cache_not_polluted(self):
        """A verdict-only host query must not leave a witness-grade cache
        entry: the later exemplar call still yields an ADMM witness."""
        from qpn_tpu.config import CONFIG
        from qpn_tpu.geometry.poly import Poly
        from qpn_tpu.geometry.setops import exemplar_batch, is_empty
        p = Poly(np.array([[1.0, 0.0], [0.0, 1.0]]),
                 np.array([0.0, 0.0]), np.array([2.0, 2.0]))
        old = CONFIG.empty_engine
        try:
            self._fresh()
            CONFIG.empty_engine = "host"
            assert not is_empty(p)
            empty, ex = exemplar_batch([p])
            assert not empty[0]
            assert ex[0] is not None            # witness-grade result
            assert p.contains(ex[0], 1e-8)
        finally:
            CONFIG.empty_engine = old

    def test_support_engine_host_matches_admm(self):
        from qpn_tpu.config import CONFIG
        from qpn_tpu.geometry.poly import random_polys_of_dim
        from qpn_tpu.geometry.setops import support_batch
        rng = np.random.default_rng(9)
        polys = random_polys_of_dim(rng, 12, 3)
        dirs = [rng.standard_normal(3) for _ in polys]
        old = CONFIG.support_engine
        try:
            self._fresh()
            CONFIG.support_engine = "admm"
            ref = support_batch(polys, dirs)
            self._fresh()
            CONFIG.support_engine = "host"
            got = support_batch(polys, dirs)
        finally:
            CONFIG.support_engine = old
        gv, _ = got
        rv, _ = ref
        for a, b in zip(gv, rv):
            if np.isfinite(a) or np.isfinite(b):
                np.testing.assert_allclose(a, b, atol=1e-5)
