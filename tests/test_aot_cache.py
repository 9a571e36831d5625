"""Tests for the cross-process AOT kernel cache (utils/aot_cache).

The cache must be a pure transparency layer: identical results to the
live jitted function, artifacts created in the background, deserialized
artifacts picked up on later (simulated) processes, and graceful
fallback on corrupt files."""

import os
import time

import numpy as np
import pytest


@pytest.fixture()
def fresh_cache(tmp_path, monkeypatch):
    from qpn_tpu.utils import aot_cache
    monkeypatch.setattr(aot_cache, "_DIR", str(tmp_path))
    monkeypatch.setattr(aot_cache, "_ENABLED", True)
    monkeypatch.setenv("QPN_AOT_CACHE_DIR", str(tmp_path))  # worker env
    aot_cache._MEM.clear()
    aot_cache._PENDING.clear()
    yield aot_cache
    aot_cache._drain_exports()
    aot_cache._MEM.clear()
    aot_cache._PENDING.clear()


def _args(B=4, m=6, n=3):
    rng = np.random.default_rng(0)
    P = np.zeros((B, n, n))
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    x0 = rng.standard_normal((B, n))
    Ax0 = np.einsum("bmn,bn->bm", A, x0)
    l = Ax0 - 1.0
    u = Ax0 + 1.0
    mask = np.ones((B, m), dtype=bool)
    return P, q, A, l, u, mask


def test_transparent_and_persistent(fresh_cache):
    aot = fresh_cache
    from qpn_tpu.ops import batch_qp
    args = _args()
    ref = batch_qp.solve_qp_batch(*args)
    out = aot.call_aot("test_qp", batch_qp.solve_qp_batch, *args)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=1e-12)
    # the miss path returns the live fn and schedules a worker export
    aot._drain_exports()
    files = [f for f in os.listdir(aot._subdir())
             if f.endswith(".stablehlo")]
    assert len(files) == 1
    # artifact must carry the cross-process validation marker
    assert os.path.exists(
        os.path.join(aot._subdir(), files[0] + ".ok"))
    # simulate a fresh process: clear the memo; now the artifact is used
    aot._MEM.clear()
    out2 = aot.call_aot("test_qp", batch_qp.solve_qp_batch, *args)
    key = aot._key("test_qp", args, {})
    assert aot._MEM[key] is not batch_qp.solve_qp_batch   # deserialized
    np.testing.assert_allclose(np.asarray(out2.x), np.asarray(ref.x),
                               atol=1e-12)


def test_scalar_kwargs_are_inputs_not_baked(fresh_cache):
    aot = fresh_cache
    from qpn_tpu.ops import batch_qp
    args = _args()
    out1 = aot.call_aot("kwargs_probe", batch_qp.solve_qp_batch, *args,
                        max_iter=50)
    aot._drain_exports()
    aot._MEM.clear()
    # same signature, different scalar value -> same artifact, and the
    # budget must actually differ (50-iteration run can't converge where
    # the 4000-iteration run does, or iters must differ)
    outA = aot.call_aot("kwargs_probe", batch_qp.solve_qp_batch, *args,
                        max_iter=50)
    outB = aot.call_aot("kwargs_probe", batch_qp.solve_qp_batch, *args,
                        max_iter=4000)
    key = aot._key("kwargs_probe", args, {"max_iter": 50})
    assert aot._key("kwargs_probe", args, {"max_iter": 4000}) == key
    assert int(np.asarray(outB.iters).max()) != int(
        np.asarray(outA.iters).max()) or np.allclose(
        np.asarray(outA.x), np.asarray(outB.x))


def test_corrupt_artifact_falls_back(fresh_cache):
    aot = fresh_cache
    from qpn_tpu.ops import batch_qp
    args = _args()
    key = aot._key("corrupt", args, {})
    os.makedirs(aot._subdir(), exist_ok=True)
    path = os.path.join(aot._subdir(), key + ".stablehlo")
    with open(path, "wb") as f:
        f.write(b"not a stablehlo artifact")
    with open(path + ".ok", "w") as f:
        f.write("ok")     # even a (falsely) validated corrupt file must fall back
    ref = batch_qp.solve_qp_batch(*args)
    out = aot.call_aot("corrupt", batch_qp.solve_qp_batch, *args)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=1e-12)


def test_padded_route_matches_disabled(fresh_cache, monkeypatch):
    """solve_qp_batch_padded answers identically with the cache on/off."""
    aot = fresh_cache
    from qpn_tpu.ops import batch_qp
    P, q, A, l, u, mask = _args(B=3, m=5, n=4)
    sol1 = batch_qp.solve_qp_batch_padded(P, q, A, l, u, mask)
    aot._drain_exports()
    aot._MEM.clear()
    sol2 = batch_qp.solve_qp_batch_padded(P, q, A, l, u, mask)
    monkeypatch.setattr(aot, "_ENABLED", False)
    sol3 = batch_qp.solve_qp_batch_padded(P, q, A, l, u, mask)
    np.testing.assert_allclose(sol1.x, sol2.x, atol=1e-12)
    np.testing.assert_allclose(sol1.x, sol3.x, atol=1e-12)
    np.testing.assert_array_equal(sol1.status, sol2.status)
    np.testing.assert_array_equal(sol1.status, sol3.status)


def test_static_kwargs_stay_hashable_and_keyed_by_value(fresh_cache):
    """jit-static kwargs (check_every, banded_k) must NOT be normalized to
    0-d arrays (unhashable -> live jit raises); their VALUES select
    different baked programs, so the cache key must differ by value and
    the exported artifact must be called with dynamic inputs only."""
    aot = fresh_cache
    from qpn_tpu.ops import batch_qp
    args = _args()
    # crashes before the fix: np.asarray(13) as a static argname value
    out1 = aot.call_aot("static_probe", batch_qp.solve_qp_batch, *args,
                        check_every=13)
    assert np.isfinite(np.asarray(out1.x)).all()
    kA = aot._key("static_probe", args, {}, {"check_every": 13})
    kB = aot._key("static_probe", args, {}, {"check_every": 25})
    assert kA != kB
    # export + reload round trip with the static baked
    aot._drain_exports()
    aot._MEM.clear()
    out2 = aot.call_aot("static_probe", batch_qp.solve_qp_batch, *args,
                        check_every=13)
    np.testing.assert_allclose(np.asarray(out2.x), np.asarray(out1.x),
                               atol=1e-12)
