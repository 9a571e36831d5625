"""Sequence-parallel (cyclic reduction) and ring-frontier tests."""

import numpy as np
import pytest

import jax

from qpn_tpu.ops import banded


def test_cyclic_reduction_matches_dense():
    for T, k in [(4, 3), (8, 2), (13, 4), (32, 3)]:
        A, B, C, b = banded.horizon_kkt_blocks(T, k,
                                               np.random.default_rng(T))
        x = np.asarray(banded.solve_block_tridiag(
            np.asarray(A), np.asarray(B), np.asarray(C), np.asarray(b)))
        M = banded.dense_from_blocks(A, B, C)
        x_ref = np.linalg.solve(M, b.reshape(-1)).reshape(T, k)
        assert np.allclose(x, x_ref, atol=1e-8), (T, k)


def test_cyclic_reduction_batched():
    rng = np.random.default_rng(0)
    batch = [banded.horizon_kkt_blocks(8, 3, rng) for _ in range(5)]
    A = np.stack([b[0] for b in batch])
    B = np.stack([b[1] for b in batch])
    C = np.stack([b[2] for b in batch])
    bb = np.stack([b[3] for b in batch])
    X = np.asarray(banded.solve_block_tridiag_batch(A, B, C, bb))
    for i in range(5):
        M = banded.dense_from_blocks(A[i], B[i], C[i])
        x_ref = np.linalg.solve(M, bb[i].reshape(-1)).reshape(8, 3)
        assert np.allclose(X[i], x_ref, atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_duplicate_mask():
    from qpn_tpu.parallel.mesh import make_mesh
    from qpn_tpu.parallel.ring import ring_duplicate_mask
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 5, size=(16, 3)).astype(np.int32)
    # candidates: half are copies of reference rows, half fresh
    cand = np.concatenate([ref[::2], 99 + np.arange(24).reshape(8, 3)
                           .astype(np.int32)])
    hit = np.asarray(ring_duplicate_mask(mesh, cand, ref))
    assert hit[:8].all()          # copies found somewhere in the ring
    assert not hit[8:].any()      # fresh signatures unmatched


def test_cr_factor_solve_matches_dense():
    """factor/solve split: one factorization, many RHS (the production ADMM
    reuse pattern), each matching the dense solve."""
    import jax.numpy as jnp
    from qpn_tpu.ops.banded import (cr_factor, cr_solve, dense_from_blocks,
                                    horizon_kkt_blocks)
    rng = np.random.default_rng(3)
    A, B, C, _ = horizon_kkt_blocks(16, 4, rng)
    fac = cr_factor(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C))
    M = dense_from_blocks(A, B, C)
    for _ in range(3):
        b = rng.standard_normal((16, 4))
        x = np.asarray(cr_solve(fac, jnp.asarray(b)))
        np.testing.assert_allclose(M @ x.flatten(), b.flatten(), atol=1e-8)


def test_banded_admm_matches_dense():
    """banded_k routes the ADMM x-update through cyclic reduction; results
    must match the dense-Cholesky route on trajectory-structured QPs."""
    from qpn_tpu.ops import batch_qp
    from qpn_tpu.ops.banded import dense_from_blocks, horizon_kkt_blocks
    rng = np.random.default_rng(5)
    T, k, B = 8, 4, 4
    n = T * k
    Ps, qs, As, ls, us = [], [], [], [], []
    for bi in range(B):
        A_, B_, C_, g = horizon_kkt_blocks(T, k, rng)
        Q = dense_from_blocks(A_, B_, C_)
        Q = 0.5 * (Q + Q.T) + 0.5 * np.eye(n)
        Ps.append(Q)
        qs.append(g.flatten())
        As.append(np.eye(n))
        ls.append(np.full(n, -2.0))
        us.append(np.full(n, 2.0))
    args = tuple(np.stack(a) for a in (Ps, qs, As, ls, us))
    mask = np.ones((B, n), dtype=bool)
    dense = batch_qp.solve_qp_batch(*args, mask)
    banded = batch_qp.solve_qp_batch(*args, mask, banded_k=k)
    assert np.all(np.asarray(banded.status) == batch_qp.SOLVED)
    np.testing.assert_allclose(np.asarray(banded.x), np.asarray(dense.x),
                               atol=1e-6)


def test_ring_fn_cached_and_multi_axis_rejected():
    """The jitted ring sweep must be reused across calls (jit caches on
    function identity — rebuilding the closure per call would recompile the
    shard_map every time), and >2-axis meshes must be rejected loudly (the
    rotation ring never crosses the third axis, so silent wrong answers)."""
    import pytest
    from jax.sharding import Mesh
    import jax
    from qpn_tpu.parallel.mesh import make_mesh
    from qpn_tpu.parallel import ring

    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 5, size=(16, 3)).astype(np.int32)
    cand = rng.integers(0, 5, size=(16, 3)).astype(np.int32)
    ring._ring_fn.cache_clear()
    ring.ring_duplicate_mask(mesh, cand, ref)
    ring.ring_duplicate_mask(mesh, cand + 1, ref + 1)
    info = ring._ring_fn.cache_info()
    assert info.misses == 1 and info.hits == 1

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh3 = Mesh(devs, ("a", "b", "c"))
    with pytest.raises(ValueError, match="1-D and 2-D"):
        ring.ring_duplicate_mask(mesh3, cand, ref)


def test_ring_prune_matches_all_gather_prune():
    """The ring-rotated prune must produce the SAME keep-mask as the
    all_gather prune (it replaces it above RING_PRUNE_THRESHOLD), including
    the strict lexicographic (quantized resid, index) tie-break."""
    from qpn_tpu.parallel.mesh import make_mesh
    from qpn_tpu.parallel.ring import ring_containment_prune
    from qpn_tpu.parallel.sharded import sharded_containment_prune
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    B, k = 64, 5
    act = rng.integers(0, 3, size=(B, k)).astype(np.int32)
    act[1] = act[0]                    # exact duplicate group
    act[10] = act[0]
    resid = rng.random(B)
    resid[1] = resid[0]                # tie inside the group -> index breaks
    keep_ag = np.asarray(sharded_containment_prune(mesh, act, resid))
    keep_ring = np.asarray(ring_containment_prune(mesh, act, resid))
    np.testing.assert_array_equal(keep_ring, keep_ag)
    # exactly one survivor per duplicate group
    group = [0, 1, 10]
    assert keep_ring[group].sum() == 1
