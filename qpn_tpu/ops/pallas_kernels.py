"""Pallas TPU kernels for the hot screening paths.

Numeric strategy: the equilibrium core needs f64 (PATH-parity tolerances down
to 1e-10), which the MXU does not execute natively — XLA emulates it.  The
*bulk* of the work, though, is screening: warm-starting AVI solves and
pre-filtering thousands of candidate pieces where 1e-3 accuracy decides.
Those run here as fused f32 Pallas kernels with everything VMEM-resident
(one grid program per batch element, matrices padded to lane width 128), and
only the survivors hit the f64 XLA path:

* :func:`eg_warmstart` — K fused extragradient steps on a batch of box AVIs
  (2 matvecs/step on the MXU, zero HBM traffic between steps).  Output seeds
  the f64 semismooth Newton.
* :func:`feasibility_screen` — K projected-subgradient steps on
  ``max violation of l ≤ Ax ≤ u``; returns the final witness and violation.
  ``violation ≤ margin`` proves the piece nonempty (witness in hand) without
  an exact LP; the rest fall through to the ε-inflation kernel.

On non-TPU backends the kernels run in Pallas interpret mode (same semantics,
used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANE = 128


def _interpret() -> bool:
    # honor the small-dispatch CPU override exactly like the lemke
    # dispatcher: Mosaic must never lower against a CPU placement
    from ..config import effective_backend
    return effective_backend() != "tpu"


def _pad_lane(n: int) -> int:
    return ((n + _LANE - 1) // _LANE) * _LANE


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


# --------------------------------------------------------------------------
#  extragradient warm start
# --------------------------------------------------------------------------

_EG_TILE = 16   # lanes per grid program: VMEM budget T·n²·4B must stay ≤ ~4MB


def _eg_kernel(M_ref, q_ref, l_ref, u_ref, z_ref, tau_ref, out_ref, *, steps):
    """One grid program advances a TILE of lanes together: each step is a
    batched matvec  F[t] = M[t] @ z[t]  on the MXU (grid programs run
    sequentially on the tensorcore, so per-lane programs would serialize)."""
    M = M_ref[...]            # (T, n, n)
    q = q_ref[...]            # (T, n)
    l = l_ref[...]
    u = u_ref[...]
    tau = tau_ref[...]        # (T, 1)
    z = z_ref[...]            # (T, n)

    def mv(Z):
        return jax.lax.dot_general(
            M, Z[:, :, None], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0]

    def body(i, z):
        F = mv(z) + q
        z_half = jnp.clip(z - tau * F, l, u)
        F_half = mv(z_half) + q
        return jnp.clip(z - tau * F_half, l, u)

    out_ref[...] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(steps), body, z)


@functools.partial(jax.jit, static_argnames=("steps",))
def _eg_call(M, q, l, u, z0, tau, *, steps):
    B, n, _ = M.shape
    T = _EG_TILE
    assert B % T == 0
    kern = functools.partial(_eg_kernel, steps=steps)
    return pl.pallas_call(
        kern,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, n, n),
                         lambda b: (b, jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
            pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
            pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
            pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
            pl.BlockSpec((T, 1), lambda b: (b, jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        interpret=_interpret(),
    )(M, q, l, u, z0, tau)


def _ruiz_np(M, iters=8):
    """Host-side complementarity-preserving Ruiz scaling (see ops/avi.py)."""
    B, n, _ = M.shape
    d = np.ones((B, n))
    e = np.ones((B, n))
    for _ in range(iters):
        Ms = np.abs(d[:, :, None] * M * e[:, None, :])
        r = np.clip(Ms.max(axis=2), 1e-8, 1e8)
        c = np.clip(Ms.max(axis=1), 1e-8, 1e8)
        d /= np.sqrt(r)
        e /= np.sqrt(c)
    return d, e


def eg_warmstart(M, q, l, u, z0, var_mask, steps: int = 200,
                 ruiz: bool = True):
    """Run `steps` fused f32 extragradient iterations on each box AVI in the
    batch; returns improved starting points (f64, original width).

    All `steps` iterations run inside ONE Pallas program per batch element
    (VMEM-resident M, 2 MXU matvecs/step) — per-step cost is orders of
    magnitude below a host-level while_loop iteration, so tens of thousands
    of steps are practical.  Ruiz pre-scaling keeps the step size healthy."""
    M = np.asarray(M, dtype=np.float64)
    B, n, _ = M.shape
    mask = np.asarray(var_mask, dtype=bool)
    q = np.asarray(q, dtype=np.float64)
    l = np.asarray(l, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    z0 = np.asarray(z0, dtype=np.float64)
    if ruiz:
        d_sc, e_sc = _ruiz_np(np.where(mask[:, :, None] & mask[:, None, :],
                                       M, np.eye(n)[None]))
        M = d_sc[:, :, None] * M * e_sc[:, None, :]
        q = d_sc * q
        l = np.where(np.isfinite(l), l / e_sc, l)
        u = np.where(np.isfinite(u), u / e_sc, u)
        z0 = z0 / e_sc
    np_ = _pad_lane(n)
    Bp = ((B + _EG_TILE - 1) // _EG_TILE) * _EG_TILE

    from ..config import CONFIG, effective_backend
    if (not _interpret() and effective_backend() == "tpu"
            and CONFIG.kernel_guard != "off"):
        # first-use subprocess validation (see utils/kernel_guard): an
        # unsafe signature degrades to the identity warm start — the caller
        # accepts the EG result per-lane only when it helps anyway
        from ..utils.kernel_guard import ensure_kernel_safe
        if not ensure_kernel_safe(
                "eg_warmstart", (Bp, np_, steps, "f32"),
                {"B": Bp, "n": np_, "steps": steps}):
            from ..utils.metrics import METRICS
            METRICS.bump("eg_warmstart_guard_demoted", 1)
            return np.where(mask, np.asarray(z0, dtype=np.float64)
                            * (e_sc if ruiz else 1.0), 0.0)

    Mp = np.zeros((Bp, np_, np_), dtype=np.float32)
    mm = mask[:, :, None] & mask[:, None, :]
    Mp[:B, :n, :n] = np.where(mm, M, 0.0)
    idx = np.arange(np_)
    # padded/masked vars: identity row with l=u=0 pins them
    diag_mask = np.ones((Bp, np_), dtype=bool)
    diag_mask[:B, :n] = ~mask
    Mp[:, idx, idx] = np.where(diag_mask, 1.0, Mp[:, idx, idx])

    BIG = np.float32(3e38)
    lraw = np.zeros((Bp, np_))
    uraw = np.zeros((Bp, np_))
    lraw[:B, :n] = np.where(mask, l, 0.0)
    uraw[:B, :n] = np.where(mask, u, 0.0)
    lb = np.where(np.isfinite(lraw), lraw, -BIG).astype(np.float32)
    ub = np.where(np.isfinite(uraw), uraw, BIG).astype(np.float32)
    lb[:, n:] = 0.0
    ub[:, n:] = 0.0
    lb[:B, :n] = np.where(mask, lb[:B, :n], 0.0)
    ub[:B, :n] = np.where(mask, ub[:B, :n], 0.0)

    qb = np.zeros((Bp, np_), dtype=np.float32)
    qb[:B, :n] = np.where(mask, q, 0.0)
    z0p = np.zeros((Bp, np_), dtype=np.float32)
    z0p[:B, :n] = np.where(mask, z0, 0.0)
    Linf = np.max(np.sum(np.abs(Mp), axis=2), axis=1)
    tau = (0.9 / (1.0 + Linf)).astype(np.float32).reshape(Bp, 1)

    out = _eg_call(Mp, qb, lb, ub, z0p, tau, steps=steps)
    z = np.asarray(out)[:B, :n].astype(np.float64)
    if ruiz:
        z = z * e_sc
    return np.where(mask, z, 0.0)


# --------------------------------------------------------------------------
#  feasibility screen
# --------------------------------------------------------------------------

_SCREEN_TILE = 8   # lanes per grid program (grid programs serialize on the
                   # tensorcore — same tiling rationale as _EG_TILE)


def _screen_kernel(A_ref, l_ref, u_ref, x_ref, out_x_ref, out_v_ref, *,
                   steps, lr):
    A = A_ref[...]            # (T, m, n)
    l = l_ref[...]            # (T, m)
    u = u_ref[...]
    x = x_ref[...]            # (T, n)

    def viol(x):
        ax = jax.lax.dot_general(
            A, x[:, :, None], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0]     # (T, m)
        return jnp.maximum(l - ax, 0.0) + jnp.minimum(u - ax, 0.0)

    def body(i, x):
        v = viol(x)           # positive where below l, negative where above u
        g = jax.lax.dot_general(
            v[:, None, :], A, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]     # (T, n)
        return x + lr * g

    x = jax.lax.fori_loop(jnp.int32(0), jnp.int32(steps), body, x)
    v = viol(x)
    out_x_ref[...] = x
    out_v_ref[...] = jnp.max(jnp.abs(v), axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("steps", "lr"))
def _screen_call(A, l, u, x0, *, steps, lr):
    B, m, n = A.shape
    T = _SCREEN_TILE
    assert B % T == 0, "caller pads the batch to the screen tile"
    kern = functools.partial(_screen_kernel, steps=steps, lr=lr)
    return pl.pallas_call(
        kern,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, m, n),
                         lambda b: (b, jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((T, m), lambda b: (b, jnp.int32(0))),
            pl.BlockSpec((T, m), lambda b: (b, jnp.int32(0))),
            pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
        ],
        out_specs=(pl.BlockSpec((T, n), lambda b: (b, jnp.int32(0))),
                   pl.BlockSpec((T, 1), lambda b: (b, jnp.int32(0)))),
        out_shape=(jax.ShapeDtypeStruct((B, n), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)),
        interpret=_interpret(),
    )(A, l, u, x0)


def feasibility_screen(polys, x0=None, steps: int = 120, lr: float = 0.05,
                       margin: float = 1e-3):
    """Cheap f32 feasibility witnesses for a batch of polys (same dim).

    Returns (witnessed: bool array, witnesses: list).  ``witnessed[i]`` True
    means a point with max violation ≤ margin was found — the poly is
    certainly nonempty (up to margin) and the exact LP can be skipped."""
    B = len(polys)
    if B == 0:
        return np.zeros(0, dtype=bool), []
    n = polys[0].dim
    m_max = max(max(p.m, 1) for p in polys)
    mp = _pad8(m_max)
    np_ = _pad_lane(n)
    Bp = ((B + _SCREEN_TILE - 1) // _SCREEN_TILE) * _SCREEN_TILE
    BIG = np.float32(3e38)
    A = np.zeros((Bp, mp, np_), dtype=np.float32)
    l = np.full((Bp, mp), -BIG, dtype=np.float32)
    u = np.full((Bp, mp), BIG, dtype=np.float32)
    for i, p in enumerate(polys):
        A[i, :p.m, :n] = p.A
        l[i, :p.m] = np.where(np.isfinite(p.l), p.l, -BIG)
        u[i, :p.m] = np.where(np.isfinite(p.u), p.u, BIG)
    x = np.zeros((Bp, np_), dtype=np.float32)
    if x0 is not None:
        x[:B, :n] = np.asarray(x0, dtype=np.float32)
    # row-normalize for a uniform step size
    norms = np.maximum(np.linalg.norm(A, axis=2), 1e-6)     # (Bp, mp)
    A_n = A / norms[:, :, None]
    l_fin = np.clip(l, -1e30, 1e30) / norms
    u_fin = np.clip(u, -1e30, 1e30) / norms
    l_n = np.where(l <= -BIG / 2, l, l_fin).astype(np.float32)
    u_n = np.where(u >= BIG / 2, u, u_fin).astype(np.float32)
    xs, vs = _screen_call(A_n, l_n, u_n, x, steps=steps, lr=lr)
    xs = np.asarray(xs)[:B, :n].astype(np.float64)
    vs = np.asarray(vs)[:B, 0]
    witnessed = np.zeros(B, dtype=bool)
    witnesses = [None] * B
    for i, p in enumerate(polys):
        # the host verification must use the caller's margin EXACTLY — a
        # looser window would certify witnesses the exact LP would reject
        if vs[i] <= margin and p.closure().contains(xs[i], tol=margin):
            witnessed[i] = True
            witnesses[i] = xs[i]
    return witnessed, witnesses
