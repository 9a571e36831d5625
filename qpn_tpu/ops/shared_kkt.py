"""Shared-matrix scenario-ensemble AVI solver — the MXU GEMM route.

Scenario uncertainty ensembles (robust_avoid's T-step trajectory class,
reference `/root/reference/examples/deprecated/robust_avoid.jl:1-13`) share
ONE KKT matrix M across all S scenarios: the uncertainty enters only through
``q = N w + o`` and the separation offsets in the bounds
(`models/robust_avoid.py` `scenario_batch_gavis`).  The reference solves each
scenario's AVI one at a time in PATH; the batched Lemke tableau route
(`ops/lemke.py`) replicates M per lane, which at trajectory scale
(n = 608 at T=8, 1216 at T=16) is a (S, n, 3n+2) tableau that no longer fits
anywhere useful and whose rank-1 pivot updates are HBM-bandwidth bound.

This module instead treats the ensemble as ONE matrix problem:

1. **f32 extragradient pre-pass as (S, n) GEMMs** against the single shared
   M — Korpelevich EG converges on monotone AVIs (the stacked KKT systems are
   skew + PSD by construction) and every iteration is two
   ``(S, n) @ (n, n)`` matmuls: MXU work with arithmetic intensity ~S,
   instead of the per-lane matvecs of the generic solver that stream S copies
   of M from HBM.  The pre-pass does not need a tight residual — only a
   stable active set.
2. **Active-set extraction** from the natural map: ``s = z − (Mz+q)``;
   rows with ``s ≤ l`` are at the lower bound, ``s ≥ u`` at the upper, the
   rest free (the projection argument makes this the consistent primal/dual
   classification).
3. **Terminal basis solve on device, f32 LU + f64 iterative refinement**:
   each lane's complementary-basis system (free rows of M, identity rows for
   bound variables) is factored once in f32 on the MXU and refined against
   the ORIGINAL f64 data — residuals computed as one shared-M f64 host GEMM —
   so machine-precision solutions come out of f32 factorizations (classic
   mixed-precision refinement; the same pattern round 2 used for the Lemke
   terminal basis, now batched on-chip).
4. **f64 natural-residual audit** gates every lane; failing lanes retry with
   a flipped classification band, then an exact host f64 solve, then the
   generic adaptive solver — the output contract matches
   ``solve_kkt_avi_batch`` exactly (audited z, conv flags).

The analytic FLOP ledger of steps 1–3 is returned through ``stats`` so the
bench can report achieved FLOP/s and MFU against the f32 MXU peak.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

_DEBUG = bool(os.environ.get("QPN_SHARED_DEBUG"))


def _dbg(msg):
    if _DEBUG:
        print(f"[shared_kkt +{time.perf_counter() - _T0:.2f}s] {msg}",
              flush=True)


_T0 = time.perf_counter()

from .avi import AVIResult
from ..utils.metrics import METRICS

_PREC = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
#  EG pre-pass: chunked fori of (S,n)@(n,n) GEMMs
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("steps",))
def _eg_chunk(Mt, Q, L, U, Z, tau, steps, band, prev_l, prev_u):
    """``steps`` extragradient iterations on the whole ensemble.

    Mt = M.T as f32 (so lanes are rows: F = Z @ Mt + Q).  Returns the
    advanced iterate, the per-lane natural residual ‖z − Π(z − F)‖∞, the
    active-set classification from the natural map s = z − F (the terminal
    solve's stopping signal), and how many labels changed vs the previous
    chunk — all computed ON DEVICE so the driver's stability loop costs no
    host GEMMs."""

    def body(_, Z):
        F = jnp.dot(Z, Mt, precision=_PREC) + Q
        Zh = jnp.clip(Z - tau * F, L, U)
        Fh = jnp.dot(Zh, Mt, precision=_PREC) + Q
        return jnp.clip(Z - tau * Fh, L, U)

    Z = jax.lax.fori_loop(0, steps, body, Z)
    F = jnp.dot(Z, Mt, precision=_PREC) + Q
    r = jnp.max(jnp.abs(Z - jnp.clip(Z - F, L, U)), axis=1)
    s = Z - F
    at_l = jnp.isfinite(L) & (s <= L + band)
    at_u = jnp.isfinite(U) & (s >= U - band) & ~at_l
    changed = jnp.sum((at_l != prev_l) | (at_u != prev_u))
    return Z, r, at_l, at_u, changed


@functools.partial(jax.jit, static_argnames=("refines",))
def _basis_solve(M32, free, bval, Qq, refines):
    """Per-lane complementary-basis solve with f32 LU + refinement.

    The (C, n, n) basis matrices are materialized ON DEVICE from the one
    shared (n, n) matrix — free rows from M, bound rows identity — so the
    host ships only masks and vectors, never O(C·n²) tensors (through the
    axon tunnel that transfer would dominate the whole solve).  Refinement
    residuals here are against the f32 data (the f64 outer refinement happens
    on host against the original data); a couple of inner passes mop up LU
    rounding so the host pass usually needs one iteration.
    """
    n = M32.shape[0]
    A = jnp.where(free[:, :, None], M32[None], jnp.eye(n, dtype=M32.dtype))
    rhs0 = jnp.where(free, -Qq, bval)
    negMt = -M32.T
    lu, piv = jax.vmap(jax.scipy.linalg.lu_factor)(A)
    z = jax.vmap(jax.scipy.linalg.lu_solve)((lu, piv), rhs0)

    def refine(_, z):
        Fz = jnp.dot(z, negMt, precision=_PREC) - Qq     # −(Mz+q) per lane
        r = jnp.where(free, Fz, bval - z)
        dz = jax.vmap(jax.scipy.linalg.lu_solve)((lu, piv), r)
        return z + dz

    z = jax.lax.fori_loop(0, refines, refine, z)
    return z, (lu, piv)


@jax.jit
def _refine_step(lu, piv, r):
    return jax.vmap(jax.scipy.linalg.lu_solve)((lu, piv), r)


def _classify(Z, F, l, u, band):
    """Active set from the natural map s = z − F (see module docstring)."""
    s = Z - F
    at_l = np.isfinite(l) & (s <= l + band)
    at_u = np.isfinite(u) & (s >= u - band) & ~at_l
    return at_l, at_u


def _nat_resid_shared(M0, q, l, u, Z):
    F = Z @ M0.T + q
    with np.errstate(invalid="ignore"):
        proj = np.clip(Z - F, l, u)
    return np.abs(Z - proj).max(axis=1), F


def solve_kkt_avi_shared(M, q, l, u, var_mask, tol: float = 1e-8, *,
                         eg_budget: int = 60000, eg_chunk: int = 2000,
                         lane_chunk: int = 512, stats: Optional[dict] = None
                         ) -> AVIResult:
    """Solve a shared-matrix AVI ensemble ``M z + q ⟂ l ≤ z ≤ u``.

    ``M`` may be (n, n) or (S, n, n) with identical lanes (caller asserts);
    q, l, u are (S, n).  Requires an all-true ``var_mask`` (scenario
    ensembles are emitted unpadded); callers with padding use the generic
    route.  Returns an audited :class:`AVIResult`; ``stats`` (if given) is
    filled with the device FLOP ledger and phase iteration counts.
    """
    q = np.asarray(q, dtype=np.float64)
    S, n = q.shape
    M0 = np.asarray(M, dtype=np.float64)
    if M0.ndim == 3:
        M0 = M0[0]
    l64 = np.asarray(l, dtype=np.float64)
    u64 = np.asarray(u, dtype=np.float64)
    if var_mask is not None and not np.asarray(var_mask).all():
        raise ValueError("shared route requires an unpadded ensemble")

    # EG step from the true spectral norm (power iteration on M'M — ~30 n²
    # host flops, negligible): the √(‖M‖₁‖M‖∞) bound overestimates σ_max on
    # these KKT matrices by 2-3×, which costs the same factor in iterations
    v = np.ones(n) / np.sqrt(n)
    for _ in range(30):
        w = M0.T @ (M0 @ v)
        nw = np.linalg.norm(w)
        if nw == 0.0:
            break
        v = w / nw
    Lip = float(np.sqrt(max(np.linalg.norm(M0.T @ (M0 @ v)), 1e-24)))
    tau = np.float32(0.9 / max(Lip, 1e-12))

    f32 = np.float32
    Mt32 = jnp.asarray(M0.T, dtype=f32)
    Q32 = jnp.asarray(q, dtype=f32)
    L32 = jnp.asarray(l64, dtype=f32)
    U32 = jnp.asarray(u64, dtype=f32)
    Z = jnp.clip(jnp.zeros((S, n), dtype=f32), L32, U32)

    scale = 1.0 + float(np.abs(q).max())
    switch = max(tol, 1e-5 * scale)
    band32 = np.float32(1e-4 * scale)
    eg_iters = 0
    prev_l = jnp.zeros((S, n), dtype=bool)
    prev_u = jnp.zeros((S, n), dtype=bool)
    first = True
    while eg_iters < eg_budget:
        Z, r, prev_l, prev_u, changed = _eg_chunk(
            Mt32, Q32, L32, U32, Z, tau, eg_chunk, band32, prev_l, prev_u)
        eg_iters += eg_chunk
        r_host = np.asarray(r)
        _dbg(f"eg {eg_iters} iters, max resid {r_host.max():.3e} "
             f"(switch {switch:.1e}, labels changed {int(changed)})")
        if float(r_host.max()) < switch:
            break
        # active-set stability is the real stopping criterion: the terminal
        # solve only needs the right classification, not a tight residual
        if not first and int(changed) == 0:
            break
        first = False

    Z64 = np.asarray(Z, dtype=np.float64)
    _, F64 = _nat_resid_shared(M0, q, l64, u64, Z64)

    z_out = Z64.copy()
    done = np.zeros(S, dtype=bool)
    lu_factored = 0
    refine_gemms = 0
    host_solves = 0

    # finite stand-ins for ±inf bounds in bval (never selected: an infinite
    # bound can't be active)
    l_fin = np.where(np.isfinite(l64), l64, 0.0)
    u_fin = np.where(np.isfinite(u64), u64, 0.0)

    for band in (1e-4 * scale, 1e-2 * scale):
        todo = np.flatnonzero(~done)
        if todo.size == 0:
            break
        at_l, at_u = _classify(Z64[todo], F64[todo], l64[todo], u64[todo],
                               band)
        free = ~(at_l | at_u)
        bval = np.where(at_l, l_fin[todo], u_fin[todo])
        for ofs in range(0, todo.size, lane_chunk):
            sel = todo[ofs:ofs + lane_chunk]
            fr = free[ofs:ofs + lane_chunk]
            bv = bval[ofs:ofs + lane_chunk]
            C = sel.size
            zc, (lu_d, piv_d) = _basis_solve(
                jnp.asarray(M0, dtype=np.float32), jnp.asarray(fr),
                jnp.asarray(bv, dtype=np.float32),
                jnp.asarray(q[sel], dtype=np.float32), 2)
            lu_factored += C
            refine_gemms += 2 * C
            zc = np.asarray(zc, dtype=np.float64)
            # host f64 refinement against the ORIGINAL data (shared-M GEMM),
            # correction solves reuse the device f32 factor.  Lanes whose
            # factor is singular (degenerate classification) produce
            # non-finite corrections — freeze THOSE lanes and keep refining
            # the rest; a whole-chunk bail-out here would strand every good
            # lane at f32 accuracy and fail the 1e-8 audit across the board.
            for _ in range(3):
                Fc = zc @ M0.T + q[sel]
                r = np.where(fr, -Fc, bv - zc)
                lane_r = np.abs(r).max(axis=1)
                if lane_r.max() < 1e-12 * scale:
                    break
                dz = np.asarray(_refine_step(
                    lu_d, piv_d, jnp.asarray(r, dtype=np.float32)),
                    dtype=np.float64)
                apply = (np.isfinite(dz).all(axis=1)
                         & (lane_r >= 1e-12 * scale))
                if not apply.any():
                    break
                zc = np.where(apply[:, None], zc + dz, zc)
                refine_gemms += int(apply.sum())
            rn, _ = _nat_resid_shared(M0, q[sel], l64[sel], u64[sel], zc)
            ok = np.isfinite(rn) & (rn <= tol)
            z_out[sel[ok]] = zc[ok]
            done[sel[ok]] = True
            _dbg(f"basis chunk band={band:.1e} lanes={C} ok={int(ok.sum())}")

    # exact host f64 solve for lanes whose f32 factorization couldn't be
    # refined (ill-conditioned basis) — same classification, LAPACK f64
    todo = np.flatnonzero(~done)
    if todo.size:
        at_l, at_u = _classify(Z64[todo], F64[todo], l64[todo], u64[todo],
                               1e-4 * scale)
        free = ~(at_l | at_u)
        bval = np.where(at_l, l_fin[todo], u_fin[todo])
        A = np.where(free[:, :, None], M0[None], np.eye(n)[None])
        rhs = np.where(free, -q[todo], bval)
        try:
            zc = np.linalg.solve(A, rhs[..., None])[..., 0]
        except np.linalg.LinAlgError:
            zc = np.stack([np.linalg.lstsq(A[i], rhs[i], rcond=None)[0]
                           for i in range(todo.size)])
        host_solves += todo.size
        rn, _ = _nat_resid_shared(M0, q[todo], l64[todo], u64[todo], zc)
        ok = np.isfinite(rn) & (rn <= tol)
        z_out[todo[ok]] = zc[ok]
        done[todo[ok]] = True

    # last resort: the generic adaptive per-lane solver (audited like
    # everything else); scenario stragglers here are genuinely hard lanes
    todo = np.flatnonzero(~done)
    if todo.size:
        METRICS.bump("shared_kkt_generic_escalation", todo.size)
        from .avi import solve_avi_batch_adaptive
        Mrep = np.repeat(M0[None], todo.size, axis=0)
        res = solve_avi_batch_adaptive(
            Mrep, q[todo], l64[todo], u64[todo], Z64[todo],
            np.ones((todo.size, n), dtype=bool), tol=tol)
        zg = np.asarray(res.z)
        rg = np.asarray(res.resid)
        ok = np.asarray(res.converged) & np.isfinite(rg)
        z_out[todo[ok]] = zg[ok]
        done[todo[ok]] = True

    resid, _ = _nat_resid_shared(M0, q, l64, u64, z_out)
    converged = resid <= tol
    METRICS.bump("shared_kkt_solves", int(converged.sum()))

    if stats is not None:
        # device FLOP ledger (host f64 GEMMs and LAPACK solves excluded —
        # MFU reads as useful work extracted from the CHIP)
        gemm = 2.0 * S * n * n
        eg_fl = eg_iters * 2.0 * gemm + (eg_iters / eg_chunk + 1) * gemm
        lu_fl = lu_factored * (2.0 / 3.0) * n ** 3
        tri_fl = (lu_factored + refine_gemms) * 2.0 * n * n * 2.0
        stats.update(dict(
            eg_iters=eg_iters, lu_factored=lu_factored,
            refine_gemms=refine_gemms, host_solves=host_solves,
            device_flops=eg_fl + lu_fl + tri_fl,
            device_bytes=4.0 * (eg_iters * (n * n + 3.0 * S * n)
                                + lu_factored * 2.0 * n * n),
        ))

    iters = np.full(S, eg_iters, dtype=np.int64)
    return AVIResult(z=z_out, resid=resid, iters=iters, converged=converged)
