"""Pallas-fused batched Lemke pivot loop (TPU kernel for the hot engine).

The XLA route (ops/lemke.py, ``vmap(_lemke_single)``) expresses each pivot
as a stream of small HLO ops inside a ``lax.while_loop``; on TPU every
per-lane dynamic row/column selection lowers to a gather and the tableau
makes a full HBM round-trip per op, so a 60–80-pivot solve is dominated by
per-iteration latency, not arithmetic (BASELINE.md: MFU ~2e-5; "further
wins must come from kernel fusion").

This module fuses the ENTIRE pivot loop into one Pallas kernel:

* the batch is tiled over the grid; each program keeps its lanes' tableaus
  ``(TB, n, 3n+2)`` resident in VMEM for the whole almost-complementary
  path — zero HBM traffic between pivots;
* all per-lane dynamic indexing (entering column, pivot row, basis
  bookkeeping) is rewritten as one-hot masked reductions over the tiled
  tableau — VPU-friendly, no TPU gathers;
* lanes advance in lockstep with per-lane done masks, exactly like the XLA
  route, so the two engines follow the same pivot path (same covering
  rule, same lexicographic tie-break, same status discipline).

The kernel is the f32 pivot tier of the mixed-precision pattern
(BASELINE.md round-2): pivot the path in f32, then land machine-precision
values by refactorizing the terminal complementary basis against the
original f64 data on host (``lemke.refactor_batch_np``).  Reference
semantics: PATH's pivoting core (``/root/reference/src/avi.jl:63-77``;
prior art ``deprecated/avi_scratch.jl:17-134``).

CPU correctness testing uses ``interpret=True`` (tests/test_lemke_pallas.py);
the production route gates on the TPU backend (config.lemke_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .lemke import (LEMKE_MAX, LEMKE_RAY, LEMKE_SINGULAR, LEMKE_SUCCESS,
                    _lemke_setup)

_INF = np.inf


def _pick_tile(B: int, n: int, W: int, itemsize: int = 4,
               budget_bytes: int = 4 << 20) -> int:
    """Largest power-of-two lane tile whose tableau fits the VMEM budget
    (~4MB leaves headroom for the carry copies Mosaic keeps live)."""
    tb = 1
    while tb < B and 2 * tb * n * W * itemsize <= budget_bytes:
        tb *= 2
    return min(tb, B)


def _onehot_eq(iota, idx):
    """(TB, K) bool mask: position == per-lane index (idx: (TB, 1))."""
    return iota == idx


def _gather(arr, onehot, zero):
    """Per-lane scalar gather as a masked reduction: arr (TB,K) -> (TB,1)."""
    return jnp.sum(jnp.where(onehot, arr, zero), axis=1, keepdims=True)


def _argtrue(mask, iota_n, n):
    """Index of the first True per lane (n when none): (TB, n) -> (TB, 1)."""
    return jnp.min(jnp.where(mask, iota_n, n), axis=1, keepdims=True)


def _make_kernel(n: int, max_pivots: int, tol: float, piv_tol: float):
    W = 3 * n + 2
    W1 = 3 * n + 1
    T_ID = 3 * n

    def kernel(T_ref, basis_ref, val_ref, blb_ref, bub_ref, vlb_ref,
               vub_ref, leff_ref, ueff_ref, ent_ref, dir_ref, ev_ref,
               st_ref, xB_out, basis_out, val_out, piv_out, st_out):
        TB = T_ref.shape[0]
        dt = T_ref.dtype
        inf = jnp.asarray(_INF, dt)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TB, n), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
        iota_w1 = iota_w[:, :W1]

        vlb = vlb_ref[...]
        vub = vub_ref[...]
        leff = leff_ref[...]
        ueff = ueff_ref[...]

        def cond(c):
            _T, _b, _v, _bl, _bu, _e, _d, _ev, _p, st, kg = c
            return (kg < max_pivots) & jnp.any(st == 0)

        def body(c):
            T, basis, val, blb, bub, ent, edir, ev, piv, st, kg = c
            active = st == 0                              # (TB, 1)

            # entering variable temporarily carries its start value
            oh_e1 = _onehot_eq(iota_w1, ent)              # (TB, W1)
            val_i = jnp.where(oh_e1 & active, ev, val)

            # basic values: rhs − T[:, :, :W1] @ nonbasic values
            xB = T[:, :, W - 1] - jnp.sum(
                T[:, :, :W1] * val_i[:, None, :], axis=2)  # (TB, n)

            # entering column and ratio test
            oh_ew = _onehot_eq(iota_w, ent)               # (TB, W)
            colT = jnp.sum(jnp.where(oh_ew[:, None, :], T, 0.0), axis=2)
            d = edir * colT                               # (TB, n)
            theta = jnp.where(
                d > piv_tol, (xB - blb) / jnp.where(d > piv_tol, d, 1.0),
                jnp.where(d < -piv_tol,
                          (xB - bub) / jnp.where(d < -piv_tol, d, 1.0),
                          inf))
            theta = jnp.maximum(jnp.where(jnp.isnan(theta), inf, theta), 0.0)
            ent_lb = _gather(vlb, oh_e1, 0.0)
            ent_ub = _gather(vub, oh_e1, 0.0)
            theta_e = jnp.where(edir > 0, ent_ub - ev, ev - ent_lb)
            tstar = jnp.min(theta, axis=1, keepdims=True)

            is_ray = ~jnp.isfinite(tstar) & ~jnp.isfinite(theta_e)
            do_flip = ~is_ray & (theta_e <= tstar)

            # ---- bound flip branch (no basis change) ----------------------
            i_e = ent % n
            flip_newval = jnp.where(edir > 0, ent_ub, ent_lb)
            flip_entering = jnp.where(edir > 0, 2 * n + i_e, n + i_e)

            # ---- pivot row selection --------------------------------------
            tie = theta <= tstar + tol * (1.0 + jnp.abs(tstar))
            t_row = basis == T_ID                         # (TB, n)
            pick_t = jnp.any(tie & t_row, axis=1, keepdims=True)
            safe_d = jnp.where(jnp.abs(d) > piv_tol, d, 1.0)

            # lexicographic refinement over the −B⁻¹ (u-column) block;
            # early-exit: the typical pivot has a unique minimum ratio
            def lex_cond(lc):
                kk, cand, need = lc
                return (kk < n) & jnp.any(need)

            def lex_body(lc):
                kk, cand, need = lc
                col = jnp.sum(jnp.where(
                    _onehot_eq(iota_w, jnp.full((TB, 1), n, jnp.int32) + kk)
                    [:, None, :], T, 0.0), axis=2)        # T[:, :, n+kk]
                key = jnp.where(cand, -col / safe_d, inf)
                kmin = jnp.min(key, axis=1, keepdims=True)
                keep = cand & (key <= kmin + 1e-12 * (1.0 + jnp.abs(kmin)))
                cand = jnp.where(need, keep, cand)
                need = need & (jnp.sum(cand.astype(jnp.int32), axis=1,
                                       keepdims=True) > 1)
                return kk + 1, cand, need

            need0 = (active & ~pick_t & ~do_flip & ~is_ray
                     & (jnp.sum(tie.astype(jnp.int32), axis=1,
                                keepdims=True) > 1))
            _, cand, _ = jax.lax.while_loop(
                lex_cond, lex_body, (jnp.int32(0), tie, need0))
            jstar = jnp.where(pick_t, _argtrue(tie & t_row, iota_n, n),
                              _argtrue(cand, iota_n, n))
            oh_j = _onehot_eq(iota_n, jstar)              # (TB, n)
            piv_elt = _gather(colT, oh_j, 0.0)
            bad_piv = jnp.abs(piv_elt) < piv_tol

            exiting = _gather(basis, oh_j, 0).astype(jnp.int32)
            hit_lower = _gather(d, oh_j, 0.0) > 0
            oh_x1 = _onehot_eq(iota_w1, exiting)          # (TB, W1)
            exit_val = jnp.where(hit_lower, _gather(vlb, oh_x1, 0.0),
                                 _gather(vub, oh_x1, 0.0))

            # ---- rank-1 tableau update ------------------------------------
            pr = jnp.sum(T * oh_j[:, :, None].astype(dt),
                         axis=1) / piv_elt                # (TB, W)
            other = jnp.where(oh_j, 0.0, colT)
            T_piv = T - other[:, :, None] * pr[:, None, :]
            T_piv = jnp.where(oh_j[:, :, None], pr[:, None, :], T_piv)

            basis_piv = jnp.where(oh_j, ent, basis)
            val_piv = jnp.where(oh_x1, exit_val, val_i)
            val_piv = jnp.where(oh_e1, 0.0, val_piv)
            blb_piv = jnp.where(oh_j, ent_lb, blb)
            bub_piv = jnp.where(oh_j, ent_ub, bub)
            t_exits = exiting == T_ID

            # ---- Lemke rule: complement of the exiting variable drives ----
            i_x = exiting % n
            oh_ix = _onehot_eq(iota_n, i_x)
            l_i = _gather(leff, oh_ix, 0.0)
            u_i = _gather(ueff, oh_ix, 0.0)
            is_z = exiting < n
            is_u = (exiting >= n) & (exiting < 2 * n)
            at_l = jnp.abs(exit_val - l_i) <= jnp.abs(exit_val - u_i)
            nent = jnp.where(is_z, jnp.where(at_l, n + i_x, 2 * n + i_x),
                             i_x)
            ndir = jnp.where(is_z | is_u, jnp.asarray(1.0, dt),
                             jnp.asarray(-1.0, dt))
            nev = jnp.where(is_z, jnp.asarray(0.0, dt),
                            jnp.where(is_u, l_i, u_i))

            do_pivot = active & ~is_ray & ~do_flip & ~bad_piv
            upd_piv3 = (active & ~is_ray & ~do_flip
                        & ~bad_piv)[:, :, None]           # (TB,1,1)
            T = jnp.where(upd_piv3, T_piv, T)
            basis = jnp.where(do_pivot, basis_piv, basis)
            blb = jnp.where(do_pivot, blb_piv, blb)
            bub = jnp.where(do_pivot, bub_piv, bub)
            val_flip = jnp.where(oh_e1, flip_newval, val_i)
            val = jnp.where(do_pivot, val_piv,
                            jnp.where(active & do_flip, val_flip,
                                      jnp.where(active, val_i, val)))
            ent = jnp.where(do_pivot, nent,
                            jnp.where(active & do_flip, flip_entering, ent))
            edir = jnp.where(do_pivot, ndir,
                             jnp.where(active & do_flip,
                                       jnp.asarray(1.0, dt), edir))
            ev = jnp.where(do_pivot, nev,
                           jnp.where(active & do_flip,
                                     jnp.asarray(0.0, dt), ev))
            st = jnp.where(active & is_ray, LEMKE_RAY,
                           jnp.where(active & ~do_flip & bad_piv & ~is_ray,
                                     LEMKE_SINGULAR,
                                     jnp.where(do_pivot & t_exits,
                                               LEMKE_SUCCESS, st)))
            piv = piv + active.astype(jnp.int32)
            return (T, basis, val, blb, bub, ent, edir, ev, piv, st, kg + 1)

        c0 = (T_ref[...], basis_ref[...], val_ref[...], blb_ref[...],
              bub_ref[...], ent_ref[...], dir_ref[...], ev_ref[...],
              jnp.zeros_like(st_ref[...]), st_ref[...], jnp.int32(0))
        T, basis, val, _bl, _bu, ent, edir, ev, piv, st, _kg = \
            jax.lax.while_loop(cond, body, c0)
        st = jnp.where(st == 0, LEMKE_MAX, st)

        # terminal basic values from the final tableau (the f64 host
        # refactorization recomputes exact ones; this covers fallbacks)
        xB = T[:, :, W - 1] - jnp.sum(T[:, :, :W1] * val[:, None, :],
                                      axis=2)
        xB_out[...] = xB
        basis_out[...] = basis
        val_out[...] = val
        piv_out[...] = piv
        st_out[...] = st

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tol", "piv_tol", "max_pivots",
                                    "synth_scale", "cover", "interpret"))
def solve_lemke_batch_state_pallas(M, q, l, u, z0, var_mask, tol=1e-9,
                                   piv_tol=1e-11, max_pivots: int = 512,
                                   synth_scale=1e4, cover: str = "viol",
                                   interpret: bool = False):
    """Drop-in for :func:`lemke.solve_lemke_batch_state` backed by the fused
    Pallas pivot kernel.  Returns ``(z, status, pivots, basis, val)``.

    Setup (synthetic boxes, slack basis, covering pivot) and the final z
    extraction run as plain batched JAX outside the kernel; only the pivot
    loop — the latency-bound part — is fused.  The on-device QR terminal
    refactorization of the XLA route is intentionally omitted: every
    production caller lands exact values via the host f64 refactorization
    (``refactor_batch_np``), and uncertified lanes re-pivot in f64.
    """
    from jax.experimental import pallas as pl

    B, n = q.shape
    dt = q.dtype
    W = 3 * n + 2
    W1 = 3 * n + 1

    setup = jax.vmap(functools.partial(
        _lemke_setup, tol=tol, synth_scale=synth_scale, cover=cover))
    init = setup(M, q, l, u, z0, var_mask)

    solved = init.solved_at_start[:, None]
    T_in = jnp.where(solved[..., None], init.T0t, init.T1)
    basis_in = jnp.where(solved, init.basis0, init.basis1).astype(jnp.int32)
    blb_in = jnp.take_along_axis(init.var_lb, basis_in, axis=1)
    bub_in = jnp.take_along_axis(init.var_ub, basis_in, axis=1)

    TB = _pick_tile(B, n, W, np.dtype(dt).itemsize)
    while B % TB:                            # callers pad to powers of two
        TB //= 2
    grid = (B // TB,)

    kernel = _make_kernel(n, max_pivots, float(tol), float(piv_tol))

    def spec(shape):
        return pl.BlockSpec((TB,) + shape, lambda i: (i,) + (0,) * len(shape))

    def lane(a):
        return jnp.reshape(a, (B, 1))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec((n, W)), spec((n,)), spec((W1,)), spec((n,)),
                  spec((n,)), spec((W1,)), spec((W1,)), spec((n,)),
                  spec((n,)), spec((1,)), spec((1,)), spec((1,)),
                  spec((1,))],
        out_specs=[spec((n,)), spec((n,)), spec((W1,)), spec((1,)),
                   spec((1,))],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dt),            # xB
            jax.ShapeDtypeStruct((B, n), jnp.int32),     # basis
            jax.ShapeDtypeStruct((B, W1), dt),           # val
            jax.ShapeDtypeStruct((B, 1), jnp.int32),     # pivots
            jax.ShapeDtypeStruct((B, 1), jnp.int32),     # status
        ],
        interpret=interpret,
    )(T_in, basis_in, init.val0, blb_in, bub_in, init.var_lb, init.var_ub,
      init.l_eff, init.u_eff, lane(init.ent0).astype(jnp.int32),
      lane(init.dir0).astype(dt), lane(init.ev0).astype(dt),
      lane(init.status_init).astype(jnp.int32))
    xB, basis, val, piv, status = outs

    # z_i = basic row value where basic, nonbasic value otherwise
    in_basis = basis < n
    z_from_rows = jnp.sum(
        jnp.where(in_basis[:, :, None]
                  & (basis[:, :, None] == jnp.arange(n)[None, None, :]),
                  xB[:, :, None], 0.0), axis=1)
    covered = jnp.any(
        in_basis[:, :, None]
        & (basis[:, :, None] == jnp.arange(n)[None, None, :]), axis=1)
    z = jnp.where(covered, z_from_rows, val[:, :n])
    z = jnp.where(var_mask, z, 0.0)
    # +1 counts the covering pivot (t entering), matching the XLA engine
    piv = jnp.where(init.solved_at_start, 0, piv[:, 0] + 1)
    return z, status[:, 0], piv, basis, val
