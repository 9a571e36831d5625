"""Multi-chip equilibrium kernels: sharded batched AVI solves + collective
piece pruning.

Design (SURVEY.md §2.3): the reference is fully serial; the TPU framework's
scaling axes are

* scenario batches (dp): independent QPNet instances solve as one sharded
  vmapped kernel — computation follows data, XLA partitions the batch axis
  across the mesh with zero communication in the inner Newton loop;
* branch/piece batches (ep/tp): piece dedup ("remove_subsets",
  sets.jl:889-905) needs all-pairs information — each device holds a shard of
  pieces and `all_gather`s the rest, reducing keep-masks with deterministic
  order-based tie-breaks (the reference's serial tie-break, which its own
  threading bug note demands);
* global convergence flags reduce with `psum` (cross-scenario means).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.avi import _newton_solve
from .mesh import scenario_sharding


def _avi_vmap(M, q, l, u, z0, mask, tol, max_iter):
    fn = functools.partial(_newton_solve, tol=tol, max_iter=max_iter)
    return jax.vmap(lambda M_, q_, l_, u_, z_, vm: fn(M_, q_, l_, u_, z_,
                                                      var_mask=vm))(
        M, q, l, u, z0, mask)


def sharded_avi_solve(mesh: Mesh, M, q, l, u, z0, mask, tol=1e-8,
                      max_iter=840):
    """Solve a scenario batch of AVIs with the batch axis sharded over the
    whole mesh.  Inputs are host numpy; returns AVIResult on device."""
    sh = scenario_sharding(mesh)
    put = lambda x: jax.device_put(jnp.asarray(x), sh)
    fn = jax.jit(functools.partial(_avi_vmap, tol=tol, max_iter=max_iter))
    return fn(put(M), put(q), put(l), put(u), put(z0), put(mask))


def sharded_containment_prune(mesh: Mesh, act, resid):
    """Deterministic piece-dedup keep-mask with collectives.

    ``act``  (B, k): quantized active-set signature per piece.
    ``resid`` (B,):  quality score (lower is better).

    Piece i is dropped iff an equivalent piece j (same signature) exists with
    (resid_j, j) < (resid_i, i) lexicographically — the order-based tie-break
    that keeps exactly one of each duplicate group, independent of sharding
    (the property the reference's threading bug violated).  Each device holds
    a shard of pieces and all_gathers the rest."""
    B = act.shape[0]
    sh = scenario_sharding(mesh)

    def local(act_s, resid_s, idx_s):
        act_all = jax.lax.all_gather(act_s, ("scenario", "branch"),
                                     tiled=True)
        resid_all = jax.lax.all_gather(resid_s, ("scenario", "branch"),
                                       tiled=True)
        idx_all = jax.lax.all_gather(idx_s, ("scenario", "branch"),
                                     tiled=True)
        same = jnp.all(act_s[:, None, :] == act_all[None, :, :], axis=-1)
        better = (resid_all[None, :] < resid_s[:, None] - 1e-12) | (
            jnp.isclose(resid_all[None, :], resid_s[:, None], atol=1e-12)
            & (idx_all[None, :] < idx_s[:, None]))
        dominated = jnp.any(same & better, axis=1)
        return ~dominated

    keep = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(("scenario", "branch")), P(("scenario", "branch")),
                  P(("scenario", "branch"))),
        out_specs=P(("scenario", "branch"))))(
            jax.device_put(jnp.asarray(act), sh),
            jax.device_put(jnp.asarray(resid), sh),
            jax.device_put(jnp.arange(B), sh))
    return keep


def equilibrium_superstep(mesh: Mesh, batch, tol=1e-8, max_iter=840):
    """One full sharded equilibrium iteration — the framework's "training
    step" analogue, exercised by __graft_entry__.dryrun_multichip.

    1. scenario-sharded batched AVI Newton solve        (dp)
    2. global convergence fraction                      (psum)
    3. active-set signatures per scenario solution
    4. collective duplicate-piece prune                 (all_gather, ep/tp)
    """
    res = sharded_avi_solve(mesh, batch["M"], batch["q"], batch["l"],
                            batch["u"], batch["z0"], batch["mask"],
                            tol=tol, max_iter=max_iter)
    z = res.z
    frac = jnp.mean(res.converged.astype(jnp.float64))
    l = jnp.asarray(batch["l"])
    u = jnp.asarray(batch["u"])
    lq = jnp.where(jnp.isfinite(l), l, -1e20)
    uq = jnp.where(jnp.isfinite(u), u, 1e20)
    at_l = (jnp.abs(z - lq) < 1e-6)
    at_u = (jnp.abs(z - uq) < 1e-6)
    act = (at_l.astype(jnp.int32) + 2 * at_u.astype(jnp.int32))
    keep = sharded_containment_prune(mesh, np.asarray(act),
                                     np.asarray(res.resid))
    return dict(z=z, resid=res.resid, converged_frac=frac, keep=keep)
