"""Killable-subprocess worker for kernel_guard: run one tiny representative
instance of a Pallas/Mosaic kernel signature on the real device and exit 0.

Invoked as ``python -m qpn_tpu.utils.kernel_probe_worker <tag> <params json>``.
A device kernel fault kills THIS process; the parent records a tombstone.
"""

from __future__ import annotations

import json
import sys


def _probe_lemke_pallas(p: dict) -> None:
    import numpy as np
    from ..ops.lemke_pallas import solve_lemke_batch_state_pallas
    B, n = int(p["B"]), int(p["n"])
    max_pivots = int(p["max_pivots"])
    dtype = np.dtype(p.get("dtype", "float32"))
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    M = (A @ A.T / n + 0.5 * np.eye(n)).astype(dtype)
    M = np.repeat(M[None], B, axis=0)
    q = rng.standard_normal((B, n)).astype(dtype)
    l = np.full((B, n), -1.0, dtype=dtype)
    u = np.full((B, n), 1.0, dtype=dtype)
    z0 = np.zeros((B, n), dtype=dtype)
    vm = np.ones((B, n), dtype=bool)
    out = solve_lemke_batch_state_pallas(
        M, q, l, u, z0, vm, tol=1e-6, piv_tol=1e-5, max_pivots=max_pivots,
        interpret=False)
    import jax
    jax.block_until_ready(out)


def _probe_eg_warmstart(p: dict) -> None:
    import numpy as np
    from ..ops.pallas_kernels import eg_warmstart
    B, n = int(p["B"]), int(p["n"])
    steps = int(p.get("steps", 64))
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    M = np.repeat((A @ A.T / n + 0.5 * np.eye(n))[None], B, axis=0)
    q = rng.standard_normal((B, n))
    l = np.full((B, n), -1.0)
    u = np.full((B, n), 1.0)
    z = eg_warmstart(M, q, l, u, np.zeros((B, n)),
                     np.ones((B, n), dtype=bool), steps=steps)
    import numpy
    numpy.asarray(z)


_PROBES = {
    "lemke_pallas": _probe_lemke_pallas,
    "eg_warmstart": _probe_eg_warmstart,
}


def main() -> int:
    tag = sys.argv[1]
    params = json.loads(sys.argv[2])
    _PROBES[tag](params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
