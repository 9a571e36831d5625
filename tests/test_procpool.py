"""Process-parallel full-solve ensembles (parallel/procpool.py): host-core
scaling of the OUTER equilibrium loop, the leg the GIL denies the lockstep
broker (BASELINE.md lockstep ladder: ~1.05x at any D)."""

import numpy as np
import pytest

import qpn_tpu as qt
from qpn_tpu.parallel.procpool import solve_many_processes


@pytest.mark.slow
def test_procpool_matches_serial():
    qpns = [qt.setup("simple_bilevel") for _ in range(6)]
    x0s = [np.array([0.25 * i - 0.5, 1.0, 0.0, 0.0]) for i in range(6)]
    rets = solve_many_processes(qpns, x0s, n_workers=3)
    ser = qt.solve_many(qpns, x0s)
    assert all(r.solved for r in rets)
    for a, b in zip(rets, ser):
        np.testing.assert_allclose(a.x_opt, b.x_opt, atol=1e-10)


def test_procpool_single_worker_is_serial_loop():
    qpns = [qt.setup("simple_bilevel") for _ in range(2)]
    x0s = [np.array([0.0, 1.0, 0.0, 0.0])] * 2
    rets = solve_many_processes(qpns, x0s, n_workers=1)
    assert all(r.solved for r in rets)


def test_procpool_rejects_mismatched_inits():
    qpns = [qt.setup("simple_bilevel") for _ in range(2)]
    with pytest.raises(ValueError, match="length"):
        solve_many_processes(qpns, [None])
