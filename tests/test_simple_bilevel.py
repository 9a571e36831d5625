"""Golden-value integration test — the reference's correctness gate
(test/simple_bilevel.jl:1-22) ported point-for-point: 8 parameter points with
analytically-known follower responses, plus solution-graph piece-count lower
bounds (set-valued output cardinality, not just points)."""

import math

import numpy as np
import pytest

import qpn_tpu as qt


W = [
    [-2.0, -3.0], [0.0, -1.0], [1.0, -3.0], [1.0, -1.0],
    [1.0, 0.0], [0.0, 1.0], [-1.0, 1 + math.sqrt(2.0)], [0.0, 0.0],
]
X = [
    [[-2.0, 0.0]],
    [[0.0, 0.0]],
    [[0.0, 0.0]],
    [[0.0, 0.0]],
    [[0.5, 0.5]],
    [[0.5, 0.5], [0.0, 0.0]],
    [[-1.0, 0.0], [math.sqrt(2.0) / 2, math.sqrt(2.0) / 2]],
    [[0.0, 0.0]],
]
S = [1, 2, 1, 2, 1, 1, 1, 3]


@pytest.fixture(scope="module")
def qpn():
    return qt.setup("simple_bilevel", gen_solution_map=True)


@pytest.mark.parametrize("w,xs,s", list(zip(W, X, S)),
                         ids=[f"w{i+1}" for i in range(8)])
def test_golden_point(qpn, w, xs, s):
    x0 = np.zeros(2)
    ret = qt.solve(qpn, np.concatenate([w, x0]))
    assert ret.solved, getattr(ret, "error", None)
    ok = any(np.allclose(ret.x_opt, np.concatenate([w, xi]), atol=1e-4)
             for xi in xs)
    assert ok, f"x_opt={ret.x_opt} not in expected set {xs}"
    assert len(list(ret.Sol[2])) >= s
