"""Network-layer tests: DAG processing, depth maps, index helpers, frontend
extraction (programs.jl semantics)."""

import numpy as np
import pytest

import qpn_tpu as qt
from qpn_tpu.network import create_minimal_adj_matrix, create_depth_map
from qpn_tpu.frontend import QPNetBuilder, variable, variables, dot


def test_transitive_reduction():
    # 1->2->3 plus redundant 1->3: reduced away; reachability keeps it
    A, R = create_minimal_adj_matrix(3, [(1, 2), (2, 3), (1, 3)])
    assert not A[0, 2]
    assert R[0, 2]


def test_cycle_detection():
    with pytest.raises(ValueError, match="Cycle"):
        create_minimal_adj_matrix(3, [(1, 2), (2, 3), (3, 1)])
    with pytest.raises(ValueError, match="self edges"):
        create_minimal_adj_matrix(2, [(1, 1)])


def test_depth_map_chain():
    A, R = create_minimal_adj_matrix(4, [(1, 2), (2, 3), (3, 4)])
    dm = create_depth_map(R)
    assert dm == {1: {1}, 2: {2}, 3: {3}, 4: {4}}


def test_depth_map_nash():
    A, R = create_minimal_adj_matrix(3, [])
    dm = create_depth_map(R)
    assert dm == {1: {1, 2, 3}}


def test_decision_inds_include_descendants():
    qpn = qt.setup("simple_bilevel")
    # leader (node 2) decides its own var + follower's var
    assert qpn.decision_inds(2) == [2, 3]
    assert qpn.decision_inds(1) == [3]


def test_gather_and_fair_obj():
    qpn = qt.setup("simple_bilevel")
    qep = qpn.gather(1)
    assert set(qep.qps) == {2}
    f = qpn.fair_obj(1)
    assert f.Q.shape == (4, 4)


def test_frontend_extraction():
    x = variable("x")
    y = variable("y")
    b = QPNetBuilder(x, y)
    pid = b.add_qp((x - 2 * y) ** 2 + 3 * x + 1.5, [], x)
    qp = b.net.qps[pid]
    assert np.allclose(qp.f.Q, [[2.0, -4.0], [-4.0, 8.0]])
    assert np.allclose(qp.f.q, [3.0, 0.0])
    assert np.isclose(qp.f.k, 1.5)


def test_frontend_constraint_offset():
    x = variable("x")
    b = QPNetBuilder(x)
    cid = b.add_constraint([x + 2.0], [0.0], [5.0])
    poly = b.net.constraints[cid].poly
    # bounds shifted by the constant term: 0-2 <= x <= 5-2
    assert poly.contains(np.array([-2.0]))
    assert poly.contains(np.array([3.0]))
    assert not poly.contains(np.array([3.5]))


def test_constraint_groups():
    qpn = qt.setup("simple_bilevel")
    con = qpn.constraints[1]
    assert con.group_mapping == {1: 1}


def test_options_reflection(recwarn):
    qpn = qt.setup("simple_bilevel")
    qpn.set_options(tol=1e-5, bogus_option=3)
    assert qpn.options.tol == 1e-5
    assert any("bogus_option" in str(w.message) for w in recwarn.list)


def test_flatten():
    qpn = qt.setup("simple_bilevel")
    flat = qpn.flatten()
    assert flat.num_levels() == 1
    assert qpn.num_levels() == 2


def test_julia_column_major_variable_order():
    """variables('x', 2, 3) must enumerate column-major like Julia's
    Symbolics.variables (QPNet indexes scalars in that order)."""
    v = variables("x", 2, 3)
    b = QPNetBuilder(v)
    names = [var.name for var in b.vars]
    assert names == ["x1_1", "x2_1", "x1_2", "x2_2", "x1_3", "x2_3"]


def test_frontend_power_and_division_validation():
    """x**1 is the identity, x**p for p not in {1, 2} and division by an
    expression must raise (ValueError, not assert — asserts vanish under
    python -O and would silently build x**2 for a cubic cost)."""
    import pytest
    x = variable("x")
    y = variable("y")
    b = QPNetBuilder(x, y)
    b.add_qp((x ** 1 - 1.0) ** 2, [], x)   # x**1 == x: valid quadratic
    with pytest.raises(ValueError, match="not quadratic"):
        x ** 3
    with pytest.raises(ValueError, match="scalars"):
        x / y


def test_frontend_structural_rejection():
    """Structural monomial extraction (Expr.quad) must reject degree>2
    products exactly like the reference's Symbolics error paths
    (programs.jl:154, 179), and must treat exact cancellations of the
    quadratic part as linear."""
    import pytest
    x = variable("x")
    y = variable("y")
    b = QPNetBuilder(x, y)
    with pytest.raises(ValueError, match="non-linear constraint"):
        b.add_constraint([x * y], [0.0], [1.0])
    with pytest.raises(ValueError, match="non-quadratic cost"):
        b.add_qp((x * x) * y, [], x)
    with pytest.raises(ValueError, match="non-quadratic cost"):
        b.add_qp((x * x) * (y * y), [], x)
    # x*y - x*y cancels structurally: a valid (zero-Q) linear constraint
    cid = b.add_constraint([x * y - x * y + x], [0.0], [1.0])
    assert b.net.constraints[cid].poly.contains(np.array([0.5, 99.0]))
    # mixed bilinear cost: Q has only off-diagonal entries
    pid = b.add_qp(x * y, [], x)
    assert np.allclose(b.net.qps[pid].f.Q, [[0.0, 1.0], [1.0, 0.0]])
    assert np.allclose(b.net.qps[pid].f.q, 0.0)
    # a factor whose quadratic part cancels EXACTLY is affine: the degree
    # guard in Mul.quad must be value-aware, not dict-truthiness
    # (advisor r2 finding: (x*y - x*y + x) * x == x**2 used to raise)
    pid2 = b.add_qp((x * y - x * y + x) * x, [], x)
    assert np.allclose(b.net.qps[pid2].f.Q, [[2.0, 0.0], [0.0, 0.0]])
    pid3 = b.add_qp(x * x + 0.0 * (x * x) * y, [], x)
    assert np.allclose(b.net.qps[pid3].f.Q, [[2.0, 0.0], [0.0, 0.0]])
