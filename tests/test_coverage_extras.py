"""Coverage for public functions not exercised elsewhere."""

import numpy as np
import pytest

import qpn_tpu as qt
from qpn_tpu.geometry import (from_box, issubset_union, union_intersect,
                              get_lexico_ordering, convex_hull)
from qpn_tpu.geometry.poly import Poly, PolyUnion, lexico_positive
from qpn_tpu.geometry.vertices import hull_of_points
from qpn_tpu.ops.avi import GAVI, find_closest_feasible, relax_gavi, solve_gavi, Status
from qpn_tpu.network import Linear, Quadratic


def test_issubset_union_conservative():
    inner = from_box([0.2], [0.4])
    pu = PolyUnion([from_box([0.0], [0.5]), from_box([0.6], [1.0])])
    assert issubset_union(inner, pu)
    crossing = from_box([0.4], [0.7])   # covered by neither single piece
    assert not issubset_union(crossing, pu)


def test_union_intersect_product():
    a = PolyUnion([from_box([0.0], [1.0]), from_box([2.0], [3.0])])
    b = PolyUnion([from_box([0.5], [2.5])])
    pieces = list(union_intersect(a, b))
    assert len(pieces) == 2
    assert pieces[0].contains(np.array([0.7]))


def test_lexico_helpers():
    ok, mag = lexico_positive(np.array([0.0, -2.0, 1.0]))
    assert not ok and mag == 2.0
    order = get_lexico_ordering(np.array([[0.0, 1.0], [1.0, 0.0]]))
    assert order == [1, 0]


def test_hull_of_points_square():
    pts = np.array([[0.0, 0], [1, 0], [0, 1], [1, 1], [0.5, 0.5]])
    hull = hull_of_points(pts)
    assert hull.contains(np.array([0.5, 0.5]))
    assert not hull.contains(np.array([1.2, 0.5]))


def test_convex_hull_union():
    pu = PolyUnion([from_box([0.0, 0.0], [1.0, 1.0]),
                    from_box([2.0, 0.0], [3.0, 1.0])])
    hull = convex_hull(pu)
    # the gap between the boxes is inside the hull
    assert hull.contains(np.array([1.5, 0.5]))
    assert not hull.contains(np.array([1.5, 1.5]))


def test_find_closest_feasible_projects():
    g = GAVI(M=np.zeros((1, 2)), N=np.zeros((1, 0)), o=np.zeros(1),
             l1=np.array([-np.inf]), u1=np.array([np.inf]),
             A=np.array([[1.0, 0.0]]), B=np.zeros((1, 0)),
             l2=np.array([0.0]), u2=np.array([1.0]))
    z0 = find_closest_feasible(g, np.array([5.0, 7.0]), np.zeros(0))
    assert 0.0 - 1e-6 <= g.A @ z0 <= 1.0 + 1e-6
    assert np.isclose(z0[1], 7.0, atol=1e-6)   # unconstrained coord unchanged


def test_relax_gavi_solves_relaxed_problem():
    """Relaxing the parameter of a follower KKT makes it a decision: the
    relaxed GAVI solves the joint problem min over (w, y) of (y − w)², y ≥ 0,
    whose solutions satisfy y = max(w, 0) with the stationarity coupling."""
    g = GAVI(M=np.array([[2.0, -1.0]]), N=np.array([[-2.0]]),
             o=np.array([0.0]),
             l1=np.array([-np.inf]), u1=np.array([np.inf]),
             A=np.array([[1.0, 0.0]]), B=np.array([[0.0]]),
             l2=np.array([0.0]), u2=np.array([np.inf]))
    rg = relax_gavi(g, [0])
    z, status = solve_gavi(rg, np.zeros(3), np.zeros(0))
    assert status == Status.SUCCESS
    w_rel, y_rel = z[0], z[1]
    assert np.isclose(y_rel, max(w_rel, 0.0), atol=1e-6)


def test_linear_hash_and_call():
    a = Linear([1.0, 2.0])
    b = Linear([1.0, 2.0])
    assert a == b and hash(a) == hash(b)
    assert a([1.0, 1.0]) == pytest.approx(3.0)


def test_quadratic_sum():
    f = Quadratic(np.eye(2), np.ones(2), 1.0)
    g = Quadratic.sum([f, f, f])
    assert np.allclose(g.Q, 3 * np.eye(2))
    assert g.k == 3.0


def test_poly_translate():
    p = from_box([0.0], [1.0]).translate([2.0])
    assert p.contains(np.array([2.5]))
    assert not p.contains(np.array([0.5]))


def test_multihost_info():
    from qpn_tpu.parallel import multihost
    info = multihost.process_info()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1


def test_tikz_and_debug_banner(capsys):
    from qpn_tpu.models.viz import tikz_graph
    from qpn_tpu.printing import display_debug
    qpn = qt.setup("simple_bilevel")
    src = tikz_graph(qpn)
    assert "\\graph" in src and "(2) -> (1);" in src
    display_debug(qpn, 1, 3, pieces=2)
    out = capsys.readouterr().out
    assert "level 1 iteration 3" in out
