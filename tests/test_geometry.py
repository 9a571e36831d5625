"""Unit + property tests for the polyhedral geometry kernel (the test pyramid
the reference lacks — its rand(Poly) generator, sets.jl:316-345, hints at the
intended fuzzing; we do it)."""

import numpy as np
import pytest

from qpn_tpu.geometry import (Poly, PolyUnion, intersect, from_box, is_empty,
                              contains, issubset, implicit_bounds,
                              intrinsic_dim, remove_subsets, project,
                              get_verts, rand_poly, random_polys_of_dim)


def test_normalization_and_dedup():
    # rows scaled so leading coefficient is +1; duplicate rows collapse
    A = np.array([[2.0, 0.0], [1.0, 0.0], [-3.0, 0.0]])
    p = Poly(A, [0.0, 0.0, -6.0], [2.0, 1.0, np.inf])
    # rows 1,2 normalize to a=(1,0) l=0 u=1; row 3 flips to a=(1,0) l=-inf u=2
    assert p.m == 2
    assert np.allclose(p.A[:, 0], 1.0)


def test_simplify_merges_parallel_rows():
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    p = Poly(A, [0.0, 0.5], [2.0, 3.0], dedupe=False).simplify()
    assert p.m == 1
    assert np.isclose(p.l[0], 0.5) and np.isclose(p.u[0], 2.0)


def test_membership_box():
    p = from_box([0.0, 0.0], [1.0, 1.0])
    assert p.contains([0.5, 0.5])
    assert not p.contains([1.5, 0.5])
    # boundary within tolerance
    assert p.contains([1.0 + 1e-8, 0.5])


def test_partial_membership_lp():
    # {(x, y): 0<=x<=1, 0<=y<=1, x+y<=1}: x=0.2 feasible, x=2 not
    A = np.array([[1.0, 0], [0, 1.0], [1.0, 1.0]])
    p = Poly(A, [0, 0, -np.inf], [1, 1, 1.0])
    assert contains(np.array([0.2]), p)
    assert not contains(np.array([2.0]), p)


def test_emptiness_strict_and_closed():
    # x <= 0 and x >= 0: nonempty (the point 0)
    p = Poly(np.array([[1.0], [1.0]]), [-np.inf, 0.0], [0.0, np.inf],
             dedupe=False)
    assert not is_empty(p)
    # x < 0 and x > 0: empty via strictness
    p2 = Poly(np.array([[1.0], [1.0]]), [-np.inf, 0.0], [0.0, np.inf],
              np.array([False, True]), np.array([True, False]), dedupe=False)
    assert is_empty(p2)
    # x >= 1 and x <= 0: empty
    p3 = Poly(np.array([[1.0], [1.0]]), [1.0, -np.inf], [np.inf, 0.0],
              dedupe=False)
    assert is_empty(p3)


def test_issubset():
    inner = from_box([0.2, 0.2], [0.8, 0.8])
    outer = from_box([0.0, 0.0], [1.0, 1.0])
    assert issubset(inner, outer)
    assert not issubset(outer, inner)


def test_remove_subsets_tie_break():
    # two equal boxes: exactly one survives (deterministic serial tie-break,
    # sets.jl:889-905)
    a = from_box([0.0], [1.0])
    b = from_box([0.0], [1.0])
    c = from_box([2.0], [3.0])
    pu = remove_subsets(PolyUnion([a, b, c]))
    assert len(pu) == 2


def test_implicit_bounds_and_intrinsic_dim():
    # triangle squeezed to a segment: x+y=1, 0<=x<=1, 0<=y<=1
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    p = Poly(A, [1.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    impl, vals = implicit_bounds(p)
    assert impl[0]
    assert intrinsic_dim(p) == 1


def test_complement():
    p = from_box([0.0], [1.0])
    comp = p.complement()
    assert len(comp) == 2
    assert comp.contains(np.array([-0.5]))
    assert comp.contains(np.array([1.5]))
    assert not comp.contains(np.array([0.5]))


def test_intersect_and_slice():
    a = from_box([0.0, 0.0], [2.0, 2.0])
    b = from_box([1.0, 1.0], [3.0, 3.0])
    c = intersect(a, b)
    assert c.contains([1.5, 1.5])
    assert not c.contains([0.5, 0.5])
    s = c.poly_slice(np.array([1.5, np.nan]))
    assert s.dim == 1
    assert s.contains([1.5])
    assert not s.contains([0.5])


def test_projection_simplex():
    # project the 3-simplex onto (x1, x2): expect x1,x2 >= 0, x1+x2 <= 1
    A = np.vstack([np.eye(3), np.ones((1, 3))])
    p = Poly(A, [0, 0, 0, 1.0], [np.inf, np.inf, np.inf, 1.0])
    pr = project(p, [0, 1])
    assert pr.dim == 2
    for pt, inside in [([0.3, 0.3], True), ([0.7, 0.7], False),
                       ([-0.1, 0.5], False), ([0.0, 1.0], True)]:
        assert pr.contains(np.array(pt), tol=1e-6) == inside
    assert pr.parent is p


def test_projection_with_equalities():
    # x + y = 1, 0 <= x <= 1 projected to x: [0, 1]
    A = np.array([[1.0, 1.0], [1.0, 0.0]])
    p = Poly(A, [1.0, 0.0], [1.0, 1.0])
    pr = project(p, [0])
    assert pr.contains(np.array([0.5]))
    assert not pr.contains(np.array([1.5]))


def test_get_verts_box():
    p = from_box([0.0, 0.0], [1.0, 1.0])
    V, R, L = get_verts(p, rng=np.random.default_rng(0))
    Vr = {tuple(np.round(v, 4)) for v in V}
    expected = {(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)}
    assert expected <= Vr


def test_get_verts_point():
    # zero-dimensional poly: the single point comes back (sets.jl:443-449)
    p = Poly(np.eye(2), [0.3, 0.7], [0.3, 0.7])
    V, R, L = get_verts(p)
    assert len(V) == 1
    assert np.allclose(V[0], [0.3, 0.7], atol=1e-6)


def test_property_random_membership(rng):
    """Property: exemplar points of nonempty random polys are members."""
    from qpn_tpu.geometry.setops import exemplar_batch
    polys = random_polys_of_dim(rng, 20, 3)
    empty, examples = exemplar_batch(polys)
    for p, e, ex in zip(polys, empty, examples):
        if not e and ex is not None:
            assert p.closure().contains(ex, tol=1e-4)


def test_property_subset_transitive(rng):
    """Shrunk boxes are subsets; random polys intersected are subsets of
    their factors."""
    for _ in range(10):
        lo = rng.standard_normal(3)
        hi = lo + 1 + rng.random(3)
        outer = from_box(lo, hi)
        inner = from_box(lo + 0.1, hi - 0.1)
        assert issubset(inner, outer)
        third = intersect(inner, outer)
        assert issubset(third, outer)


def test_hull_of_points_high_dim_polar():
    """dim>4 hull via polar duality (lifts the round-1 dim<=4 gate)."""
    from qpn_tpu.geometry.vertices import hull_of_points
    rng = np.random.default_rng(7)
    d = 6
    # cross-polytope vertices (hull = the cross-polytope, 2^d facets)
    # plus interior noise; the dual stays within the combinatorial budget
    corners = np.vstack([np.eye(d), -np.eye(d)])
    inner = rng.uniform(-0.2, 0.2, size=(4, d))
    pts = np.vstack([corners, inner])
    h = hull_of_points(pts)
    assert h.contains(np.zeros(d), tol=1e-8)
    e = np.zeros(d)
    e[0] = 0.999
    assert h.contains(e, tol=1e-6)
    assert not h.contains(np.full(d, 0.5), tol=1e-6)   # outside ||x||_1 <= 1
    for p in pts:
        assert h.contains(p, tol=1e-6)


from qpn_tpu.geometry import setops


class TestStrictEmptinessThroughProjection:
    """Empty OPEN polyhedra must stay empty through simplify/projection —
    the strict-infeasible marker 0'x < 0 was being dropped at three choke
    points (review findings; the pieces of a solution map rely on strict
    boundaries for disjoint interiors)."""

    def test_project_empty_open_slab(self):
        from qpn_tpu.geometry.project import project
        # {(x, y) : 1 < x and x < 1} is empty (open slab, adjacent pieces)
        p = Poly(np.array([[1.0, 0.0], [1.0, 0.0]]),
                 np.array([1.0, -np.inf]), np.array([np.inf, 1.0]),
                 strict_l=np.array([True, False]),
                 strict_u=np.array([False, True]), normalize=False)
        assert setops.is_empty(p)
        q = project(p, [1])
        assert setops.is_empty(q), (
            "projection of an empty open slab must stay empty")

    def test_simplify_keeps_strict_zero_row(self):
        # zero row with strict lower bound at 0 encodes 0 < 0: empty
        p = Poly(np.array([[0.0, 0.0], [1.0, 0.0]]),
                 np.array([0.0, -1.0]), np.array([np.inf, 1.0]),
                 strict_l=np.array([True, False]),
                 strict_u=np.array([False, False]), normalize=False)
        s = p.simplify()
        assert setops.is_empty(s), (
            "simplify dropped the strict-infeasible zero row")

    def test_eliminate_by_equalities_skips_strict_markers(self):
        from qpn_tpu.geometry.project import eliminate_by_equalities
        # l == u row WITH a strict flag is an empty-set marker, not an
        # equality pivot
        A = np.array([[1.0, 0.0], [0.0, 1.0]])
        l = np.array([1.0, 0.0])
        u = np.array([1.0, 2.0])
        sl = np.array([True, False])
        su = np.array([False, False])
        A2, l2, u2, sl2, su2, rem = eliminate_by_equalities(
            A, l, u, sl, su, [0])
        # the strict marker row must survive (column not eliminated by it)
        assert rem == [0]
        assert A2.shape[0] == 2


def test_is_empty_forwards_tol():
    """Reference parity (sets.jl:646-655): isempty's tol reaches the
    ε-inflation decision.  A slab infeasible by 5e-3 is empty at tol=1e-4
    but nonempty at the loose 1e-2."""
    p = Poly(np.array([[1.0], [1.0]]),
             np.array([1.0, -np.inf]), np.array([np.inf, 1.0 - 5e-3]),
             normalize=False)
    assert setops.is_empty(p, tol=1e-4)
    assert not setops.is_empty(p, tol=1e-2)


def test_poly_key_row_order_invariant_and_memoized():
    """Equal polys that differ only by row order must hash to the same
    query-cache key, and the key must memoize on the instance (the _qkey
    slot — previously missing from __slots__, so every hot-loop query
    recomputed the digest)."""
    from qpn_tpu.geometry.query_cache import poly_key
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    l = np.array([0.0, 1.0, 2.0])
    u = np.array([5.0, 6.0, 7.0])
    p1 = Poly(A, l, u, normalize=False, dedupe=False)
    perm = [2, 0, 1]
    p2 = Poly(A[perm], l[perm], u[perm], normalize=False, dedupe=False)
    k1 = poly_key(p1)
    assert poly_key(p2) == k1
    assert p1._qkey == k1          # memo actually landed on the instance


def test_implicit_bounds_no_relative_tolerance():
    """A width-5 slab on bounds near 1e6 is NOT an implicit equality:
    np.isclose's default rtol=1e-5 would classify it as one (threshold
    grows to ~10 at that magnitude), silently shrinking the feasible set."""
    from qpn_tpu.geometry import setops
    p = Poly(np.array([[1.0, 0.0], [0.0, 1.0]]),
             np.array([1e6, -1.0]), np.array([1e6 + 5.0, 1.0]))
    impl, vals = setops.implicit_bounds(p, tol=1e-4)
    assert not impl[0]             # the wide slab stays an inequality
