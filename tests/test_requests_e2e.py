"""End-to-end exercise of the requests subsystem (VERDICT r1 item 8).

The reference wires requests through signatures but the negotiation loop is
dead code (requests.jl:22 early-return); the *components* — request-granted
labels in comp_indices (avi_solutions.jl:522-541), identify_request /
propagate_request (avi.jl:479-537) — define the design intent
(requests.jl:6-17): a parent asks the child's solution map to extend toward
a direction, and piece discovery grants boundary labels along it.

These tests drive that chain live: a request direction measurably CHANGES
the discovered piece set of a parametric GAVI, and the identified request
maps back through the projection parents.
"""

import numpy as np

from qpn_tpu.enumeration import (LocalGAVISolutions, all_Ks, comp_indices,
                                 process_solution_graph)
from qpn_tpu.network import Linear
from qpn_tpu.ops.avi import GAVI
from qpn_tpu.requests import identify_request, propagate_request


def _follower_gavi():
    """KKT GAVI of  min ½(x−w)²  s.t. x ≥ 0:  z = [x; λ], w scalar::

        x − w − λ ⟂ x free
        λ         ⟂ 0 ≤ x ≤ ∞
    """
    return GAVI(
        M=np.array([[1.0, -1.0]]), N=np.array([[-1.0]]), o=np.zeros(1),
        l1=np.array([-np.inf]), u1=np.array([np.inf]),
        A=np.array([[1.0, 0.0]]), B=np.array([[0.0]]),
        l2=np.array([0.0]), u2=np.array([np.inf]))


class TestRequestsChangePieceDiscovery:
    def test_request_extends_solution_map(self):
        gavi = _follower_gavi()
        z = np.array([1.0, 0.0])       # solution at w=1 (interior: x=1, λ=0)
        w = np.array([1.0])

        def enumerate_with(request):
            gen = LocalGAVISolutions(gavi, z, w, 0, 0, [0], [1])
            gen.permuted_request = request
            J = comp_indices(gavi, z, w, request)
            gen.unexplored_Ks = all_Ks(J)
            return gen.collect()

        base = enumerate_with(frozenset())
        # request along a2 = −[e_λ; B_i]: "extend toward larger λ" — grants
        # the s-at-lower-bound label (x = 0, λ ≥ 0), discovering the piece
        # valid for w ≤ 0 that plain local enumeration at w=1 cannot see
        req = frozenset([Linear(np.array([0.0, -1.0, 0.0]))])
        extended = enumerate_with(req)
        assert len(extended) > len(base), (
            f"request did not extend the map: {len(base)} -> {len(extended)}")

    def test_granted_labels_in_comp_indices(self):
        gavi = _follower_gavi()
        z = np.array([1.0, 0.0])
        w = np.array([1.0])
        J0 = comp_indices(gavi, z, w)
        req = frozenset([Linear(np.array([0.0, -1.0, 0.0]))])
        J1 = comp_indices(gavi, z, w, req)
        assert all(a <= b for a, b in zip(J0, J1))      # only ever grows
        assert J0 != J1                                  # and did grow


class TestIdentifyPropagate:
    def test_identify_request_through_parent(self):
        """Active duals on child-graph rows map through ProjectedPoly
        parents into request directions (avi.jl:479-506)."""
        from qpn_tpu.geometry.poly import Poly
        parent = Poly(np.array([[1.0, 0.0], [0.0, 1.0]]),
                      np.array([0.0, 0.0]), np.array([2.0, 2.0]))
        S = Poly(np.array([[1.0, 0.0]]), np.array([0.0]), np.array([2.0]))
        S.parent = parent
        S.row_parents = [parent]
        reqs = identify_request(S, np.array([1.0]))
        assert len(reqs) >= 1
        for r in reqs:
            assert isinstance(r, Linear)

    def test_propagate_request_duals(self):
        from qpn_tpu.geometry.poly import Poly
        box = Poly(np.eye(2), np.zeros(2), np.ones(2))
        out = propagate_request(np.array([1.0, 0.0]), box)
        # minimizing +x over the box activates the x >= 0 facet
        assert any(np.allclose(r.a, [1.0, 0.0]) for r in out)
