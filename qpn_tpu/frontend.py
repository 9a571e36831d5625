"""Symbolic modeling frontend — JAX tracing replaces Symbolics.jl.

The reference extracts ``A`` / ``Q, q, k`` from user expressions with
Symbolics.jl jacobians (programs.jl:147-201).  Here the same API shape is kept
(``variables``, ``add_constraint``, ``add_qp``) but the differentiation engine
is JAX itself: expressions are tiny operator-overloading trees over ``Var``
leaves, evaluated as traced jnp scalars, and the (sparse-in-spirit, dense
in layout) data is read off with ``jax.jacobian`` / ``jax.hessian`` at zero.
Non-linear constraints and non-quadratic costs are rejected by comparing
against the extracted affine/quadratic model at random points, mirroring the
reference's errors (programs.jl:154, 179).

Expressions compose with numpy object arrays, so model code reads like the
Julia examples::

    w = variables("w", 2); x = variable("x"); y = variable("y")
    b = QPNetBuilder(w, x, y)
    cid = b.add_constraint([y], [0.0], [np.inf])
    b.add_qp((y - x) ** 2, [cid], y)
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .network import QPNet, Quadratic


class Expr:
    """Scalar expression node."""

    def eval(self, x, index):  # pragma: no cover - abstract
        raise NotImplementedError

    # arithmetic -----------------------------------------------------------
    def __add__(self, o):
        return Add(self, _lift(o))

    def __radd__(self, o):
        return Add(_lift(o), self)

    def __sub__(self, o):
        return Add(self, Scale(_lift(o), -1.0))

    def __rsub__(self, o):
        return Add(_lift(o), Scale(self, -1.0))

    def __neg__(self):
        return Scale(self, -1.0)

    def __mul__(self, o):
        if isinstance(o, (int, float, np.floating, np.integer)):
            return Scale(self, float(o))
        return Mul(self, _lift(o))

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if not isinstance(o, (int, float, np.floating, np.integer)):
            raise ValueError("can only divide expressions by scalars")
        return Scale(self, 1.0 / float(o))

    def __pow__(self, p):
        if p == 1:
            return self
        if p != 2:
            raise ValueError(
                f"x**{p} is not quadratic: only squares (and **1) are "
                "supported in quadratic models")
        return Mul(self, self)


class Const(Expr):
    def __init__(self, v):
        self.v = float(v)

    def eval(self, x, index):
        return self.v


class Var(Expr):
    _count = 0

    def __init__(self, name: str):
        self.name = name
        self.uid = Var._count
        Var._count += 1

    def eval(self, x, index):
        return x[index[self.uid]]

    def __repr__(self):
        return self.name


class Add(Expr):
    def __init__(self, a, b):
        self.a, self.b = a, b

    def eval(self, x, index):
        return self.a.eval(x, index) + self.b.eval(x, index)


class Mul(Expr):
    def __init__(self, a, b):
        self.a, self.b = a, b

    def eval(self, x, index):
        return self.a.eval(x, index) * self.b.eval(x, index)


class Scale(Expr):
    def __init__(self, a, c):
        self.a, self.c = a, float(c)

    def eval(self, x, index):
        return self.c * self.a.eval(x, index)


def _lift(v):
    if isinstance(v, Expr):
        return v
    if isinstance(v, (int, float, np.floating, np.integer)):
        return Const(v)
    raise TypeError(f"cannot lift {type(v)} into an expression")


def variable(name: str) -> Var:
    return Var(name)


def variables(name: str, *dims) -> np.ndarray:
    """Array of Vars, e.g. variables('x', 2) or variables('uo', 2, 3)
    (programs.jl:143-144).  Dims are sizes (ints) or ranges — a Python
    ``range`` contributes ``len(range)`` entries."""
    dims = tuple(len(d) if isinstance(d, range) else int(d) for d in dims)
    out = np.empty(dims, dtype=object)
    for idx in np.ndindex(*dims):
        suffix = "_".join(str(i + 1) for i in idx)
        out[idx] = Var(f"{name}{suffix}")
    return out


def _flatten_vars(sym_vars) -> List[Var]:
    flat: List[Var] = []
    for sv in sym_vars:
        if isinstance(sv, Var):
            flat.append(sv)
        else:
            arr = np.asarray(sv, dtype=object)
            # Julia (column-major) enumeration order for multi-dim blocks
            flat.extend(arr.flatten(order="F").tolist())
    return flat


class QPNetBuilder:
    """Mirror of ``QPNet(sym_vars...)`` + the symbolic add_* API
    (programs.jl:94-116, 147-201)."""

    def __init__(self, *sym_vars):
        self.vars = _flatten_vars(sym_vars)
        self.index: Dict[int, int] = {v.uid: i for i, v in enumerate(self.vars)}
        self.net = QPNet(len(self.vars), [v.name for v in self.vars])

    @property
    def num_vars(self):
        return len(self.vars)

    def _eval_fn(self, exprs: Sequence[Expr]):
        index = self.index

        def g(x):
            return jnp.stack([_lift(e).eval(x, index) for e in exprs])

        return g

    def add_constraint(self, cons, lb, ub, tol: float = 1e-8) -> int:
        """programs.jl:147-170: extract sparse A and constant offset; the
        bounds are shifted by the constant term."""
        cons = list(np.asarray(cons, dtype=object).flatten(order="F")) \
            if not isinstance(cons, (list, tuple)) else list(cons)
        lb = np.atleast_1d(np.asarray(lb, dtype=np.float64))
        ub = np.atleast_1d(np.asarray(ub, dtype=np.float64))
        if not (len(cons) == len(lb) == len(ub)):
            raise ValueError(
                f"add_constraint: {len(cons)} expressions but "
                f"{len(lb)} lower / {len(ub)} upper bounds")
        g = self._eval_fn(cons)
        zero = jnp.zeros(self.num_vars)
        A = np.array(jax.jacobian(g)(zero))
        vals = np.asarray(g(zero))
        # linearity check at a random point (replaces the Symbolics error path)
        rng = np.random.default_rng(12345)
        xt = rng.standard_normal(self.num_vars)
        if not np.allclose(np.asarray(g(jnp.asarray(xt))), A @ xt + vals,
                           atol=1e-6, rtol=1e-6):
            raise ValueError("Detected non-linear constraint!")
        A[np.abs(A) < tol] = 0.0
        return self.net.add_constraint(A, lb - vals, ub - vals)

    def add_qp(self, cost: Expr, con_inds, *private_vars, tol: float = 1e-8) -> int:
        """programs.jl:172-201: Q = hessian, q = grad at 0, k = cost(0)."""
        index = self.index

        def f(x):
            return _lift(cost).eval(x, index)

        zero = jnp.zeros(self.num_vars)
        Q = np.array(jax.hessian(f)(zero))
        q = np.asarray(jax.grad(f)(zero))
        k = float(f(zero))
        rng = np.random.default_rng(54321)
        xt = rng.standard_normal(self.num_vars)
        model = 0.5 * xt @ Q @ xt + q @ xt + k
        if not np.isclose(float(f(jnp.asarray(xt))), model, atol=1e-6, rtol=1e-6):
            raise ValueError("Detected non-quadratic cost!")
        Q[np.abs(Q) < tol] = 0.0
        var_inds = [self.index[v.uid] for v in _flatten_vars(private_vars)]
        return self.net.add_qp(Quadratic(Q, q, k), list(con_inds), var_inds)

    # passthroughs ---------------------------------------------------------
    def add_edges(self, edge_list):
        self.net.add_edges(edge_list)

    def assign_constraint_groups(self, group_map=None):
        self.net.assign_constraint_groups(group_map)

    def set_options(self, **kw):
        self.net.set_options(**kw)


def dot(a, b):
    """Inner product helper for object arrays of Exprs / floats."""
    a = np.asarray(a, dtype=object).ravel(order="F")
    b = np.asarray(b, dtype=object).ravel(order="F")
    assert a.shape == b.shape
    out = _lift(0.0)
    for ai, bi in zip(a, b):
        out = out + _lift(ai) * _lift(bi)
    return out


def sqnorm(a):
    return dot(a, a)
