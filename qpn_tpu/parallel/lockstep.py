"""Lockstep scenario-ensemble driver: the full equilibrium loop, multi-chip.

The reference solves one problem at a time end-to-end; round 1's
``solve_many`` looped scenarios on the host with only the *leaf* AVI batch
sharded.  This module runs the ENTIRE equilibrium algorithm for an ensemble
of QPNets concurrently and fuses their device work:

* each scenario's ``solve()`` runs unmodified in a worker thread — host-side
  control flow (levels, piece enumeration, cycling checks) stays per-scenario
  because it genuinely diverges across scenarios;
* every batched kernel call a scenario makes (``solve_qp_batch_padded`` LPs,
  ``solve_avi_batch_padded`` AVI solves) is intercepted and parked at a
  :class:`LockstepBroker`;
* when every live scenario is parked, the broker fuses the accumulated
  requests by shape into ONE batched dispatch — sharded over a
  ``jax.sharding.Mesh`` when one is given (scenario axis = dp) — and wakes
  the workers with their slices.

Per-lane math in a vmapped kernel is independent of its batchmates, so each
scenario receives exactly the numbers the serial path would have produced —
the property the lockstep regression test asserts.  The broker's wave
barrier is the superstep boundary; stragglers that converge early simply
stop submitting and the waves shrink.

This is the "communication backend + host work-queue orchestration" row of
SURVEY §2.3 made concrete for the outer loop, not just the leaf solve.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Optional, Sequence

import numpy as np


class _Request:
    __slots__ = ("kind", "args", "kw", "result", "error", "event", "order")

    def __init__(self, kind, args, kw, order=(0, 0)):
        self.kind = kind
        self.args = args
        self.kw = kw
        self.result = None
        self.error = None
        self.event = threading.Event()
        # (worker index, per-worker sequence number): canonical ordering so
        # wave composition is independent of thread scheduling — required
        # for SPMD multi-process runs, where every process must issue the
        # SAME fused dispatches in the SAME order or the collectives deadlock
        self.order = order


class LockstepBroker:
    """Wave-synchronous batching of kernel requests from scenario threads."""

    def __init__(self, mesh=None):
        self.mesh = mesh
        self._lock = threading.Lock()
        self._wave = threading.Condition(self._lock)
        self._pending: List[_Request] = []
        self._live = 0          # workers not yet finished
        self._parked = 0        # workers blocked on a request
        self.waves = 0          # superstep counter (for tests/metrics)

    # ---- worker side -----------------------------------------------------
    def submit(self, kind: str, *args, **kw):
        widx = getattr(_BROKER_TLS, "worker", 0)
        seq = getattr(_BROKER_TLS, "seq", 0)
        _BROKER_TLS.seq = seq + 1
        req = _Request(kind, args, kw, order=(widx, seq))
        with self._lock:
            self._pending.append(req)
            self._parked += 1
            self._wave.notify_all()
        req.event.wait()
        # _parked is decremented by the dispatcher when it CONSUMES the
        # request (not here on wake): a stale +1 from a worker still
        # scheduled-out in event.wait would otherwise let the dispatcher
        # fire premature under-filled waves, eroding the fusion this
        # module exists to provide
        if req.error is not None:
            raise req.error
        return req.result

    def _worker_done(self):
        with self._lock:
            self._live -= 1
            self._wave.notify_all()

    # ---- dispatcher side -------------------------------------------------
    def _dispatch_wave(self, requests: Sequence[_Request]):
        from ..ops import avi, batch_qp
        # canonical order (see _Request.order): grouping below uses dict
        # insertion order, so sorting here makes both the group order and
        # the lane order inside each fused batch deterministic across
        # identical SPMD processes
        requests = sorted(requests, key=lambda r: r.order)
        self.waves += 1
        sharding, min_batch = None, 1
        if self.mesh is not None:
            from .mesh import scenario_sharding
            sharding = scenario_sharding(self.mesh)
            min_batch = int(np.prod(list(self.mesh.shape.values())))
        by_shape = {}
        for r in requests:
            # pure LPs (P == 0) must not fuse with QPs of identical shapes:
            # the exact Lemke LP route gates on the CONCATENATED batch being
            # all-LP, and a single QP batchmate would silently demote every
            # LP lane to approximate ADMM — breaking the serial-parity
            # contract downstream geometry decisions consume
            is_lp = (r.kind == "qp"
                     and not np.asarray(r.args[0]).any())
            key = (r.kind, is_lp,
                   tuple(np.asarray(a).shape[1:] for a in r.args),
                   tuple(sorted(r.kw.items())))
            by_shape.setdefault(key, []).append(r)
        for (kind, _, _, _), group in by_shape.items():
            try:
                # stack each positional array arg along the batch axis
                cat = [np.concatenate([np.asarray(r.args[i]) for r in group],
                                      axis=0)
                       for i in range(len(group[0].args))]
                kw = group[0].kw
                if kind == "avi":
                    out = avi.solve_avi_batch_padded(
                        *cat, _no_broker=True, _sharding=sharding,
                        _min_batch=min_batch, **kw)
                elif kind == "qp":
                    out = batch_qp.solve_qp_batch_padded(
                        *cat, _no_broker=True, _sharding=sharding,
                        _min_batch=min_batch, **kw)
                elif kind == "lp_host":
                    # host-engine geometry LPs: one fused exact-shape OpenMP
                    # batch instead of per-scenario native calls contending
                    # for the same cores; no mesh sharding (host execution)
                    from ..ops.lemke import solve_lp_host_batch
                    from ..utils.metrics import METRICS
                    out = solve_lp_host_batch(*cat, _no_broker=True, **kw)
                    METRICS.bump("broker_lp_host_waves")
                    METRICS.bump("broker_lp_host_fused", len(group))
                else:           # pragma: no cover
                    raise ValueError(kind)
            except BaseException as e:          # noqa: BLE001
                # a failed fused dispatch must not strand its workers in
                # event.wait forever: hand each its error and wake it
                for r in group:
                    r.error = e
                    r.event.set()
                continue
            import jax
            # one host materialization of the fused result; in multi-process
            # SPMD the outputs span processes, so fetch via allgather
            from .sharded import _fetch_global
            out = jax.tree.map(_fetch_global, out)
            ofs = 0
            for r in group:
                b = np.asarray(r.args[0]).shape[0]
                r.result = jax.tree.map(lambda v: v[ofs:ofs + b], out)
                ofs += b
                r.event.set()

    def run(self, jobs: Sequence[Callable[[], object]]):
        """Run the scenario jobs to completion; returns their results in
        order.  Exceptions in a job are re-raised after all jobs settle."""
        results = [None] * len(jobs)
        errors = [None] * len(jobs)
        self._live = len(jobs)

        def wrap(i, job):
            _BROKER_TLS.broker = self
            _BROKER_TLS.worker = i
            _BROKER_TLS.seq = 0
            try:
                results[i] = job()
            except BaseException as e:          # noqa: BLE001
                errors[i] = e
            finally:
                _BROKER_TLS.broker = None
                self._worker_done()

        threads = [threading.Thread(target=wrap, args=(i, j), daemon=True)
                   for i, j in enumerate(jobs)]
        for t in threads:
            t.start()
        while True:
            with self._lock:
                self._wave.wait_for(
                    lambda: self._live == 0
                    or (self._pending and self._parked >= self._live))
                if self._live == 0 and not self._pending:
                    break
                wave, self._pending = self._pending, []
                self._parked -= len(wave)
            if wave:
                self._dispatch_wave(wave)
        for t in threads:
            t.join()
        for e in errors:
            if e is not None:
                raise e
        return results


_BROKER_TLS = threading.local()


def active_broker() -> Optional[LockstepBroker]:
    return getattr(_BROKER_TLS, "broker", None)


def solve_many_lockstep(qpns, x_inits=None, seed: int = 1, mesh=None):
    """Lockstep ensemble counterpart of ``algorithm.solve_many``.

    All scenarios advance together; their kernel waves fuse into shared
    batched dispatches (sharded over ``mesh`` when provided).  Per-scenario
    results are identical to the serial path — vmapped lanes are
    batchmate-independent."""
    from ..algorithm import solve
    qpns = list(qpns)
    if x_inits is None:
        x_inits = [None] * len(qpns)
    broker = LockstepBroker(mesh=mesh)
    jobs = [
        (lambda qpn=qpn, x0=x0: solve(qpn, x0, seed=seed))
        for qpn, x0 in zip(qpns, x_inits)
    ]
    out = broker.run(jobs)
    return out, broker
