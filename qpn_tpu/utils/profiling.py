"""Profiler integration — JAX traces for the solver phases.

The reference has no profiling at all (SURVEY.md §5).  This wraps
``jax.profiler`` so any solve can emit a TensorBoard-compatible trace, and
adds named step annotations around the major phases (they appear as ranges in
the trace viewer alongside the XLA kernels).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qpn_tpu_trace"):
    """Profile a block::

        from qpn_tpu.utils.profiling import trace
        with trace("/tmp/trace"):
            qt.solve(qpn)
    """
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named range inside an active trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
