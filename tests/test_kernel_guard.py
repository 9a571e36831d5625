"""First-use kernel validation (utils/kernel_guard) and glue placement.

A device kernel fault kills the host process and cannot be caught
in-process (the BENCH_r03 class): production containment = validate each
new Pallas signature in a killable subprocess, tombstone crashers, demote
loudly.  These tests simulate a faulting kernel class and assert the solve
demotes instead of dying (VERDICT r3 item 6)."""

import numpy as np
import pytest

import qpn_tpu.utils.kernel_guard as kg
from qpn_tpu.config import CONFIG, glue_dispatch_device


@pytest.fixture
def guard_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(kg, "GUARD_DIR", str(tmp_path))
    kg.reset_for_tests()
    yield tmp_path
    kg.reset_for_tests()


class TestGuardStateMachine:
    def test_ok_probe_persists_marker(self, guard_dir, monkeypatch):
        calls = []
        monkeypatch.setattr(kg, "_PROBE_OVERRIDE",
                            lambda tag, params: calls.append(tag) or 0)
        assert kg.ensure_kernel_safe("lemke_pallas", ("s1",), {"B": 8})
        assert len(calls) == 1
        # second call: in-process memo, no re-probe
        assert kg.ensure_kernel_safe("lemke_pallas", ("s1",), {"B": 8})
        assert len(calls) == 1
        # fresh process simulation: memo cleared, .ok marker skips the probe
        kg.reset_for_tests()
        assert kg.ensure_kernel_safe("lemke_pallas", ("s1",), {"B": 8})
        assert len(calls) == 1
        assert list(guard_dir.glob("*.ok"))

    def test_crashed_probe_tombstones_forever(self, guard_dir, monkeypatch):
        calls = []
        monkeypatch.setattr(kg, "_PROBE_OVERRIDE",
                            lambda tag, params: calls.append(tag) or 139)
        assert not kg.ensure_kernel_safe("lemke_pallas", ("s2",), {"B": 8})
        assert list(guard_dir.glob("*.tombstone"))
        # later processes demote without re-probing the crasher
        kg.reset_for_tests()
        assert not kg.ensure_kernel_safe("lemke_pallas", ("s2",), {"B": 8})
        assert len(calls) == 1

    def test_timeout_demotes_without_tombstone(self, guard_dir, monkeypatch):
        monkeypatch.setattr(kg, "_PROBE_OVERRIDE", lambda tag, params: None)
        assert not kg.ensure_kernel_safe("lemke_pallas", ("s3",), {"B": 8})
        assert not list(guard_dir.glob("*.tombstone"))
        # a later process may retry (environment trouble, not kernel guilt)
        kg.reset_for_tests()
        monkeypatch.setattr(kg, "_PROBE_OVERRIDE", lambda tag, params: 0)
        assert kg.ensure_kernel_safe("lemke_pallas", ("s3",), {"B": 8})


class TestFaultingKernelDemotesNotDies:
    def test_lemke_auto_demotes_on_simulated_fault(self, guard_dir,
                                                   monkeypatch):
        """The production dispatcher demotes a signature whose probe
        'crashed' and still returns a correct solve via the XLA engine."""
        import qpn_tpu.ops.lemke as lk
        from qpn_tpu.utils.metrics import METRICS
        monkeypatch.setattr(kg, "_PROBE_OVERRIDE", lambda tag, params: 139)
        import qpn_tpu.config as cfg
        monkeypatch.setattr(cfg, "effective_backend", lambda: "tpu")
        monkeypatch.setattr(CONFIG, "pallas_strict", False)
        monkeypatch.setattr(lk, "_PALLAS_FAILED", set())

        rng = np.random.default_rng(0)
        n, B = 10, 8
        A = rng.standard_normal((n, n))
        M = np.repeat((A @ A.T / n + 0.5 * np.eye(n))[None], B, axis=0)
        q = rng.standard_normal((B, n))
        l = np.full((B, n), -1.0)
        u = np.full((B, n), 1.0)
        c0 = METRICS.counters.get("lemke_pallas_guard_demoted", 0)
        out = lk.solve_lemke_batch_state_auto(
            np.float32(M), np.float32(q), np.float32(l), np.float32(u),
            np.zeros((B, n), np.float32), np.ones((B, n), bool),
            tol=1e-6, piv_tol=1e-5, max_pivots=256)
        z = np.asarray(out[0])
        assert np.isfinite(z).all()          # solved via the XLA route
        assert METRICS.counters.get("lemke_pallas_guard_demoted", 0) > c0
        assert list(guard_dir.glob("*.tombstone"))

    def test_strict_mode_raises_instead(self, guard_dir, monkeypatch):
        import qpn_tpu.ops.lemke as lk
        monkeypatch.setattr(kg, "_PROBE_OVERRIDE", lambda tag, params: 139)
        import qpn_tpu.config as cfg
        monkeypatch.setattr(cfg, "effective_backend", lambda: "tpu")
        monkeypatch.setattr(CONFIG, "pallas_strict", True)
        monkeypatch.setattr(lk, "_PALLAS_FAILED", set())
        B, n = 8, 6
        with pytest.raises(RuntimeError, match="validation probe"):
            lk.solve_lemke_batch_state_auto(
                np.zeros((B, n, n), np.float32) + np.eye(n, dtype=np.float32),
                np.ones((B, n), np.float32),
                np.full((B, n), -1, np.float32),
                np.full((B, n), 1, np.float32),
                np.zeros((B, n), np.float32), np.ones((B, n), bool),
                max_pivots=256)


class TestGluePlacement:
    def test_glue_device_pins_cpu_on_accelerator(self, monkeypatch):
        import qpn_tpu.config as cfg
        import jax
        monkeypatch.setattr(cfg.jax, "default_backend", lambda: "tpu")
        with glue_dispatch_device() as routed:
            assert routed
        monkeypatch.setattr(cfg.jax, "default_backend", lambda: "cpu")
        with glue_dispatch_device() as routed:
            assert not routed

    def test_solve_avi_runs_under_glue_placement(self, monkeypatch):
        """The per-QEP multi-start solve (the reference's serial PATH call)
        must route through the glue placement — the path that wedged the
        round-4 TPU zoo for minutes per model."""
        import contextlib
        import qpn_tpu.config as cfg
        from qpn_tpu.ops.avi import AVI, solve_avi, Status
        entered = []

        @contextlib.contextmanager
        def spy():
            entered.append(1)
            yield False
        monkeypatch.setattr(cfg, "glue_dispatch_device", spy)
        n = 4
        avi = AVI(M=np.eye(n), N=np.zeros((n, 1)), o=-np.ones(n),
                  l=np.full(n, -2.0), u=np.full(n, 2.0))
        z, status = solve_avi(avi, np.zeros(n), np.zeros(1))
        assert status == Status.SUCCESS
        assert np.allclose(z, 1.0, atol=1e-8)
        assert entered
