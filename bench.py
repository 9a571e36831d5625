"""Benchmark: batched AVI-piece throughput on the flagship robust_avoid
scenario ensemble (the BASELINE.json primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value       = AVI KKT systems solved per second on one chip, batched.
vs_baseline = speedup vs solving the same systems one-at-a-time sequentially
              on the same device — the stand-in for the reference's
              single-threaded PATH loop (the reference publishes no numbers;
              BASELINE.md documents this).
"""

import json
import subprocess
import sys
import time

import numpy as np

_PROBE = ("import jax; d = jax.devices()[0]; "
          "import jax.numpy as jnp; "
          "jnp.ones((8, 8)).sum().block_until_ready(); "
          "print(d.platform)")


def _accelerator_usable(timeout_s: float = 120.0) -> bool:
    """True iff jax backend init + one tiny dispatch completes in a killable
    subprocess.  A wedged axon tunnel hangs (never errors), so the probe must
    be out-of-process — an in-process hang would take the bench down with it."""
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE],
                             capture_output=True, timeout=timeout_s)
        return out.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    import os
    import jax

    if os.environ.get("QPN_BENCH_CPU"):     # debug/CI runs off-chip
        jax.config.update("jax_platforms", "cpu")
    elif not _accelerator_usable():
        # The TPU platform is absent or wedged (this image's axon tunnel can
        # hang forever on stale chip claims — a hang, not an error, so probe
        # it in a killable subprocess before touching jax.devices() here).
        print("bench: accelerator probe failed; falling back to CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    backend = jax.devices()[0].platform
    import jax.numpy as jnp

    # This is a controlled same-device comparison: the production
    # small-dispatch CPU routing (config.small_qp_on_cpu) would silently
    # move the B=1 sequential-baseline lane off-chip, so pin it off here.
    from qpn_tpu.config import CONFIG
    CONFIG.small_qp_on_cpu = False

    from qpn_tpu.models.robust_avoid import scenario_batch_gavis
    from qpn_tpu.ops.avi import solve_avi_batch_adaptive, solve_kkt_avi_batch
    import functools
    # production path: the scenario ensemble is a stacked QP-KKT system, so
    # the structured route (batched ADMM QP + dual reconstruction + f64
    # Newton polish, AVI-residual-audited) is used when the structure tag is
    # present; the generic adaptive hybrid solver covers everything else
    solve_avi_batch_generic = functools.partial(
        solve_avi_batch_adaptive, mixed=(backend == "tpu"),
        onchip_eg_steps=20000 if backend == "tpu" else 0)

    S = 256
    batch = scenario_batch_gavis(num_scenarios=S, T=2, num_obj=1,
                                 num_poly_faces=4, seed=0)
    M, q, l, u = batch["M"], batch["q"], batch["l"], batch["u"]
    z0, mask = batch["z0"], batch["mask"]
    structure = batch.get("structure")

    def solve_ensemble(M, q, l, u, z0, mask, tol):
        if structure is not None:
            return solve_kkt_avi_batch(M, q, l, u, mask, structure, tol=tol)
        return solve_avi_batch_generic(M, q, l, u, z0, mask, tol=tol)

    tol = 1e-8

    # warmup / compile
    res = solve_ensemble(M, q, l, u, z0, mask, tol=tol)
    _ = np.asarray(res.z)

    # min-of-runs: the work is identical each run, so run-to-run spread is
    # host/tunnel noise, not workload variance — min is the sustainable rate
    n_runs = 5
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        res = solve_ensemble(M, q, l, u, z0, mask, tol=tol)
        _ = np.asarray(res.z)
        times.append(time.perf_counter() - t0)
    t_batch = min(times)
    throughput = S / t_batch
    conv = float(np.asarray(res.converged).mean())

    # sequential baseline: one system at a time (PATH-loop stand-in);
    # median per-call time — single-instance dispatches ride the tunnel
    # round-trip, whose tail spikes would otherwise dominate a mean
    K = 8
    r1 = solve_ensemble(M[:1], q[:1], l[:1], u[:1], z0[:1], mask[:1],
                        tol=tol)
    _ = np.asarray(r1.z)
    seq_times = []
    for i in range(K):
        t0 = time.perf_counter()
        r1 = solve_ensemble(M[i:i + 1], q[i:i + 1], l[i:i + 1], u[i:i + 1],
                            z0[i:i + 1], mask[i:i + 1],
                            tol=tol)
        _ = np.asarray(r1.z)
        seq_times.append(time.perf_counter() - t0)
    t_seq = float(np.median(seq_times))
    seq_throughput = 1.0 / t_seq

    # ---- MFU / roofline accounting --------------------------------------
    # Analytic flop count of the work actually executed (ADMM iterations per
    # lane as reported by the solver; the Newton polish tail is excluded, so
    # this is a slight lower bound on useful flops).  f64 has no native MXU
    # rate — emulated f64 work is reported against the f32 peak, which makes
    # the MFU figure conservative.  These small dense solves are latency/
    # bandwidth bound; the hbm fraction shows the binding roofline.
    from qpn_tpu.utils.flops import (V5E_HBM_GBS, V5E_PEAK_F32, lemke_flops)
    extra = {}
    if structure is not None:
        # structured route = batched Lemke pivoting: iters are pivot counts,
        # each pivot touches the (n, 3n+2) tableau once
        n_avi = M.shape[1]
        it = np.asarray(res.iters, dtype=np.float64)
        fl = lemke_flops(n_avi, it)
        by = 8.0 * float(np.sum(it)) * n_avi * (3 * n_avi + 2) * 2
        achieved = fl / t_batch
        extra = {
            "achieved_gflops": round(achieved / 1e9, 2),
            "mfu_vs_f32_peak": round(achieved / V5E_PEAK_F32, 6),
            "hbm_bw_frac": round((by / t_batch) / V5E_HBM_GBS, 4),
        }

    # ---- large-config row: arithmetic-bound regime (VERDICT r2 item 2) --
    # T=8 trajectory horizon, num_obj=4, S=1024 scenarios sharing one KKT
    # matrix (n=608): solved by the shared-matrix GEMM route
    # (ops/shared_kkt) whose per-iteration work is (S,n)@(n,n) MXU matmuls
    # plus batched f32 LU factorizations — the regime where MFU, not
    # dispatch latency, is the binding roofline.  TPU-only: the CPU
    # fallback backend has no MXU and the row would measure the wrong
    # machine.
    if backend != "cpu":
        from qpn_tpu.ops.shared_kkt import solve_kkt_avi_shared
        Sl = 1024
        big = scenario_batch_gavis(num_scenarios=Sl, T=8, num_obj=4,
                                   num_poly_faces=4, seed=0)
        stats = {}
        r = solve_kkt_avi_shared(big["M"][0], big["q"], big["l"], big["u"],
                                 None, tol=1e-8, stats=stats)   # warm/compile
        tl = []
        for _ in range(3):
            stats = {}
            t0 = time.perf_counter()
            r = solve_kkt_avi_shared(big["M"][0], big["q"], big["l"],
                                     big["u"], None, tol=1e-8, stats=stats)
            tl.append(time.perf_counter() - t0)
        t_large = min(tl)
        conv_l = float(np.asarray(r.converged).mean())
        achieved_l = stats["device_flops"] / t_large
        extra["large"] = {
            "config": f"robust_avoid T=8 num_obj=4 S={Sl} n={big['M'].shape[1]}",
            "solves_per_sec": round(Sl / t_large, 2),
            "conv": round(conv_l, 4),
            "achieved_gflops": round(achieved_l / 1e9, 2),
            "mfu_vs_f32_peak": round(achieved_l / V5E_PEAK_F32, 6),
            "hbm_bw_frac": round(
                (stats["device_bytes"] / t_large) / V5E_HBM_GBS, 4),
        }

    print(json.dumps({
        "metric": f"avi_kkt_solves_per_sec_per_chip[{backend},batch={S},"
                  f"conv={conv:.2f}]",
        "value": round(throughput, 2),
        "unit": "solves/s",
        "vs_baseline": round(throughput / seq_throughput, 2),
        **extra,
    }))


if __name__ == "__main__":
    main()
