"""Benchmark: batched AVI-piece throughput on the flagship robust_avoid
scenario ensemble (the BASELINE.json primary metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value       = AVI KKT systems solved per second on one chip, batched.
vs_baseline = speedup vs solving the same systems one-at-a-time sequentially
              on the same device — the stand-in for the reference's
              single-threaded PATH loop (the reference publishes no numbers;
              BASELINE.md documents this).

Crash containment (BENCH_r03 postmortem): round 3's run kernel-faulted the
TPU worker in the new "large" row AFTER the flagship row had been measured,
and because the JSON printed only at the very end, the whole round recorded
no number.  The bench is now an ORCHESTRATOR: each row runs in its own
subprocess (``--row=flagship`` / ``--row=large``) that initializes the
device, measures, prints its JSON fragment, and exits — a device fault in
any row degrades to an ``{"error": ...}`` field instead of data loss.  Rows
run sequentially (the axon chip claim hands off between cleanly-exited
processes in <1s; measured).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_PROBE = ("import jax; d = jax.devices()[0]; "
          "import jax.numpy as jnp; "
          "jnp.ones((8, 8)).sum().block_until_ready(); "
          "print(d.platform)")


def _accelerator_usable(timeout_s: float = 300.0) -> bool:
    """True iff jax backend init + one tiny dispatch completes in a killable
    subprocess.  A wedged axon tunnel hangs (never errors), so the probe must
    be out-of-process — an in-process hang would take the bench down with it.
    (Claim handoff after an abnormally-killed process takes minutes —
    measured — so the timeout is generous.)"""
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE],
                             capture_output=True, timeout=timeout_s)
        return out.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _run_row(row: str, timeout_s: float, extra_env=None):
    """Run one bench row in a killable subprocess; return (dict|None, meta).

    The row prints its result as the LAST stdout line (a JSON object).  On
    any failure the returned meta captures rc and the tail of stderr,
    including the terminal device/XLA error text (ADVICE r3: BENCH_r03's
    tail truncated before the root-cause line)."""
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), f"--row={row}"],
            capture_output=True, timeout=timeout_s, env=env, text=True)
    except subprocess.TimeoutExpired as e:
        tail = ((e.stderr or b"").decode(errors="replace")
                if isinstance(e.stderr, bytes) else (e.stderr or ""))
        return None, {"error": f"timeout after {timeout_s:.0f}s",
                      "stderr_tail": tail[-2000:]}
    except OSError as e:  # pragma: no cover
        return None, {"error": f"spawn failed: {e}"}
    last = ""
    for line in out.stdout.strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            last = line
    if out.returncode == 0 and last:
        try:
            return json.loads(last), {}
        except json.JSONDecodeError:
            pass
    return None, {"error": f"row '{row}' exited rc={out.returncode}",
                  "stderr_tail": out.stderr[-4000:]}


# --------------------------------------------------------------------------
#  Row workers (each runs in its own process)
# --------------------------------------------------------------------------

def _init_backend():
    import jax
    if os.environ.get("QPN_BENCH_CPU"):     # debug/CI runs off-chip
        jax.config.update("jax_platforms", "cpu")
    backend = jax.devices()[0].platform
    from qpn_tpu.config import CONFIG
    # controlled same-device comparison: the production small-dispatch CPU
    # routing would silently move the B=1 sequential-baseline lane off-chip
    CONFIG.small_qp_on_cpu = False
    return backend


def row_flagship():
    """256-lane robust_avoid certificate ensemble through the production
    structured route (batched Lemke pivoting + f64 refactorization)."""
    backend = _init_backend()
    import functools
    import jax
    from qpn_tpu.models.robust_avoid import scenario_batch_gavis
    from qpn_tpu.ops.avi import solve_avi_batch_adaptive, solve_kkt_avi_batch
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

    # spread-quoted runs (VERDICT r4 item 1): the workload is identical
    # each run, so the spread is host/tunnel noise — median is the quoted
    # rate, min/max bound it
    n_runs = 7
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        res = solve_ensemble(M, q, l, u, z0, mask, tol=tol)
        _ = np.asarray(res.z)
        times.append(time.perf_counter() - t0)
    t_batch = float(np.median(times))
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

    out = {
        "backend": backend,
        "batch": S,
        "conv": round(conv, 4),
        "solves_per_sec": round(throughput, 2),
        "solves_per_sec_min": round(S / max(times), 2),
        "solves_per_sec_max": round(S / min(times), 2),
        "regime": "latency",   # small-n ensemble; the tunnel round-trip is
                               # part of every dispatch (BASELINE.md)
        "vs_sequential": round(throughput * t_seq, 2),
    }

    # MFU / roofline accounting: analytic flop count of the work actually
    # executed (structured route = batched Lemke pivoting; iters are pivot
    # counts, each touching the (n, 3n+2) tableau once).  These small f64
    # solves are latency-bound; the hbm fraction shows the binding roofline.
    from qpn_tpu.utils.flops import (V5E_HBM_GBS, V5E_PEAK_F32, lemke_flops)
    if structure is not None:
        n_avi = M.shape[1]
        it = np.asarray(res.iters, dtype=np.float64)
        fl = lemke_flops(n_avi, it)
        by = 8.0 * float(np.sum(it)) * n_avi * (3 * n_avi + 2) * 2
        achieved = fl / t_batch
        out.update({
            "achieved_gflops": round(achieved / 1e9, 2),
            "mfu_vs_f32_peak": round(achieved / V5E_PEAK_F32, 6),
            "hbm_bw_frac": round((by / t_batch) / V5E_HBM_GBS, 4),
        })
    print(json.dumps(out))


def row_large():
    """Arithmetic-bound regime (VERDICT r2 item 2): T=8 trajectory horizon,
    num_obj=4, S=1024 scenarios sharing one KKT matrix (n=608), solved by
    the shared-matrix GEMM route (ops/shared_kkt) whose per-iteration work
    is (S,n)@(n,n) MXU matmuls plus batched f32 LU factorizations — the
    regime where MFU, not dispatch latency, is the binding roofline."""
    backend = _init_backend()
    from qpn_tpu.models.robust_avoid import scenario_batch_gavis
    from qpn_tpu.ops.shared_kkt import solve_kkt_avi_shared
    from qpn_tpu.utils.flops import V5E_HBM_GBS, V5E_PEAK_F32
    Sl = 1024
    big = scenario_batch_gavis(num_scenarios=Sl, T=8, num_obj=4,
                               num_poly_faces=4, seed=0)
    stats = {}
    r = solve_kkt_avi_shared(big["M"][0], big["q"], big["l"], big["u"],
                             None, tol=1e-8, stats=stats,
                             structure=big["structure"])   # warm/compile
    tl = []
    for _ in range(5):
        stats = {}
        t0 = time.perf_counter()
        r = solve_kkt_avi_shared(big["M"][0], big["q"], big["l"],
                                 big["u"], None, tol=1e-8, stats=stats,
                                 structure=big["structure"])
        tl.append(time.perf_counter() - t0)
    t_large = float(np.median(tl))
    conv_l = float(np.asarray(r.converged).mean())
    achieved_l = stats["device_flops"] / t_large
    print(json.dumps({
        "config": f"robust_avoid T=8 num_obj=4 S={Sl} n={big['M'].shape[1]}",
        "backend": backend,
        "solves_per_sec": round(Sl / t_large, 2),
        "solves_per_sec_min": round(Sl / max(tl), 2),
        "solves_per_sec_max": round(Sl / min(tl), 2),
        "conv": round(conv_l, 4),
        "achieved_gflops": round(achieved_l / 1e9, 2),
        "mfu_vs_f32_peak": round(achieved_l / V5E_PEAK_F32, 6),
        "hbm_bw_frac": round(
            (stats["device_bytes"] / t_large) / V5E_HBM_GBS, 4),
        "eg_iters": stats.get("eg_iters"),
        "host_solves": stats.get("host_solves"),
        "phase_t": stats.get("phase_t"),
    }))


def row_hard():
    """Degenerate-class robustness row (VERDICT r4 item 2): seed-2
    ensembles are dual-degenerate-heavy — the class that cost 140 s of
    host-pinned f64 ADMM in round 4.  Records the warm wall of the chip
    structured rung (target: far under the 60 s bar)."""
    backend = _init_backend()
    from qpn_tpu.models.robust_avoid import scenario_batch_gavis
    from qpn_tpu.ops.shared_kkt import solve_kkt_avi_shared
    Sh = 512
    big = scenario_batch_gavis(num_scenarios=Sh, T=8, num_obj=4,
                               num_poly_faces=4, seed=2)
    r = solve_kkt_avi_shared(big["M"][0], big["q"], big["l"], big["u"],
                             None, tol=1e-8,
                             structure=big["structure"])   # warm/compile
    tl = []
    for _ in range(3):
        stats = {}
        t0 = time.perf_counter()
        r = solve_kkt_avi_shared(big["M"][0], big["q"], big["l"],
                                 big["u"], None, tol=1e-8, stats=stats,
                                 structure=big["structure"])
        tl.append(time.perf_counter() - t0)
    print(json.dumps({
        "config": f"robust_avoid T=8 num_obj=4 S={Sh} n={big['M'].shape[1]}"
                  " seed=2 (degenerate-heavy)",
        "backend": backend,
        "wall_s": round(float(np.median(tl)), 2),
        "wall_s_min": round(min(tl), 2),
        "wall_s_max": round(max(tl), 2),
        "conv": round(float(np.asarray(r.converged).mean()), 4),
        "host_solves": stats.get("host_solves"),
        "phase_t": stats.get("phase_t"),
    }))


def main():
    for a in sys.argv[1:]:
        if a.startswith("--row="):
            {"flagship": row_flagship, "large": row_large,
             "hard": row_hard}[a[6:]]()
            return

    on_cpu = bool(os.environ.get("QPN_BENCH_CPU")) or not _accelerator_usable()
    env = {"QPN_BENCH_CPU": "1"} if on_cpu else None
    if on_cpu and not os.environ.get("QPN_BENCH_CPU"):
        print("bench: accelerator probe failed; falling back to CPU",
              file=sys.stderr)

    # flagship row FIRST and isolated: its number can no longer be lost to a
    # later row's device fault (the BENCH_r03 failure mode)
    flag_timeout = float(os.environ.get("QPN_BENCH_ROW_TIMEOUT", 2400))
    flag, flag_meta = _run_row("flagship", flag_timeout, env)

    extra = {}
    if flag is None:
        # degraded mode: report the failure but still emit valid JSON
        record = {
            "metric": "avi_kkt_solves_per_sec_per_chip[failed]",
            "value": 0.0, "unit": "solves/s", "vs_baseline": 0.0,
            "flagship_error": flag_meta,
        }
    else:
        record = {
            "metric": (f"avi_kkt_solves_per_sec_per_chip"
                       f"[{flag['backend']},batch={flag['batch']},"
                       f"conv={flag['conv']:.2f}]"),
            "value": flag["solves_per_sec"],
            "unit": "solves/s",
            "vs_baseline": flag["vs_sequential"],
        }
        for k in ("achieved_gflops", "mfu_vs_f32_peak", "hbm_bw_frac"):
            if k in flag:
                extra[k] = flag[k]

    # large + hard rows: TPU-only (the CPU fallback backend has no MXU and
    # the rows would measure the wrong machine); a fault in either is
    # REPORTED, not fatal
    if not on_cpu:
        large_timeout = float(os.environ.get("QPN_BENCH_LARGE_TIMEOUT", 3000))
        large, large_meta = _run_row("large", large_timeout, env)
        extra["large"] = large if large is not None else large_meta
        hard, hard_meta = _run_row("hard", large_timeout, env)
        extra["hard_seed"] = hard if hard is not None else hard_meta

    record.update(extra)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
