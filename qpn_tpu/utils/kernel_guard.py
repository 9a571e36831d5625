"""First-use subprocess validation of Pallas/Mosaic kernel signatures.

A device-level kernel fault (the BENCH_r03 class) kills the HOST process —
it cannot be caught with try/except, so the in-process demotion hook in
``ops/lemke.py`` (``pallas_strict`` machinery) only contains compile-time
and Python-level failures.  This module closes the gap for production use:

* The FIRST time a (kernel tag, signature class, backend) combination is
  about to run on real accelerator hardware, a tiny representative instance
  executes in a KILLABLE SUBPROCESS (``kernel_probe_worker``).  The XLA
  persistent compilation cache is shared, so the probe's compile warms the
  cache for the caller — the probe costs one backend init, once per
  signature per cache lifetime.
* A clean probe writes an ``.ok`` marker: later processes skip the probe.
* A CRASHED probe (SIGSEGV / worker death / nonzero exit) writes a
  TOMBSTONE: the signature is demoted loudly to the XLA engine here and in
  every later process, and the solve proceeds — a faulting kernel class can
  never kill a user's solve again.
* A TIMED-OUT probe demotes for this process only (no tombstone): the axon
  tunnel wedging for minutes is a known environment failure that says
  nothing about the kernel.

Same validate-in-subprocess pattern as utils/aot_cache.py's artifact
validator; state lives next to it on disk.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
from typing import Optional

log = logging.getLogger(__name__)

GUARD_DIR = os.environ.get(
    "QPN_KERNEL_GUARD_DIR",
    os.path.expanduser("~/.cache/qpn_tpu_kernel_guard"))

#: in-process memo: sig key -> bool (safe)
_STATE: dict = {}

#: test hook — replaces the subprocess probe when set (callable sig -> rc)
_PROBE_OVERRIDE = None


def _key(tag: str, sig) -> str:
    import hashlib
    payload = json.dumps([tag, list(map(str, sig))], sort_keys=True)
    return f"{tag}-{hashlib.sha256(payload.encode()).hexdigest()[:16]}"


def _marker(key: str, kind: str) -> str:
    return os.path.join(GUARD_DIR, f"{key}.{kind}")


def probe_rc(tag: str, params: dict, timeout: float) -> Optional[int]:
    """Run the representative instance in a killable subprocess; returns the
    exit code, or None on timeout."""
    if _PROBE_OVERRIDE is not None:
        return _PROBE_OVERRIDE(tag, params)
    cmd = [sys.executable, "-m", "qpn_tpu.utils.kernel_probe_worker",
           tag, json.dumps(params)]
    env = dict(os.environ)
    env["QPN_KERNEL_GUARD"] = "off"     # the probe must not probe itself
    try:
        out = subprocess.run(cmd, capture_output=True, timeout=timeout,
                             env=env)
    except subprocess.TimeoutExpired:
        return None
    except OSError:
        return 127
    if out.returncode != 0:
        log.warning("kernel probe %s rc=%d stderr tail: %s", tag,
                    out.returncode,
                    out.stderr[-800:].decode(errors="replace"))
    return out.returncode


def ensure_kernel_safe(tag: str, sig, params: dict,
                       timeout: float = 900.0) -> bool:
    """True iff the kernel signature is safe to run in-process on the
    accelerator.  False demotes the caller to its fallback engine."""
    key = _key(tag, sig)
    if key in _STATE:
        return _STATE[key]
    os.makedirs(GUARD_DIR, exist_ok=True)
    if os.path.exists(_marker(key, "ok")):
        _STATE[key] = True
        return True
    if os.path.exists(_marker(key, "tombstone")):
        log.warning(
            "kernel %s signature %s is tombstoned (crashed a previous "
            "probe) — demoted to the fallback engine", tag, sig)
        _STATE[key] = False
        return False
    rc = probe_rc(tag, params, timeout)
    if rc == 0:
        with open(_marker(key, "ok"), "w") as fh:
            fh.write(json.dumps(params))
        _STATE[key] = True
        return True
    if rc is None:
        # timeout: environment trouble (wedged tunnel), not kernel guilt —
        # demote for THIS process only
        log.warning("kernel probe %s timed out — demoting for this process "
                    "(no tombstone)", tag)
        _STATE[key] = False
        return False
    with open(_marker(key, "tombstone"), "w") as fh:
        fh.write(json.dumps({"params": params, "rc": rc}))
    log.error(
        "kernel %s signature %s CRASHED its validation probe (rc=%d) — "
        "tombstoned; this and every later process demotes it to the "
        "fallback engine", tag, sig, rc)
    _STATE[key] = False
    return False


def reset_for_tests():
    _STATE.clear()
