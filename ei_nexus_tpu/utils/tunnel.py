"""Bounded-retry supervision for benchmarks against a remote TPU tunnel.

The deployment environment reaches its TPU through a tunnel that can die:
backend init then hangs minutes before raising, and an in-flight program
can hang forever (an unsupervised bench once hung 25 minutes). Nothing
inside the hung process can reliably interrupt a blocking C++ RPC, so the
only robust shape is process supervision: run the real work in a child
process (its own process group), enforce wall-clock deadlines from the
parent, retry with backoff while the deadline allows, and on exhaustion
emit a machine-readable error instead of a traceback or a hang.

Used by bench.py (supervisor/inner split) and __graft_entry__.entry()
(bounded probe + CPU fallback). No reference counterpart: the reference
(torch/CUDA, local GPU) has no tunnel to survive.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from typing import Dict, List, Optional, Sequence, Tuple

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "s = float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))));"
    "print('probe-ok', d[0].platform, s)"
)


def _log(msg: str) -> None:
    print(f"[tunnel] {msg}", file=sys.stderr, flush=True)


def _run_killable(cmd: Sequence[str], timeout: float,
                  env: Optional[Dict[str, str]] = None,
                  ) -> Tuple[Optional[int], str, str]:
    """Run cmd in its own process group; on timeout kill the whole group.

    Returns (returncode | None on timeout, stdout, stderr).
    """
    proc = subprocess.Popen(
        list(cmd), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, start_new_session=True)
    try:
        out, err = proc.communicate(timeout=timeout)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        out, err = proc.communicate()
        return None, out, err


def probe_backend(timeout: float = 270.0,
                  env: Optional[Dict[str, str]] = None,
                  ) -> Tuple[bool, str]:
    """Check the default JAX backend end to end (init + compile + fetch)
    in a subprocess. A dead tunnel hangs ~2 min inside backend init, so the
    probe must be killable from outside — hence the subprocess."""
    rc, out, err = _run_killable(
        [sys.executable, "-c", _PROBE_CODE], timeout, env=env)
    if rc == 0 and "probe-ok" in out:
        return True, ""
    if rc is None:
        return False, f"backend probe timed out after {timeout:.0f}s"
    tail = (err or out).strip().splitlines()[-3:]
    return False, f"backend probe rc={rc}: {' | '.join(tail)}"


def backend_is_remote() -> bool:
    """True when the resolved JAX platform list leads with a non-CPU
    (tunnelled) backend, i.e. when probing is worth the wait."""
    import jax
    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip() if plats else ""
    return first not in ("", "cpu")


def wait_for_backend(max_attempts: int = 3, probe_timeout: float = 270.0,
                     backoff: float = 60.0,
                     env: Optional[Dict[str, str]] = None,
                     ) -> Tuple[bool, str]:
    """Bounded probe-retry loop; never blocks longer than
    max_attempts * probe_timeout + (max_attempts - 1) * backoff."""
    err = ""
    for attempt in range(max_attempts):
        ok, err = probe_backend(probe_timeout, env=env)
        if ok:
            return True, ""
        _log(f"probe {attempt + 1}/{max_attempts} failed: {err}")
        if attempt + 1 < max_attempts:
            time.sleep(backoff)
    return False, err


def supervised_json(inner_cmd: Sequence[str], *, metric: str, unit: str,
                    deadline_s: float = 2400.0,
                    attempt_timeout: float = 1500.0,
                    probe_timeout: float = 270.0,
                    backoff: float = 60.0,
                    max_attempts: int = 4,
                    probe: bool = True,
                    env: Optional[Dict[str, str]] = None,
                    ) -> Dict[str, object]:
    """Run `inner_cmd` (which must print one JSON line on stdout) under a
    hard wall-clock deadline with bounded probe+retry.

    Returns the parsed JSON dict on success; on exhaustion returns
    {"metric", "value": 0.0, "unit", "vs_baseline": 0.0, "error": ...}
    so callers can always print one JSON line and exit 0.
    """
    t0 = time.monotonic()
    remaining = lambda: deadline_s - (time.monotonic() - t0)  # noqa: E731
    last_err = "no attempt made"
    attempts = 0
    while attempts < max_attempts and remaining() > 5.0:
        if probe:
            ok, perr = probe_backend(min(probe_timeout, remaining()),
                                     env=env)
            if not ok:
                last_err = perr
                _log(f"backend unavailable: {perr}")
                if remaining() > backoff + probe_timeout:
                    _log(f"retrying after {backoff:.0f}s backoff "
                         f"({remaining():.0f}s to deadline)")
                    time.sleep(backoff)
                    continue
                break
        attempts += 1
        budget = min(attempt_timeout, remaining())
        _log(f"attempt {attempts}/{max_attempts}, budget {budget:.0f}s")
        rc, out, err = _run_killable(inner_cmd, budget, env=env)
        if rc == 0:
            for line in reversed(out.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        return json.loads(line)
                    except json.JSONDecodeError:
                        break
            last_err = "inner exited 0 but printed no JSON line"
        elif rc is None:
            last_err = f"attempt timed out after {budget:.0f}s (killed)"
        else:
            tail = (err or out).strip().splitlines()[-3:]
            last_err = f"inner rc={rc}: {' | '.join(tail)}"
        _log(f"attempt failed: {last_err}")
        if attempts < max_attempts and remaining() > backoff + 5.0:
            time.sleep(backoff)
    return {"metric": metric, "value": 0.0, "unit": unit,
            "vs_baseline": 0.0, "error": last_err}
