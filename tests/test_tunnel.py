"""Supervision logic for the remote-TPU tunnel (ei_nexus_tpu/utils/tunnel).

The tunnel can die mid-run; bench.py must never hang or print a traceback
tail — it must emit one JSON line with an "error" field and exit 0. These
tests drive `supervised_json` with fake inner commands (instant, so no
backend is touched) and verify success, retry, timeout-kill, and
error-JSON paths.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from ei_nexus_tpu.utils.tunnel import _run_killable, supervised_json

PY = sys.executable


def test_success_parses_last_json_line():
    out = supervised_json(
        [PY, "-c", "print('noise'); print('{\"metric\": \"m\", "
                   "\"value\": 42.0, \"unit\": \"u\", "
                   "\"vs_baseline\": 2.0}')"],
        metric="m", unit="u", probe=False, deadline_s=30,
        attempt_timeout=20, backoff=0.01, max_attempts=2)
    assert out == {"metric": "m", "value": 42.0, "unit": "u",
                   "vs_baseline": 2.0}


def test_failing_inner_yields_error_json_not_exception():
    t0 = time.monotonic()
    out = supervised_json(
        [PY, "-c", "import sys; print('boom', file=sys.stderr); "
                   "sys.exit(3)"],
        metric="m", unit="u", probe=False, deadline_s=30,
        attempt_timeout=20, backoff=0.01, max_attempts=3)
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert "rc=3" in out["error"] and "boom" in out["error"]
    assert time.monotonic() - t0 < 20  # three attempts, tiny backoff


def test_hanging_inner_is_killed_within_budget():
    t0 = time.monotonic()
    out = supervised_json(
        [PY, "-c", "import time; time.sleep(600)"],
        metric="m", unit="u", probe=False, deadline_s=8,
        attempt_timeout=2, backoff=0.01, max_attempts=2)
    elapsed = time.monotonic() - t0
    assert "timed out" in out["error"]
    assert elapsed < 15  # 2 attempts x 2 s + slack; never the 600 s sleep


def test_kill_reaches_grandchildren():
    # the bench inner itself never forks, but the kill must take out the
    # whole process group in case jax runtime threads/helpers linger
    code = ("import subprocess, sys, time;"
            "subprocess.Popen([sys.executable,'-c','import time;"
            "time.sleep(600)']); time.sleep(600)")
    t0 = time.monotonic()
    rc, _, _ = _run_killable([PY, "-c", code], timeout=2)
    assert rc is None
    assert time.monotonic() - t0 < 10


def test_deadline_bounds_total_time_even_with_many_attempts():
    t0 = time.monotonic()
    out = supervised_json(
        [PY, "-c", "import sys; sys.exit(1)"],
        metric="m", unit="u", probe=False, deadline_s=3,
        attempt_timeout=60, backoff=60, max_attempts=50)
    assert "error" in out
    # backoff is skipped when it would cross the deadline
    assert time.monotonic() - t0 < 10


def test_bench_cli_emits_error_json_rc0_when_inner_fails():
    """End-to-end: `python bench.py` with an injected inner failure must
    exit 0 and print one JSON line with an error field (never a
    traceback tail — the round-2 driver capture failed exactly there)."""
    env = dict(os.environ)
    env.update({
        "EI_NEXUS_BENCH_DEADLINE": "60", "EI_NEXUS_BENCH_TIMEOUT": "30",
        "EI_NEXUS_BENCH_ATTEMPTS": "1", "EI_NEXUS_BENCH_BACKOFF": "0.1",
        "EI_NEXUS_BENCH_PROBE": "0",
        "EI_NEXUS_BENCH_FAIL": "tunnel down (test)",
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [PY, os.path.join(repo, "bench.py")], capture_output=True,
        text=True, env=env, cwd=repo, timeout=120)
    assert proc.returncode == 0, proc.stderr[-500:]
    line = proc.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "matched_frame_pairs_per_s_per_chip"
    assert "injected failure" in parsed["error"]
