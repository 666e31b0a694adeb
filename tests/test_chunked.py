"""Chunked training (tools/train_chunked.py) == uninterrupted, bit-exactly.

The axon tunnel's PJRT client leaks host memory per device_put (BASELINE.md
round 4), so production TPU training runs as a sequence of --max-steps
capped processes. This test pins the supervisor's correctness on CPU: an
early-stopped 'final' checkpoint records the in-progress epoch, the next
chunk resumes from it, and the chunked parameter trajectory equals the
uninterrupted one on every leaf (same determinism contract as
tests/test_preemption.py).
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("chunked_mvsec") / "data"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_mini_mvsec.py"),
         "--root", str(root), "--train-frames", "184",
         "--sequences", "indoor_flying1"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    return root


def _common(data_root):
    return ["--config", "configs/train_EIM_stage1_MVSEC_SP_MNN.yaml",
            f"dataset.data_path={data_root}",
            "dataset.train_sequences=[indoor_flying1]",
            "dataset.train.batch_size=2", "dataset.train.num_workers=2",
            "train.epochs=2", "device=cpu", "logger.status_freq=1000"]


def _env():
    return {k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}


def _newest_final_params(root):
    finals = glob.glob(os.path.join(root, "*", "checkpoints", "final"))
    assert finals
    newest = max(finals, key=os.path.getmtime)
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(os.path.abspath(newest))


def test_chunked_equals_uninterrupted(mini_data, tmp_path):
    run_a = tmp_path / "a"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_extractor.py"),
         "--max-steps", "14", *_common(mini_data),
         f"logger.output_dir={run_a}"],
        capture_output=True, text=True, cwd=REPO, env=_env(), timeout=900)
    assert r.returncode == 0, r.stdout[-3000:]

    run_b = tmp_path / "b"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_chunked.py"),
         "--trainer", "train_extractor.py", "--chunk-steps", "7",
         "--out", str(run_b), "--max-chunks", "2", "--",
         *_common(mini_data)],
        capture_output=True, text=True, cwd=REPO, env=_env(), timeout=1500)
    # rc 1 = max-chunks exhausted before the 2 config epochs completed —
    # expected here; the point is the trajectory up to step 14
    assert r.returncode in (0, 1), r.stdout[-3000:]
    assert "[chunk 1]" in r.stdout and "resume=" in r.stdout, r.stdout

    pa = _newest_final_params(str(run_a))
    pb = _newest_final_params(str(run_b))
    assert int(np.asarray(pa["step"])) == 14
    assert int(np.asarray(pb["step"])) == 14
    # early-stopped final must record the IN-PROGRESS epoch (step 7 of a
    # 12-step epoch 0 -> epoch 0), not the config epoch count
    import jax
    la = jax.tree_util.tree_leaves_with_path(pa["params"])
    lb = dict(jax.tree_util.tree_leaves_with_path(pb["params"]))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(lb[path]),
                                      err_msg=str(path))


def test_reached_step_primes_fresh_supervisor(tmp_path):
    """A fresh supervisor process must prime its step budget from the step
    prior chunks reached (parsed from run logs), not restart at 0 — round-4b
    measured a whole wasted process cycle (start + restore + 1 step) when a
    second `train_chunked.py` invocation reused an --out with 1200 steps
    already trained."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import train_chunked as tc

    assert tc.reached_step(str(tmp_path)) == 0
    for name, steps in (("run_a", (400, 1200)), ("run_b", (700,))):
        d = tmp_path / name
        d.mkdir()
        with open(d / "log.txt", "w") as f:
            for s in steps:
                f.write(f"blah\nstopped at step {s}, epoch 3/60\n")
    assert tc.reached_step(str(tmp_path)) == 1200
