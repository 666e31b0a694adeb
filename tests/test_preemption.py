"""Preemption -> GracefulShutdown checkpoint -> exact resume.

The reference has no preemption handling (SURVEY.md §5: crash recovery is
a manual restart that replays the epoch). This framework checkpoints on
SIGTERM (train_extractor.py GracefulShutdown) and resumes MID-EPOCH at the
exact batch where the signal landed: the loader's epoch permutation is a
pure function of (seed, epoch), per-sample augmentation randomness is a
pure function of (seed, epoch, index), and the per-step jax PRNG is
fold_in(global_step) — so a preempted-and-resumed run must reproduce the
uninterrupted parameter trajectory BIT-EXACTLY on CPU f32.

This test runs the real trainer CLI three times on a generated minimal
MVSEC fixture: (A) uninterrupted to max_steps, (B) SIGTERM'd mid-epoch
after a few steps, (C) resumed from B's preempted checkpoint to the same
max_steps. Final parameters of A and C must match exactly.
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

@pytest.fixture(scope="module")
def mini_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt_mvsec") / "data"
    # indoor_flying1 crops (80, -80) -> 184 frames leave 24 usable samples
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_mini_mvsec.py"),
         "--root", str(root), "--train-frames", "184",
         "--sequences", "indoor_flying1"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    return root


def _run_trainer(run_root, data_root, max_steps, resume=None, wait=True):
    cmd = [
        sys.executable, os.path.join(REPO, "train_extractor.py"),
        "--config", "configs/train_EIM_stage1_MVSEC_SP_MNN.yaml",
        "--max-steps", str(max_steps),
        f"dataset.data_path={data_root}",
        "dataset.train_sequences=[indoor_flying1]",
        "dataset.train.batch_size=2",
        "dataset.train.num_workers=2",
        "train.epochs=2",
        "device=cpu",
        f"logger.output_dir={run_root}",
        "logger.status_freq=1",
    ]
    if resume:
        cmd += ["--resume", resume]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    if not wait:
        return proc
    out, _ = proc.communicate(timeout=900)
    assert proc.returncode == 0, out[-3000:]
    return out


def _final_params(run_root):
    dirs = glob.glob(os.path.join(run_root, "*", "checkpoints", "final"))
    assert len(dirs) == 1, dirs
    import orbax.checkpoint as ocp
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(dirs[0]))
    return raw


def _steps_logged(run_root):
    """Steps flushed so far (status_freq=1 -> one jsonl record per step)."""
    files = glob.glob(os.path.join(run_root, "*", "metrics.jsonl"))
    if not files:
        return 0
    with open(files[0]) as f:
        return sum(1 for line in f if line.strip())


def test_preempt_resume_exact_trajectory(mini_data, tmp_path):
    max_steps = 14  # 24 samples / batch 2 = 12 steps/epoch -> mid epoch 1

    # A: uninterrupted reference trajectory
    run_a = tmp_path / "run_a"
    _run_trainer(run_a, mini_data, max_steps)
    ref = _final_params(run_a)
    assert int(np.asarray(ref["step"])) == max_steps

    # B: SIGTERM after a few steps -> GracefulShutdown "preempted" ckpt
    run_b = tmp_path / "run_b"
    proc = _run_trainer(run_b, mini_data, max_steps, wait=False)
    deadline = time.time() + 600
    while _steps_logged(run_b) < 4 and time.time() < deadline:
        assert proc.poll() is None, proc.stdout.read()[-3000:]
        time.sleep(0.2)
    assert _steps_logged(run_b) >= 4, "trainer never reached step 4"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-3000:]
    pre = glob.glob(str(run_b / "*" / "checkpoints" / "preempted"))
    assert len(pre) == 1, out[-3000:]
    import orbax.checkpoint as ocp
    k = int(np.asarray(
        ocp.StandardCheckpointer().restore(os.path.abspath(pre[0]))["step"]))
    assert 4 <= k < max_steps, k  # genuinely mid-run

    # C: resume from the preempted checkpoint, finish to max_steps
    run_c = tmp_path / "run_c"
    out_c = _run_trainer(run_c, mini_data, max_steps, resume=pre[0])
    assert f"batch {k % 12}" in out_c or k % 12 == 0, out_c[-2000:]
    res = _final_params(run_c)
    assert int(np.asarray(res["step"])) == max_steps

    # exact trajectory: every parameter leaf bit-equal to the
    # uninterrupted run (CPU f32 is deterministic)
    import jax
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref["params"])
    res_params = res["params"]
    flat_res = dict(jax.tree_util.tree_leaves_with_path(res_params))
    assert len(ref_leaves) == len(flat_res)
    for path, leaf in ref_leaves:
        other = flat_res[path]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(other),
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")
