#!/usr/bin/env python
"""Run a trainer in leak-capped chunks of steps, resuming exactly.

The axon tunnel's PJRT client retains a host-side copy of every
`device_put` buffer (measured: 60 puts of an 8 MB array leak ~646 MB RSS;
in training ~28 MB/step for a B=8 compact stage-2 batch), so any
multi-thousand-step run OOMs the 125 GB host — the round-4 stage-2 run
died at 130 GB RSS after 4580 steps. The leak is inside libaxon_pjrt.so
(closed C++), so the workaround is process recycling: each chunk is a
fresh trainer process capped at `--chunk-steps` more global steps, and
the next chunk resumes from its `checkpoints/final` (bit-exact resume,
tests/test_preemption.py).

usage:
  python tools/train_chunked.py --trainer train_matcher.py \
      --chunk-steps 1500 --out runs/stage2_chunks -- [trainer args ...]

`--out` must be PER-EXPERIMENT: both the resume checkpoint (newest
*/checkpoints/final) and the step-budget priming (the "stopped at step"
lines in */log.txt) trust every run directory under it. Reusing an
--out across configs/stages resumes the wrong weights and mis-primes
the budget.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_final(out_root: str) -> str | None:
    finals = glob.glob(os.path.join(out_root, "*", "checkpoints", "final"))
    return max(finals, key=os.path.getmtime) if finals else None


_STOP_RE = re.compile(r"stopped at step (\d+), epoch (\d+)/(\d+)")


def reached_step(out_root: str) -> int:
    """Highest global step any prior chunk under `out_root` reached.

    A fresh supervisor process must prime its step budget from this, not
    from 0 — otherwise the first chunk after an external resume gets
    max_steps <= the already-reached step and burns a whole process
    start/compile/restore cycle advancing a single step."""
    hi = 0
    for log in glob.glob(os.path.join(out_root, "*", "log.txt")):
        try:
            with open(log) as f:
                for line in f:
                    m = _STOP_RE.search(line)
                    if m:
                        hi = max(hi, int(m.group(1)))
        except OSError:
            pass
    return hi


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trainer", required=True,
                   help="train_extractor.py or train_matcher.py")
    p.add_argument("--chunk-steps", type=int, required=True,
                   help="max global steps added per process "
                        "(~28 MB leaked per step; keep chunks <= ~2000)")
    p.add_argument("--out", required=True,
                   help="logger.output_dir for every chunk; chunk i resumes "
                        "from the newest */checkpoints/final under it")
    p.add_argument("--max-chunks", type=int, default=32)
    p.add_argument("trainer_args", nargs=argparse.REMAINDER,
                   help="args after -- go to the trainer verbatim")
    args = p.parse_args(argv)
    targs = [a for a in args.trainer_args if a != "--"]

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "chunked.log")
    done_re = _STOP_RE
    # Prime the budget from prior chunks ONLY when there is a checkpoint
    # to resume from — logs without checkpoints (moved/deleted finals)
    # would otherwise hand the first chunk a budget thousands of steps
    # above its actual restored step, defeating the per-process leak cap.
    step_hi = reached_step(args.out) if newest_final(args.out) else 0
    for chunk in range(args.max_chunks):
        step_hi += args.chunk_steps
        cmd = [sys.executable, os.path.join(REPO, args.trainer),
               "--max-steps", str(step_hi), *targs,
               f"logger.output_dir={args.out}"]
        resume = newest_final(args.out)
        if resume:
            cmd += ["--resume", resume]
        print(f"[chunk {chunk}] max_steps={step_hi} resume={resume}",
              flush=True)
        with open(log_path, "a") as lf:
            lf.write(f"==== chunk {chunk}: {' '.join(cmd)}\n")
            lf.flush()
            r = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                               cwd=REPO)
        if r.returncode != 0:
            print(f"[chunk {chunk}] trainer failed rc={r.returncode}; "
                  f"see {log_path}", flush=True)
            return r.returncode
        with open(log_path, "rb") as lf:
            lf.seek(0, os.SEEK_END)
            lf.seek(max(0, lf.tell() - 4000))
            tail = lf.read().decode("utf-8", errors="replace")
        m = None
        for m in done_re.finditer(tail):
            pass
        if m and int(m.group(2)) >= int(m.group(3)):
            print(f"[chunk {chunk}] training complete at step {m.group(1)}"
                  f" ({m.group(2)}/{m.group(3)} epochs)", flush=True)
            return 0
        if m:  # keep the budget anchored to the step actually reached
            step_hi = max(step_hi, int(m.group(1)))
    print("max chunks exhausted before epochs completed", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
