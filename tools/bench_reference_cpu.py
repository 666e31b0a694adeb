#!/usr/bin/env python
"""Measure the reference pipeline's CPU-bound stages with the ACTUAL
reference code (/root/reference, read-only import), to replace the
estimated A800-baseline denominator in bench.py with a measured/derived
number (VERDICT r1 item 6).

Stages measured per evaluation pair (reference
test_events-image_different_time.py):
 1. draw_events_accumulation_image — per-event python loop
    (datasets/visualize.py:23-43), runs in the Dataset __getitem__.
 2. events_to_voxel_grid — torch-CPU trilinear splat
    (datasets/representations.py:67).
 3. cv2.findEssentialMat + recoverPose — RANSAC in the main eval loop
    (core/metrics/matching_metrics.py:427-443), strictly serial.

GPU stages (SuperPoint + eventVGG + LightGlue forward at batch 1) are NOT
measurable here; a speed-of-light A800 estimate is derived in BASELINE.md.
Prints one JSON line with the per-stage times and the resulting
reference-pipeline pairs/s bound under generous overlap assumptions.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference/datasets")

N_EVENTS = 150_000   # typical 0.4 s MVSEC eval window (max is 262k)
H, W = 260, 346
N_MATCHES = 500


def timeit(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, W - 1, N_EVENTS)
    y = rng.uniform(0, H - 1, N_EVENTS)
    t = np.sort(rng.uniform(0, 0.4, N_EVENTS))
    p = rng.integers(0, 2, N_EVENTS).astype(np.float64)
    events_arr = np.stack([x, y, t, p], 1)

    from visualize import draw_events_accumulation_image
    t_acc = timeit(lambda: draw_events_accumulation_image(
        events_arr, (W, H)), reps=3)

    from representations import events_to_voxel_grid
    ev_dict = {"x": x, "y": y, "t": t, "p": p}
    t_vox = timeit(lambda: events_to_voxel_grid(
        dict(ev_dict), (16, H, W)), reps=3)

    import cv2
    p0 = rng.normal(0, 0.3, (N_MATCHES, 2))
    depth = rng.uniform(2, 6, N_MATCHES)
    R, _ = cv2.Rodrigues(np.array([0.02, -0.03, 0.01]))
    tt = np.array([0.2, -0.05, 0.1])
    P0 = np.concatenate([p0, np.ones((N_MATCHES, 1))], 1) * depth[:, None]
    P1 = P0 @ R.T + tt
    p1 = P1[:, :2] / P1[:, 2:]
    p1 += rng.normal(0, 1e-3, p1.shape)

    def ransac():
        E, mask = cv2.findEssentialMat(p0, p1, np.eye(3), threshold=1e-3,
                                       prob=0.999, method=cv2.RANSAC)
        cv2.recoverPose(E[:3], p0, p1, np.eye(3), 1e9, mask=mask)
    t_ransac = timeit(ransac, reps=5)

    # Reference eval loop structure (batch 1): DataLoader workers can
    # overlap stage 1+2 with the GPU forward, but RANSAC runs inline in
    # the main loop after each forward. Generous-to-reference bound:
    #   pairs/s <= 1 / max(prep / n_workers, gpu_fwd + t_ransac)
    # with prep = t_acc + t_vox, n_workers = 4 (configs), and an A800
    # speed-of-light gpu_fwd derived in BASELINE.md (~6 ms).
    gpu_fwd_sol = 0.006
    n_workers = 4
    prep = t_acc + t_vox
    bound = 1.0 / max(prep / n_workers, gpu_fwd_sol + t_ransac)
    print(json.dumps({
        "host": "4-core CPU (this machine)",
        "accumulation_image_ms": round(t_acc * 1e3, 1),
        "voxel_grid_ms": round(t_vox * 1e3, 1),
        "essential_ransac_ms": round(t_ransac * 1e3, 1),
        "gpu_fwd_sol_ms": gpu_fwd_sol * 1e3,
        "n_workers": n_workers,
        "reference_pairs_per_s_bound": round(bound, 1),
    }))


if __name__ == "__main__":
    main()
