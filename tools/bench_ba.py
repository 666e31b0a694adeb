#!/usr/bin/env python
"""Bundle-adjustment benchmark at realistic SLAM scale on the current
backend (BASELINE.json north-star capability; the reference has no BA at
all — its only pose machinery is per-pair OpenCV RANSAC,
core/metrics/matching_metrics.py:362-450).

Problem: M keyframes on a smooth trajectory, L landmarks, O = L*obs_per
observations (each landmark seen from `obs_per` random keyframes), noisy
initialization. Defaults M=512, L=65536, O=655k — above the VERDICT r2
"realistic size" bar (>=500 kf, >=50k lm, >=500k obs).

Timing: `ba_solve` runs its LM iterations inside one lax.scan (data
dependency through the carry), so a single scalar fetch of the final error
bounds completion — the chained-dispatch methodology of bench.py. The
per-iteration cost is the slope between two iteration counts, which
subtracts compile/dispatch/fetch overhead.

Prints one JSON line per run. Usage:
  python tools/bench_ba.py [--kf 512] [--lm 65536] [--obs-per 10]
                           [--cg 20] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_problem(rng, M, L, obs_per, noise_pose=0.01, noise_point=0.05,
                  noise_px=0.3):
    """Vectorized at-scale synthetic BA problem (no python loops over O)."""
    import jax.numpy as jnp
    from ei_nexus_tpu.parallel.ba import BAProblem

    intr = np.tile(np.array([300.0, 300.0, 160.0, 120.0], np.float32),
                   (M, 1))
    # smooth forward trajectory with gentle yaw; points ahead of cameras
    s = np.arange(M, dtype=np.float32)
    w = np.stack([0.02 * np.sin(s * 0.05), 0.05 * np.sin(s * 0.03),
                  np.zeros(M, np.float32)], -1)
    cam_centers = np.stack([0.5 * s, 0.2 * np.sin(s * 0.1),
                            np.zeros(M, np.float32)], -1)
    points = np.stack([
        rng.uniform(-5, 0.5 * M + 5, L), rng.uniform(-6, 6, L),
        rng.uniform(4, 12, L)], -1).astype(np.float32)

    # R via Rodrigues (vectorized, small angles)
    def rotmats(w):
        th = np.linalg.norm(w, axis=-1, keepdims=True) + 1e-12
        k = w / th
        K = np.zeros((len(w), 3, 3), np.float32)
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        th = th[..., None]
        return (np.eye(3, dtype=np.float32)[None] + np.sin(th) * K
                + (1 - np.cos(th)) * (K @ K))

    R = rotmats(w)                                     # (M, 3, 3)
    t = -np.einsum("mij,mj->mi", R, cam_centers)       # x_cam = R x + t
    poses = np.concatenate([w, t], -1).astype(np.float32)

    O = L * obs_per
    # each landmark observed from obs_per keyframes near its x position
    # (locality keeps depths positive and Jacobians realistic)
    base = np.clip((points[:, 0] / 0.5).astype(np.int64), 0, M - 1)
    off = rng.integers(-8, 9, (L, obs_per))
    obs_pose = np.clip(base[:, None] + off, 0, M - 1).reshape(-1)
    obs_point = np.repeat(np.arange(L, dtype=np.int64), obs_per)

    Xc = (np.einsum("oij,oj->oi", R[obs_pose], points[obs_point])
          + t[obs_pose])
    z = np.maximum(Xc[:, 2], 1e-3)
    uv = np.stack([intr[0, 0] * Xc[:, 0] / z + intr[0, 2],
                   intr[0, 1] * Xc[:, 1] / z + intr[0, 3]], -1)
    valid = Xc[:, 2] > 0.5
    uv = uv + rng.normal(0, noise_px, uv.shape)

    # Perturb rotation and camera CENTER, then recompose t = -R'c'.
    # Perturbing (w, t) directly is wrong at this trajectory scale: t=-Rc
    # has ||c|| ~ 0.5*M, so 0.01 rad of rotation noise without the matching
    # t compensation moves nearby landmarks by ~0.01*||c|| ≈ 2.4 units in
    # the camera frame — pushing them behind z=0 and onto the projection
    # clamp pole (measured: initial MSE 5.8e15 px^2 at M=512).
    w_n = w.copy()
    c_n = cam_centers.copy()
    w_n[1:] += rng.normal(0, noise_pose, (M - 1, 3)).astype(np.float32)
    c_n[1:] += rng.normal(0, noise_pose, (M - 1, 3)).astype(np.float32)
    R_n = rotmats(w_n.astype(np.float32))
    t_n = -np.einsum("mij,mj->mi", R_n, c_n)
    init_poses = np.concatenate([w_n, t_n], -1).astype(np.float32)
    init_points = points + rng.normal(0, noise_point, points.shape).astype(
        np.float32)
    fixed = np.zeros(M, bool)
    fixed[0] = True
    return BAProblem(
        poses=jnp.asarray(init_poses, jnp.float32),
        intrinsics=jnp.asarray(intr, jnp.float32),
        points=jnp.asarray(init_points, jnp.float32),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_valid=jnp.asarray(valid),
        fixed_poses=jnp.asarray(fixed),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--kf", type=int, default=512)
    p.add_argument("--lm", type=int, default=65536)
    p.add_argument("--obs-per", type=int, default=10)
    p.add_argument("--cg", type=int, default=20)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--huber", type=float, default=4.0,
                   help="Huber delta in px (0 disables robust loss)")
    p.add_argument("--z-min", type=float, default=0.01,
                   help="cheirality gate depth (0 disables)")
    p.add_argument("--device", default=None, choices=[None, "tpu", "cpu"])
    args = p.parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ei_nexus_tpu.parallel.ba import ba_solve

    rng = np.random.default_rng(0)
    prob = synth_problem(rng, args.kf, args.lm, args.obs_per)
    O = int(prob.obs_uv.shape[0])

    solve = jax.jit(ba_solve,
                    static_argnames=("iters", "cg_iters", "huber_delta",
                                     "z_min"))
    huber = args.huber if args.huber > 0 else None
    z_min = args.z_min if args.z_min > 0 else None

    def run(iters):
        t0 = time.perf_counter()
        refined, errs = solve(prob, iters=iters, cg_iters=args.cg,
                              huber_delta=huber, z_min=z_min)
        errs = np.asarray(errs)            # fetch = completion bound
        return time.perf_counter() - t0, errs

    base_iters = max(2, args.iters // 4)
    run(base_iters)                        # compile short variant
    run(args.iters)                        # compile long variant
    t_short = min(run(base_iters)[0] for _ in range(2))
    best = (float("inf"), None)
    for _ in range(2):
        dt, errs = run(args.iters)
        if dt < best[0]:
            best = (dt, errs)
    t_long, errs = best
    per_iter_ms = (t_long - t_short) / (args.iters - base_iters) * 1e3

    print(json.dumps({
        "metric": "ba_ms_per_lm_iteration",
        "value": round(per_iter_ms, 2),
        "unit": "ms",
        "keyframes": args.kf, "landmarks": args.lm, "observations": O,
        "cg_iters": args.cg, "huber_px": args.huber,
        "cost_start": round(float(errs[0]), 4),
        "cost_end": round(float(errs[-1]), 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
