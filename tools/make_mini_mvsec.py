#!/usr/bin/env python
"""Generate a geometrically consistent mini-MVSEC in the reference HDF5
layout (reference datasets/MVSEC.py:53-132, 224-260): a camera flying over a
textured plane, rendered images + exact depth + world->cam poses + DVS-model
events, so the full train->val->RPE pipeline produces meaningful accuracy
numbers without the real (absent) dataset.

Scene model: world plane z = Z0 carrying a multi-octave random texture; the
camera follows a smooth sinusoidal trajectory with small rotations. For pose
T_w2c = (R, t) and pixel ray d = K^-1 (u, v, 1), the plane intersection
depth is s = (Z0 + (R^T t)_z) / (R^T d)_z (camera-frame z since d_z = 1);
texture is sampled at the world hit point. Events follow the standard DVS
contrast model: per-pixel log-intensity reference, an event per threshold
crossing C, timestamps interpolated inside each substep.

Writes per sequence: <scene>/<seq>_data.hdf5 (image_raw[_ts]),
<seq>_gt.hdf5 (depth_image_rect[_ts], pose[_ts]), <seq>_rectified.h5
(events_rect (N,4) [x y t p], image_rect), plus <scene>_calib yaml and
RPE index files <seq>_final_indices.txt (pairs i, i+gap).

Usage: python tools/make_mini_mvsec.py [--root data/mini_mvsec]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 346, 260
FX = FY = 199.0
CX, CY = 173.0, 130.0
Z0 = 3.0           # plane depth (m)
TEX = 1600         # texture side (px)
TEX_SCALE = 220.0  # texture px per world meter
FPS = 10.0
SUBSTEPS = 5       # event-render substeps per frame interval
C_THRESH = 0.18    # DVS contrast threshold (log units)


def make_texture(rng: np.random.Generator) -> np.ndarray:
    """Multi-octave value noise with sharp blobs: corners at many scales."""
    import cv2
    tex = np.zeros((TEX, TEX), np.float32)
    for cells, amp in ((10, 0.9), (40, 0.65), (120, 0.45), (400, 0.25)):
        g = rng.random((cells, cells)).astype(np.float32)
        tex += amp * cv2.resize(g, (TEX, TEX),
                                interpolation=cv2.INTER_CUBIC)
    # sharp high-contrast squares -> strong corners for keypoints
    for _ in range(500):
        y, x = rng.integers(0, TEX - 24, 2)
        s = int(rng.integers(6, 22))
        tex[y:y + s, x:x + s] += rng.uniform(-1.0, 1.0)
    tex -= tex.min()
    tex /= tex.max()
    return (20.0 + 225.0 * tex).astype(np.float32)  # intensity in [20, 245]


def so3(aa: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(aa)
    if th < 1e-12:
        return np.eye(3)
    k = aa / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def pose_at(t: float, phase: float) -> np.ndarray:
    """World->cam 4x4 at time t: smooth loops over the plane."""
    x = 0.55 * np.sin(0.55 * t + phase)
    y = 0.40 * np.cos(0.40 * t + 1.3 * phase)
    z = 0.12 * np.sin(0.23 * t + 0.4)
    rx = 0.050 * np.sin(0.33 * t + phase)
    ry = 0.050 * np.cos(0.27 * t)
    rz = 0.060 * np.sin(0.19 * t + 2 * phase)
    R = so3(np.array([rx, ry, rz]))
    cam_center = np.array([x, y, z])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -R @ cam_center  # t = -R c  (world->cam)
    return T


_K_INV_RAYS = None


def _rays() -> np.ndarray:
    global _K_INV_RAYS
    if _K_INV_RAYS is None:
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        _K_INV_RAYS = np.stack(
            [(u + 0.5 - CX) / FX, (v + 0.5 - CY) / FY,
             np.ones_like(u, np.float32)], -1).astype(np.float32)
    return _K_INV_RAYS


def render(tex: np.ndarray, T_w2c: np.ndarray):
    """Render (image (H,W) f32, depth (H,W) f32) for one pose."""
    import cv2
    R, t = T_w2c[:3, :3], T_w2c[:3, 3]
    d_w = _rays() @ R  # R^T d per pixel
    tz = float(R.T[2] @ t)
    s = (Z0 + tz) / d_w[..., 2]          # camera-frame depth (d_z = 1)
    p_w = d_w * s[..., None] - (R.T @ t)  # world hit points
    mx = (p_w[..., 0] * TEX_SCALE + TEX / 2).astype(np.float32)
    my = (p_w[..., 1] * TEX_SCALE + TEX / 2).astype(np.float32)
    img = cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_WRAP)
    return img, s.astype(np.float32)


def gen_sequence(root: str, scene: str, seq: str, n_frames: int,
                 phase: float, seed: int, pair_gap: int = 8):
    import h5py
    rng = np.random.default_rng(seed)
    tex = make_texture(rng)
    os.makedirs(os.path.join(root, scene), exist_ok=True)

    t0 = 100.0
    frame_ts = t0 + np.arange(n_frames) / FPS
    images = np.empty((n_frames, H, W), np.uint8)
    depths = np.empty((n_frames, H, W), np.float32)
    poses = np.empty((n_frames, 4, 4), np.float64)

    ev_x, ev_y, ev_t, ev_p = [], [], [], []
    log_ref = None
    sub_dt = 1.0 / (FPS * SUBSTEPS)
    for i in range(n_frames):
        T = pose_at(frame_ts[i] - t0, phase)
        img, dep = render(tex, T)
        images[i] = np.clip(img, 0, 255).astype(np.uint8)
        depths[i] = dep
        poses[i] = T
        # events across SUBSTEPS between frame i-1 and i
        if i == 0:
            log_ref = np.log(img + 1.0)
            continue
        for k in range(1, SUBSTEPS + 1):
            ts = frame_ts[i - 1] + k * sub_dt
            Ts = pose_at(ts - t0, phase)
            sub_img, _ = render(tex, Ts)
            log_now = np.log(sub_img + 1.0)
            diff = log_now - log_ref
            n_ev = np.floor(np.abs(diff) / C_THRESH).astype(np.int32)
            n_ev = np.minimum(n_ev, 3)
            ys, xs = np.nonzero(n_ev)
            if len(ys):
                counts = n_ev[ys, xs]
                pol = (diff[ys, xs] > 0)
                xs_r = np.repeat(xs, counts)
                ys_r = np.repeat(ys, counts)
                pol_r = np.repeat(pol, counts)
                ts_r = ts - sub_dt * rng.random(len(xs_r))
                ev_x.append(xs_r.astype(np.float64))
                ev_y.append(ys_r.astype(np.float64))
                ev_t.append(ts_r)
                ev_p.append(pol_r.astype(np.float64))
                log_ref[ys, xs] += np.sign(diff[ys, xs]) * \
                    counts * C_THRESH

    x = np.concatenate(ev_x)
    y = np.concatenate(ev_y)
    tt = np.concatenate(ev_t)
    p = np.concatenate(ev_p)
    order = np.argsort(tt, kind="stable")
    events = np.stack([x[order], y[order], tt[order], p[order]], 1)

    # pose samples slightly beyond the frame range (interpolator clamp).
    # MVSEC stores cam->world odometry; the loaders' PoseInterpolator
    # inverts it back to world->cam (reference Interpolator.py:69), so
    # write T_c2w = inv(T_w2c) here.
    pose_ts = t0 - 0.5 + np.arange(int((n_frames / FPS + 1.0) * 25)) / 25.0
    pose_mats = np.stack([np.linalg.inv(pose_at(ts - t0, phase))
                          for ts in pose_ts])

    d = os.path.join(root, scene)
    with h5py.File(os.path.join(d, f"{seq}_data.hdf5"), "w") as f:
        f.create_dataset("davis/left/image_raw_ts", data=frame_ts)
        f.create_dataset("davis/left/image_raw", data=images,
                         compression="gzip", compression_opts=1)
    with h5py.File(os.path.join(d, f"{seq}_gt.hdf5"), "w") as f:
        dd = depths.copy()
        dd[:, :6, :] = np.nan  # invalid band like real GT depth
        f.create_dataset("davis/left/depth_image_rect", data=dd,
                         compression="gzip", compression_opts=1)
        f.create_dataset("davis/left/depth_image_rect_ts",
                         data=frame_ts + 1e-4)
        f.create_dataset("davis/left/pose", data=pose_mats)
        f.create_dataset("davis/left/pose_ts", data=pose_ts)
    with h5py.File(os.path.join(d, f"{seq}_rectified.h5"), "w") as f:
        f.create_dataset("davis/left/events_rect", data=events,
                         compression="gzip", compression_opts=1)
        f.create_dataset("davis/left/image_rect", data=images,
                         compression="gzip", compression_opts=1)

    # RPE index pairs (i, i+gap) over the post-crop range are computed by
    # the caller (crops are per-sequence); emit raw-range pairs here
    return len(events), frame_ts


def write_calib(root: str, scene: str):
    os.makedirs(os.path.join(root, f"{scene}_calib"), exist_ok=True)
    with open(os.path.join(root, f"{scene}_calib",
                           f"camchain-imucam-{scene}.yaml"), "w") as f:
        f.write(f"cam0:\n  intrinsics: [{FX}, {FY}, {CX}, {CY}]\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/mini_mvsec")
    ap.add_argument("--train-frames", type=int, default=220)
    ap.add_argument("--val-frames", type=int, default=120)
    ap.add_argument("--pair-gap", type=int, default=8)
    ap.add_argument("--sequences", default=None,
                    help="comma-separated subset (e.g. indoor_flying1) — "
                         "used by tests to generate a minimal fixture")
    args = ap.parse_args()

    from ei_nexus_tpu.data.mvsec import SEQUENCE_CROPS

    # indoor_flying4 + outdoor_day1 are the STOCK two-sequence RPE protocol
    # (data/mvsec.py VAL_SEQUENCES; reference datasets/MVSEC.py:1016) — both
    # must exist for test_events_image_different_time.py to run verbatim
    # indoor_flying2/3 are the reference's remaining TRAIN sequences
    # (datasets/MVSEC.py:1016 trains on indoor_flying1/2/3); their crops
    # ((200,-100)/(120,-40), data/mvsec.py SEQUENCE_CROPS) eat more frames,
    # so they get proportionally longer renders. Distinct texture seeds per
    # sequence so multi-sequence training actually sees different scenes.
    specs = [("indoor_flying", "indoor_flying1", args.train_frames, 0.0, 10),
             ("indoor_flying", "indoor_flying2", args.train_frames + 200,
              1.3, 20),
             ("indoor_flying", "indoor_flying3", args.train_frames + 60,
              3.1, 30),
             ("indoor_flying", "indoor_flying4", args.val_frames, 2.1, 40),
             ("outdoor_day", "outdoor_day1", args.val_frames, 4.2, 70),
             # the reference's 4th TRAIN sequence (datasets/MVSEC.py:1016);
             # its (20,-40) crop eats only 60 frames, so train_frames keeps
             # it the longest split member — a 4th unseen-texture domain
             ("outdoor_day", "outdoor_day2", args.train_frames, 5.3, 80)]
    if args.sequences:
        keep = set(args.sequences.split(","))
        specs = [sp for sp in specs if sp[1] in keep]
    for scene, seq, n_frames, phase, seed in specs:
        n_ev, frame_ts = gen_sequence(args.root, scene, seq, n_frames,
                                      phase, seed)
        print(f"{seq}: {n_frames} frames, {n_ev} events")
        c0, c1 = SEQUENCE_CROPS[seq]
        n_cropped = len(frame_ts[slice(c0, c1)])
        idx = np.arange(0, max(n_cropped - args.pair_gap, 1))
        pairs = np.stack([idx, np.minimum(idx + args.pair_gap,
                                          n_cropped - 1)], 1)
        np.savetxt(os.path.join(args.root, f"{seq}_final_indices.txt"),
                   pairs, fmt="%d")
        print(f"{seq}: {len(pairs)} RPE pairs over {n_cropped} cropped"
              " frames")
    for scene in sorted({sp[0] for sp in specs}):
        write_calib(args.root, scene)


if __name__ == "__main__":
    main()
