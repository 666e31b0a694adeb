#!/usr/bin/env python
"""Generate a geometrically consistent mini-EC in the reference layout
(reference datasets/EC.py:25-122): per sequence a directory with
events_corrected.npy (N,4 [t x y p]), images_corrected/*.png + images.txt,
calib.txt (fx fy cx cy + 5 zero distortion coeffs), groundtruth.npy
(N,8 [t x y z qx qy qz qw], camera->world), plus the val-pair protocol
files new_<seq>_val.txt (2-int rows indexing the [100:-100]-cropped frame
list, reference datasets/EC.py:396-398).

Reuses the mini-MVSEC scene machinery (textured plane + smooth 6-DoF
trajectory + DVS contrast events) at EC scale: 240x180, 25 fps, 0.04 s
event windows. All 11 reference sequences are generated (6 train + 5 val,
datasets/EC.py:135-141) so the stock TRAIN/VAL sequence lists work.

Usage: python tools/make_mini_ec.py [--root data/mini_ec]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.make_mini_mvsec as mm  # noqa: E402

W, H = 240, 180
FX = FY = 150.0
CX, CY = 120.0, 90.0
FPS = 25.0
SUBSTEPS = 4
C_THRESH = 0.22


def _configure_renderer():
    mm.W, mm.H = W, H
    mm.FX, mm.FY, mm.CX, mm.CY = FX, FY, CX, CY
    mm.FPS = FPS
    mm.SUBSTEPS = SUBSTEPS
    mm.C_THRESH = C_THRESH
    mm._K_INV_RAYS = None  # drop the cached MVSEC-sized ray grid


def gen_sequence(root: str, seq: str, n_frames: int, phase: float,
                 seed: int) -> int:
    import cv2
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    tex = mm.make_texture(rng)
    d = os.path.join(root, seq)
    os.makedirs(os.path.join(d, "images_corrected"), exist_ok=True)

    t0 = 10.0
    frame_ts = t0 + np.arange(n_frames) / FPS
    sub_dt = 1.0 / (FPS * SUBSTEPS)

    ev_x, ev_y, ev_t, ev_p = [], [], [], []
    log_ref = None
    lines = []
    for i in range(n_frames):
        T = mm.pose_at(frame_ts[i] - t0, phase)
        img, _ = mm.render(tex, T)
        name = f"frame_{i:08d}.png"
        cv2.imwrite(os.path.join(d, "images_corrected", name),
                    np.clip(img, 0, 255).astype(np.uint8))
        lines.append(f"{frame_ts[i]:.9f} images_corrected/{name}")
        if i == 0:
            log_ref = np.log(img + 1.0)
            continue
        for k in range(1, SUBSTEPS + 1):
            ts = frame_ts[i - 1] + k * sub_dt
            Ts = mm.pose_at(ts - t0, phase)
            sub_img, _ = mm.render(tex, Ts)
            log_now = np.log(sub_img + 1.0)
            diff = log_now - log_ref
            n_ev = np.minimum(
                np.floor(np.abs(diff) / C_THRESH).astype(np.int32), 2)
            ys, xs = np.nonzero(n_ev)
            if len(ys):
                counts = n_ev[ys, xs]
                pol = diff[ys, xs] > 0
                xs_r = np.repeat(xs, counts)
                ys_r = np.repeat(ys, counts)
                pol_r = np.repeat(pol, counts)
                ts_r = ts - sub_dt * rng.random(len(xs_r))
                ev_x.append(xs_r)
                ev_y.append(ys_r)
                ev_t.append(ts_r)
                ev_p.append(pol_r)
                log_ref[ys, xs] += np.sign(diff[ys, xs]) * counts * C_THRESH

    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    x = np.concatenate(ev_x).astype(np.float32)
    y = np.concatenate(ev_y).astype(np.float32)
    tt = np.concatenate(ev_t)
    p = np.concatenate(ev_p).astype(np.float32)
    order = np.argsort(tt, kind="stable")
    events = np.stack([tt[order].astype(np.float64), x[order], y[order],
                       p[order]], 1).astype(np.float32)
    np.save(os.path.join(d, "events_corrected.npy"), events)

    # cam->world samples beyond the frame range (interpolator clamp);
    # the loader's PoseInterpolator re-inverts to world->cam
    pose_ts = t0 - 0.5 + np.arange(int((n_frames / FPS + 1.0) * 50)) / 50.0
    rows = []
    for ts in pose_ts:
        T_c2w = np.linalg.inv(mm.pose_at(ts - t0, phase))
        q = Rotation.from_matrix(T_c2w[:3, :3]).as_quat()  # xyzw
        rows.append([ts, *T_c2w[:3, 3], *q])
    np.save(os.path.join(d, "groundtruth.npy"),
            np.asarray(rows, np.float64))

    with open(os.path.join(d, "calib.txt"), "w") as f:
        f.write(f"{FX} {FY} {CX} {CY} 0 0 0 0 0\n")
    return len(events)


def main():
    from ei_nexus_tpu.data.ec import TRAIN_SEQUENCES, VAL_SEQUENCES

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/mini_ec")
    ap.add_argument("--frames", type=int, default=230,
                    help="per sequence; [100:-100] crop leaves frames-200")
    ap.add_argument("--pair-gap", type=int, default=6)
    args = ap.parse_args()

    _configure_renderer()
    for si, seq in enumerate(TRAIN_SEQUENCES + VAL_SEQUENCES):
        n_ev = gen_sequence(args.root, seq, args.frames,
                            phase=0.7 * si, seed=100 + si)
        print(f"{seq}: {args.frames} frames, {n_ev} events")

    # pair indices address the loader's [100:-100]-cropped VALID frame list
    # (frames inside the events/frames/poses timestamp overlap) — measure
    # the actual post-crop length through the loader itself
    from ei_nexus_tpu.data.ec import ECArchive, ECSequence
    archive = ECArchive(args.root)
    for seq in VAL_SEQUENCES:
        n_cropped = len(ECSequence(archive, seq))
        idx = np.arange(0, max(n_cropped - args.pair_gap, 1))
        pairs = np.stack(
            [idx, np.minimum(idx + args.pair_gap, n_cropped - 1)], 1)
        np.savetxt(os.path.join(args.root, f"new_{seq}_val.txt"), pairs,
                   fmt="%d")
        print(f"{seq}: {len(pairs)} val pairs over {n_cropped} frames")


if __name__ == "__main__":
    main()
