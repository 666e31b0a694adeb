"""Keyframe-based SLAM back-end assembly: matches -> tracks -> landmarks ->
bundle-adjusted trajectory.

Ties the framework end to end (BASELINE.json configs[4]): keypoints and
pairwise matches from the extract+match front-end feed a keyframe store;
consecutive-pair matches are chained into multi-view tracks; landmarks are
initialized by linear triangulation (geometry/triangulation.py) and refined
jointly with poses by the distributed Schur-complement BA (parallel/ba.py);
an optional pose-graph pass (loop closures) runs on the keyframe graph.

Host-side graph bookkeeping is numpy (tiny); all heavy refinement is the
jitted BA. The reference has no such back-end (pose is only estimated
per-pair; SURVEY.md §2.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry import Pose, Camera
from ..geometry.triangulation import triangulate_tracks
from .ba import BAProblem, ba_solve


@dataclass
class Keyframe:
    """One keyframe: fixed-K keypoints (yx+prob) with validity, an initial
    world->camera pose (4x4) and intrinsics K (3x3)."""

    keypoints: np.ndarray        # (K, 3) (y, x, prob)
    valid: np.ndarray            # (K,)
    pose: np.ndarray             # (4, 4) world->camera
    K: np.ndarray                # (3, 3)


def chain_tracks(matches01: Sequence[np.ndarray],
                 n_keypoints: int) -> List[List[Tuple[int, int]]]:
    """Chain per-pair matches (frame i -> i+1, arrays of matches0 indices)
    into multi-view tracks: each track is a list of (frame_idx, kp_idx)."""
    n_frames = len(matches01) + 1
    track_of: Dict[Tuple[int, int], int] = {}
    tracks: List[List[Tuple[int, int]]] = []
    for f, m in enumerate(matches01):
        for i, j in enumerate(np.asarray(m)):
            if j < 0:
                continue
            key = (f, i)
            t = track_of.get(key)
            if t is None:
                t = len(tracks)
                tracks.append([(f, int(i))])
            tracks[t].append((f + 1, int(j)))
            track_of[(f + 1, int(j))] = t
    return [t for t in tracks if len(t) >= 2]


def build_ba_problem(keyframes: Sequence[Keyframe],
                     tracks: Sequence[Sequence[Tuple[int, int]]],
                     min_track_len: int = 2,
                     fix_first: bool = True) -> Optional[BAProblem]:
    """Triangulate tracks and assemble a fixed-shape BAProblem."""
    M = len(keyframes)
    poses6 = []
    intr = []
    for kf in keyframes:
        R = kf.pose[:3, :3]
        t = kf.pose[:3, 3]
        from .ba import _so3log
        w = np.asarray(_so3log(jnp.asarray(R[None])))[0]
        poses6.append(np.concatenate([w, t]))
        intr.append([kf.K[0, 0], kf.K[1, 1], kf.K[0, 2], kf.K[1, 2]])
    poses6 = np.asarray(poses6, np.float32)
    intr = np.asarray(intr, np.float32)

    kept = [t for t in tracks if len(t) >= min_track_len]
    if not kept:
        return None
    L = len(kept)

    obs_pose, obs_point, obs_uv = [], [], []
    track_obs_xy = []
    for li, tr in enumerate(kept):
        xs = []
        for (f, i) in tr:
            kp = keyframes[f].keypoints[i]
            uv = np.array([kp[1], kp[0]], np.float32)  # yx -> xy
            obs_pose.append(f)
            obs_point.append(li)
            obs_uv.append(uv)
            xs.append((f, uv))
        track_obs_xy.append(xs)

    # landmark init: linear triangulation per track over its views
    V = max(len(t) for t in kept)
    kp_arr = np.zeros((L, M, 2), np.float32)
    msk = np.zeros((L, M), bool)
    for li, xs in enumerate(track_obs_xy):
        for f, uv in xs:
            kp_arr[li, f] = uv
            msk[li, f] = True
    cams = Camera.from_calibration_matrix(
        np.stack([kf.K for kf in keyframes]).astype(np.float32))
    poses = Pose.from_4x4mat(np.stack([kf.pose for kf in keyframes])
                             .astype(np.float32))
    points = np.asarray(triangulate_tracks(
        jnp.asarray(kp_arr), poses, cams, jnp.asarray(msk)))

    fixed = np.zeros(M, bool)
    if fix_first:
        fixed[0] = True
    return BAProblem(
        poses=jnp.asarray(poses6),
        intrinsics=jnp.asarray(intr),
        points=jnp.asarray(points, jnp.float32),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_valid=jnp.ones(len(obs_pose), bool),
        fixed_poses=jnp.asarray(fixed),
    )


def refine_map(keyframes: Sequence[Keyframe],
               matches01: Sequence[np.ndarray],
               iters: int = 10) -> Tuple[Optional[BAProblem], np.ndarray]:
    """Front-to-back refinement: chain tracks, triangulate, bundle-adjust.

    Returns (refined BAProblem or None, per-iteration mse history)."""
    n_kp = keyframes[0].keypoints.shape[0]
    tracks = chain_tracks(matches01, n_kp)
    prob = build_ba_problem(keyframes, tracks)
    if prob is None:
        return None, np.zeros(0)
    refined, errs = ba_solve(prob, iters=iters)
    return refined, np.asarray(errs)
