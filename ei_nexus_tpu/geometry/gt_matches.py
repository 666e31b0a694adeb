"""Ground-truth match generation from pose+depth or homography.

The core stage-2 training supervision. Functional parity with reference
`core/geometry/gt_generation.py:16` (gt_matches_from_pose_depth) and `:173`
(gt_matches_from_homography), with the same {index, -1 unmatched, -2 ignore}
label convention — which is already fixed-shape and thus jit-native.

TPU-first departures from the reference:
 - fully batched, shape-static, jit/vmap-compatible (no data-dependent paths);
 - optional per-keypoint validity masks (for fixed-K padded keypoints): invalid
   slots are forced to the IGNORE label and excluded from the assignment.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .se3 import Pose
from .camera import Camera
from .epipolar import T_to_E, sym_epipolar_distance_all
from .depthproj import sample_depth, project
from .homography import warp_points_homography

IGNORE_FEATURE = -2
UNMATCHED_FEATURE = -1


def _mutual_min_assignment(dist: jax.Array, pos_th: float):
    """Mutual-row/col-argmin positives under a squared-distance threshold."""
    min0 = jnp.argmin(dist, axis=-1)  # (..., N)
    min1 = jnp.argmin(dist, axis=-2)  # (..., M)
    N, M = dist.shape[-2], dist.shape[-1]
    ismin0 = jax.nn.one_hot(min0, M, dtype=bool)
    ismin1 = jnp.swapaxes(jax.nn.one_hot(min1, N, dtype=bool), -1, -2)
    positive = ismin0 & ismin1 & (dist < pos_th**2)
    return positive, min0, min1


def _pack_labels(positive, min0, min1, negative0, negative1):
    m0 = jnp.where(jnp.any(positive, axis=-1), min0, IGNORE_FEATURE)
    m1 = jnp.where(jnp.any(positive, axis=-2), min1, IGNORE_FEATURE)
    m0 = jnp.where(negative0, UNMATCHED_FEATURE, m0)
    m1 = jnp.where(negative1, UNMATCHED_FEATURE, m1)
    return m0, m1


def gt_matches_from_pose_depth(
    kp0: jax.Array,
    kp1: jax.Array,
    camera0: Camera,
    camera1: Camera,
    depth0: jax.Array,
    depth1: jax.Array,
    T_0to1: Pose,
    T_1to0: Pose,
    pos_th: float = 3.0,
    neg_th: float = 5.0,
    ordering: str = "yx",
    epi_th: Optional[float] = None,
    cc_th: Optional[float] = None,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Compute GT matches between two keypoint sets via depth reprojection.

    Args:
      kp0: (B, N, 2) keypoints in view 0 (ordering `yx` or `xy`).
      kp1: (B, M, 2) keypoints in view 1.
      camera0/1: batched Camera (B,).
      depth0/1: (B, H, W) depth maps (<=0 invalid).
      T_0to1/T_1to0: batched Pose (B,).
      pos_th/neg_th: positive/negative pixel thresholds.
      epi_th: optional epipolar augmentation of negatives.
      cc_th: optional circle-consistency threshold (px^2).
      mask0/1: optional (B, N)/(B, M) keypoint validity; invalid -> IGNORE.

    Returns a dict with assignment (B, N, M) bool, matches0 (B, N) int32,
    matches1 (B, M) int32, matching_scores0/1, proj_0to1/proj_1to0,
    visible0/1, depth_keypoints0/1 (same keys as the reference).
    """
    assert ordering in ("yx", "xy")
    if ordering == "yx":
        kp0 = kp0[..., ::-1]
        kp1 = kp1[..., ::-1]
    kp0 = kp0[..., :2]
    kp1 = kp1[..., :2]

    d0, valid0 = sample_depth(kp0, depth0)
    d1, valid1 = sample_depth(kp1, depth1)
    if mask0 is not None:
        valid0 = valid0 & mask0
    if mask1 is not None:
        valid1 = valid1 & mask1

    kp0_1, visible0 = project(
        kp0, d0, depth1, camera0, camera1, T_0to1, valid0, ccth=cc_th)
    kp1_0, visible1 = project(
        kp1, d1, depth0, camera1, camera0, T_1to0, valid1, ccth=cc_th)
    mask_visible = visible0[..., :, None] & visible1[..., None, :]

    # distance matrix (..., N, M): max of forward/backward reprojection errors
    dist0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, -1)
    dist1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, -1)
    dist = jnp.maximum(dist0, dist1)
    inf = jnp.asarray(jnp.inf, dist.dtype)
    dist = jnp.where(mask_visible, dist, inf)

    positive, min0, min1 = _mutual_min_assignment(dist, pos_th)
    negative0 = (jnp.min(dist0, axis=-1) > neg_th**2) & valid0
    negative1 = (jnp.min(dist1, axis=-2) > neg_th**2) & valid1
    m0, m1 = _pack_labels(positive, min0, min1, negative0, negative1)

    K1inv = jnp.linalg.inv(camera1.calibration_matrix())
    K0inv = jnp.linalg.inv(camera0.calibration_matrix())
    F = jnp.swapaxes(K1inv, -1, -2) @ T_to_E(T_0to1) @ K0inv
    epi_dist = sym_epipolar_distance_all(kp0, kp1, F)

    if epi_th is not None:
        mask_ignore = (m0[..., :, None] == IGNORE_FEATURE) & (
            m1[..., None, :] == IGNORE_FEATURE)
        epi_gated = jnp.where(mask_ignore, epi_dist, inf)
        exclude0 = jnp.min(epi_gated, axis=-1) > neg_th
        exclude1 = jnp.min(epi_gated, axis=-2) > neg_th
        m0 = jnp.where((~valid0) & exclude0, UNMATCHED_FEATURE, m0)
        m1 = jnp.where((~valid1) & exclude1, UNMATCHED_FEATURE, m1)

    if mask0 is not None:
        m0 = jnp.where(mask0, m0, IGNORE_FEATURE)
        positive = positive & mask0[..., :, None]
    if mask1 is not None:
        m1 = jnp.where(mask1, m1, IGNORE_FEATURE)
        positive = positive & mask1[..., None, :]

    return {
        "assignment": positive,
        "reward": (dist < pos_th**2).astype(jnp.float32)
        - (epi_dist > neg_th).astype(jnp.float32),
        "matches0": m0.astype(jnp.int32),
        "matches1": m1.astype(jnp.int32),
        "matching_scores0": (m0 > -1).astype(jnp.float32),
        "matching_scores1": (m1 > -1).astype(jnp.float32),
        "depth_keypoints0": d0,
        "depth_keypoints1": d1,
        "proj_0to1": kp0_1,
        "proj_1to0": kp1_0,
        "visible0": visible0,
        "visible1": visible1,
    }


def gt_matches_from_homography(
    kp0: jax.Array,
    kp1: jax.Array,
    H: jax.Array,
    pos_th: float = 3.0,
    neg_th: float = 6.0,
    mask0: Optional[jax.Array] = None,
    mask1: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """GT matches from a known homography (kp in xy ordering, like reference)."""
    kp0 = kp0[..., :2]
    kp1 = kp1[..., :2]
    kp0_1 = warp_points_homography(kp0, H, inverse=False)
    kp1_0 = warp_points_homography(kp1, H, inverse=True)

    dist0 = jnp.sum((kp0_1[..., :, None, :] - kp1[..., None, :, :]) ** 2, -1)
    dist1 = jnp.sum((kp0[..., :, None, :] - kp1_0[..., None, :, :]) ** 2, -1)
    dist = jnp.maximum(dist0, dist1)
    if mask0 is not None:
        dist = jnp.where(mask0[..., :, None], dist, jnp.inf)
    if mask1 is not None:
        dist = jnp.where(mask1[..., None, :], dist, jnp.inf)

    reward = (dist < pos_th**2).astype(jnp.float32) - (
        dist > neg_th**2).astype(jnp.float32)

    positive, min0, min1 = _mutual_min_assignment(dist, pos_th)
    negative0 = jnp.min(dist0, axis=-1) > neg_th**2
    negative1 = jnp.min(dist1, axis=-2) > neg_th**2
    m0, m1 = _pack_labels(positive, min0, min1, negative0, negative1)

    if mask0 is not None:
        m0 = jnp.where(mask0, m0, IGNORE_FEATURE)
    if mask1 is not None:
        m1 = jnp.where(mask1, m1, IGNORE_FEATURE)

    return {
        "assignment": positive,
        "reward": reward,
        "matches0": m0.astype(jnp.int32),
        "matches1": m1.astype(jnp.int32),
        "matching_scores0": (m0 > -1).astype(jnp.float32),
        "matching_scores1": (m1 > -1).astype(jnp.float32),
        "proj_0to1": kp0_1,
        "proj_1to0": kp1_0,
    }
