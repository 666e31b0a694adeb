"""Multi-view linear triangulation.

Parity with the reference's (unused at runtime) `TrackTriangulator`
(datasets/Pose.py:71-160): SVD/least-squares triangulation of a track seen
in multiple views — here batched, jittable, and actually wired up as the
landmark initializer for the bundle-adjustment back-end (parallel/ba.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import Pose
from .camera import Camera


def triangulate_linear(kpts_xy: jax.Array, poses: Pose, cams: Camera,
                       mask: jax.Array | None = None) -> jax.Array:
    """DLT triangulation of one 3D point from V views.

    kpts_xy: (V, 2) pixel observations; poses: V world->cam Poses; cams: V
    cameras; mask: (V,) validity. Returns (3,) world point (lstsq over the
    2V homogeneous constraints). vmap over tracks for batches.
    """
    K = cams.calibration_matrix()                    # (V, 3, 3)
    P = K @ jnp.concatenate([poses.R, poses.t[..., None]], axis=-1)  # (V,3,4)
    u = kpts_xy[..., 0]
    v = kpts_xy[..., 1]
    rows = jnp.concatenate([
        u[..., None] * P[..., 2, :] - P[..., 0, :],
        v[..., None] * P[..., 2, :] - P[..., 1, :],
    ], axis=-2).reshape(-1, 4)                       # (2V, 4)
    if mask is not None:
        # row layout after the concat/reshape: all u-rows then all v-rows
        m = jnp.concatenate([mask, mask])[:, None]
        rows = rows * m
    _, _, Vt = jnp.linalg.svd(rows, full_matrices=True)
    X = Vt[-1]
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])


def triangulate_tracks(kpts_xy: jax.Array, poses: Pose, cams: Camera,
                       mask: jax.Array | None = None) -> jax.Array:
    """Batched tracks: kpts (T, V, 2) -> (T, 3) world points."""
    def one(k, m):
        return triangulate_linear(k, poses, cams, m)
    if mask is None:
        mask = jnp.ones(kpts_xy.shape[:2], bool)
    return jax.vmap(one)(kpts_xy, mask)
