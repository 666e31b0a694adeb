"""Batched pinhole camera with radial-tangential distortion, as a JAX pytree.

Capability parity with the reference's `core/geometry/wrappers.py:238` (Camera)
and `core/geometry/utils.py:distort_points/J_distort_points`, re-designed as a
flax.struct dataclass with a fixed 4-term distortion slot (k1, k2, p1, p2 —
zero-padded) so the pytree structure is static under jit regardless of the
calibration model.

Point convention: pixel coordinates are (x, y) with the center of the top-left
pixel at (0.5, 0.5)-ish COLMAP-style; `size` is (width, height).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .se3 import to_homogeneous


@struct.dataclass
class Camera:
    size: jax.Array  # (..., 2) width, height
    f: jax.Array     # (..., 2) fx, fy
    c: jax.Array     # (..., 2) cx, cy
    dist: jax.Array  # (..., 4) k1, k2, p1, p2 (zero-padded)

    eps: float = struct.field(pytree_node=False, default=1e-4)

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_calibration_matrix(cls, K: jax.Array, size=None) -> "Camera":
        """From a (..., 3, 3) intrinsics matrix.

        If `size` is not given, uses 2*c as an image-size proxy (matching the
        reference's `from_calibration_matrix`, wrappers.py:262).
        """
        K = jnp.asarray(K)
        f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
        c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
        if size is None:
            size = 2.0 * c
        else:
            size = jnp.broadcast_to(jnp.asarray(size, dtype=K.dtype), c.shape)
        dist = jnp.zeros(c.shape[:-1] + (4,), dtype=K.dtype)
        return cls(size=size, f=f, c=c, dist=dist)

    @classmethod
    def from_params(cls, width, height, fx, fy, cx, cy, dist=None) -> "Camera":
        size = jnp.stack([jnp.asarray(width, jnp.float32),
                          jnp.asarray(height, jnp.float32)], axis=-1)
        f = jnp.stack([jnp.asarray(fx, jnp.float32),
                       jnp.asarray(fy, jnp.float32)], axis=-1)
        c = jnp.stack([jnp.asarray(cx, jnp.float32),
                       jnp.asarray(cy, jnp.float32)], axis=-1)
        if dist is None:
            d = jnp.zeros(f.shape[:-1] + (4,), jnp.float32)
        else:
            d = jnp.asarray(dist, jnp.float32)
            pad = 4 - d.shape[-1]
            if pad > 0:
                d = jnp.concatenate(
                    [d, jnp.zeros(d.shape[:-1] + (pad,), d.dtype)], axis=-1)
        return cls(size=size, f=f, c=c, dist=d)

    # -- properties --------------------------------------------------------
    @property
    def shape(self):
        return self.f.shape[:-1]

    def calibration_matrix(self) -> jax.Array:
        K = jnp.zeros(self.shape + (3, 3), dtype=self.f.dtype)
        K = K.at[..., 0, 0].set(self.f[..., 0])
        K = K.at[..., 1, 1].set(self.f[..., 1])
        K = K.at[..., 0, 2].set(self.c[..., 0])
        K = K.at[..., 1, 2].set(self.c[..., 1])
        K = K.at[..., 2, 2].set(1.0)
        return K

    # -- image-space edits -------------------------------------------------
    def scale(self, scales) -> "Camera":
        s = jnp.broadcast_to(jnp.asarray(scales, self.f.dtype), self.f.shape)
        return Camera(size=self.size * s, f=self.f * s, c=self.c * s,
                      dist=self.dist, eps=self.eps)

    def crop(self, left_top: Tuple[float, float], size: Tuple[int, int]) -> "Camera":
        lt = jnp.asarray(left_top, self.f.dtype)
        new_size = jnp.broadcast_to(jnp.asarray(size, self.f.dtype), self.size.shape)
        return Camera(size=new_size, f=self.f, c=self.c - lt,
                      dist=self.dist, eps=self.eps)

    # -- projection --------------------------------------------------------
    def in_image(self, p2d: jax.Array) -> jax.Array:
        """(..., N, 2) -> (..., N) bool, inside [0, size-1]."""
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0) & (p2d <= size - 1), axis=-1)

    def project(self, p3d: jax.Array):
        """Perspective divide. (..., N, 3) -> ((..., N, 2), (..., N) valid)."""
        z = p3d[..., -1]
        valid = z > self.eps
        z = jnp.maximum(z, self.eps)
        return p3d[..., :-1] / z[..., None], valid

    def J_project(self, p3d: jax.Array) -> jax.Array:
        x, y, z = p3d[..., 0], p3d[..., 1], p3d[..., 2]
        z = jnp.maximum(z, self.eps)
        zero = jnp.zeros_like(z)
        J = jnp.stack(
            [1 / z, zero, -x / z**2, zero, 1 / z, -y / z**2], axis=-1)
        return J.reshape(p3d.shape[:-1] + (2, 3))

    def distort(self, pts: jax.Array):
        """Apply radial(-tangential) distortion to normalized coords.

        Returns (distorted, valid) where valid flags points inside the
        distortion model's monotonic region (reference utils.py:distort_points).
        """
        d = self.dist[..., None, :]
        k1, k2 = d[..., 0:1], d[..., 1:2]
        p12 = d[..., 2:4]
        r2 = jnp.sum(pts**2, axis=-1, keepdims=True)
        radial = k1 * r2 + k2 * r2**2
        undist = pts + pts * radial
        # tangential
        p21 = p12[..., ::-1]
        uv = jnp.prod(pts, axis=-1, keepdims=True)
        undist = undist + 2 * p12 * uv + p21 * (r2 + 2 * pts**2)

        # validity: discard points beyond the inflection radius of the radial
        # polynomial d(r + k1 r^3 + k2 r^5)/dr = 0
        limited = ((k2 > 0) & ((9 * k1**2 - 20 * k2) > 0)) | ((k2 <= 0) & (k1 > 0))
        disc = jnp.maximum(9 * k1**2 - 20 * k2, 0.0)
        safe_k2 = jnp.where(jnp.abs(k2) > 1e-12, k2, 1.0)
        safe_k1 = jnp.where(jnp.abs(k1) > 1e-12, k1, 1.0)
        limit = jnp.abs(jnp.where(
            k2 > 0, (jnp.sqrt(disc) - 3 * k1) / (10 * safe_k2), 1 / (3 * safe_k1)))
        valid = jnp.squeeze(~limited | (r2 < limit), -1)
        return undist, valid

    def denormalize(self, p2d: jax.Array) -> jax.Array:
        return p2d * self.f[..., None, :] + self.c[..., None, :]

    def normalize(self, p2d: jax.Array) -> jax.Array:
        return (p2d - self.c[..., None, :]) / self.f[..., None, :]

    def cam2image(self, p3d: jax.Array):
        """(..., N, 3) camera-frame points -> ((..., N, 2) px, (..., N) valid)."""
        p2d, visible = self.project(p3d)
        p2d, dist_ok = self.distort(p2d)
        p2d = self.denormalize(p2d)
        valid = visible & dist_ok & self.in_image(p2d)
        return p2d, valid

    def image2cam(self, p2d: jax.Array) -> jax.Array:
        """(..., N, 2) pixels -> (..., N, 3) rays with z=1 (no undistortion
        iteration, matching the reference's image2cam)."""
        return to_homogeneous(self.normalize(p2d))
