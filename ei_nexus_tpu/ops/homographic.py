"""Batched homographic sampling: DLT solve, meshgrids, perspective crops.

Parity with the live surface of reference `core/modules/utils/homography.py`
(HomographicSampler: _create_meshgrid:~, _get_perspective_transform:267,
extract_crop:585, transform_points:672 — used by get_dense_meshgrid and the
SiLK training pipeline). jnp/jit-friendly functional API instead of the
stateful torch class.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import to_homogeneous, from_homogeneous


def create_meshgrid(width: int, height: int,
                    normalized: bool = True) -> jax.Array:
    """(H, W, 2) xy grid; normalized in [-1, 1] at pixel centers or pixel
    coords + 0.5."""
    if normalized:
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2 - 1
        ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2 - 1
    else:
        xs = jnp.arange(width, dtype=jnp.float32) + 0.5
        ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def perspective_transform_from_points(src: jax.Array,
                                      dst: jax.Array) -> jax.Array:
    """Batched 4-point DLT: (..., 4, 2) src/dst -> (..., 3, 3) H with
    H @ src ~ dst (reference _get_perspective_transform)."""
    def rows(p, q):
        px, py = p[..., 0], p[..., 1]
        qx, qy = q[..., 0], q[..., 1]
        one = jnp.ones_like(px)
        zero = jnp.zeros_like(px)
        rx = jnp.stack([px, py, one, zero, zero, zero, -px * qx, -py * qx],
                       axis=-1)
        ry = jnp.stack([zero, zero, zero, px, py, one, -px * qy, -py * qy],
                       axis=-1)
        return rx, ry, qx, qy

    rxs, rys, qxs, qys = [], [], [], []
    for i in range(4):
        rx, ry, qx, qy = rows(src[..., i, :], dst[..., i, :])
        rxs.append(rx)
        rys.append(ry)
        qxs.append(qx)
        qys.append(qy)
    A = jnp.stack(rxs + rys, axis=-2)                     # (..., 8, 8)
    b = jnp.stack(qxs + qys, axis=-1)[..., None]          # (..., 8, 1)
    h = jnp.linalg.solve(A, b)[..., 0]
    ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    return jnp.concatenate([h, ones], axis=-1).reshape(h.shape[:-1] + (3, 3))


def transform_points(H: jax.Array, points_xy: jax.Array) -> jax.Array:
    """(..., 3, 3) x (..., N, 2) -> (..., N, 2)."""
    p = to_homogeneous(points_xy)
    w = jnp.einsum("...ij,...nj->...ni", H, p)
    return from_homogeneous(w, eps=1e-8)


def bilinear_sample_image(image: jax.Array, pts_xy: jax.Array) -> jax.Array:
    """Sample (H, W, C) at (..., 2) pixel coords (half-pixel centers, zero
    padding)."""
    Hh, Ww, C = image.shape
    x = pts_xy[..., 0] - 0.5
    y = pts_xy[..., 1] - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def g(xi, yi):
        inb = (xi >= 0) & (xi < Ww) & (yi >= 0) & (yi < Hh)
        v = image[jnp.clip(yi, 0, Hh - 1), jnp.clip(xi, 0, Ww - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    top = g(x0, y0) * (1 - wx) + g(x0 + 1, y0) * wx
    bot = g(x0, y0 + 1) * (1 - wx) + g(x0 + 1, y0 + 1) * wx
    return top * (1 - wy) + bot * wy


def extract_crop(image: jax.Array, H: jax.Array,
                 crop_size: Tuple[int, int]) -> jax.Array:
    """Perspective crop: warp the (ch, cw) target grid back through H into
    the source image and sample (reference extract_crop). image (H, W, C);
    H maps source->crop, so sampling uses H^-1."""
    ch, cw = crop_size
    grid = create_meshgrid(cw, ch, normalized=False).reshape(-1, 2)
    src = transform_points(jnp.linalg.inv(H), grid)
    out = bilinear_sample_image(image, src)
    return out.reshape(ch, cw, image.shape[-1])


def extract_crops_batched(images: jax.Array, Hs: jax.Array,
                          crop_size: Tuple[int, int]) -> jax.Array:
    """(B, H, W, C) x (B, 3, 3) -> (B, ch, cw, C)."""
    return jax.vmap(lambda im, h: extract_crop(im, h, crop_size))(images, Hs)
