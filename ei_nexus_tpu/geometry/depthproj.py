"""Depth sampling and cross-view keypoint reprojection.

Functional parity with reference `core/geometry/depth.py` (sample_depth,
project, dense_warp_consistency), implemented as fixed-shape gathers instead
of `grid_sample` so it vectorizes cleanly on TPU.

Coordinate convention inside this module: points are (x, y) pixels (the GT
generator flips from the model's yx ordering before calling in, exactly like
the reference).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .se3 import Pose
from .camera import Camera


def _gather_hw(fmap: jax.Array, xi: jax.Array, yi: jax.Array) -> jax.Array:
    """Gather fmap[..., y, x] with zero padding outside bounds.

    fmap: (..., H, W); xi, yi: (..., N) integer indices.
    """
    H, W = fmap.shape[-2], fmap.shape[-1]
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    flat = fmap.reshape(fmap.shape[:-2] + (H * W,))
    vals = jnp.take_along_axis(flat, yc * W + xc, axis=-1)
    return jnp.where(inb, vals, 0.0)


def bilinear_sample_map(fmap: jax.Array, pts: jax.Array) -> jax.Array:
    """Bilinear sample of (..., H, W) at (..., N, 2) xy pixel coords.

    Uses half-pixel centers (align_corners=False semantics: value of pixel
    (i, j) lives at (j + 0.5, i + 0.5)) and zero padding outside — NaN values
    in `fmap` propagate to any sample touching them.
    """
    x = pts[..., 0] - 0.5
    y = pts[..., 1] - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    v00 = _gather_hw(fmap, x0, y0)
    v01 = _gather_hw(fmap, x0 + 1, y0)
    v10 = _gather_hw(fmap, x0, y0 + 1)
    v11 = _gather_hw(fmap, x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest_sample_map(fmap: jax.Array, pts: jax.Array) -> jax.Array:
    """Nearest-neighbor sample (same half-pixel convention)."""
    xi = jnp.floor(pts[..., 0]).astype(jnp.int32)
    yi = jnp.floor(pts[..., 1]).astype(jnp.int32)
    return _gather_hw(fmap, xi, yi)


def sample_depth(pts: jax.Array, depth: jax.Array):
    """NaN-aware bilinear depth lookup with nearest fallback.

    pts: (..., N, 2) xy pixels; depth: (..., H, W) with <=0 marking invalid.
    Returns (depth_at_pts (..., N), valid (..., N)).
    Mirrors reference depth.py:sample_depth (bilinear, falling back to nearest
    where interpolation crosses an invalid pixel).
    """
    d = jnp.where(depth > 0, depth, jnp.nan)
    lin = bilinear_sample_map(d, pts)
    nn = nearest_sample_map(d, pts)
    interp = jnp.where(jnp.isnan(lin), nn, lin)
    valid = (~jnp.isnan(interp)) & (interp > 0)
    return jnp.nan_to_num(interp), valid


def project(
    kpi: jax.Array,
    di: jax.Array,
    depthj: Optional[jax.Array],
    camera_i: Camera,
    camera_j: Camera,
    T_itoj: Pose,
    validi: jax.Array,
    ccth: Optional[float] = None,
):
    """Reproject keypoints from view i into view j through depth.

    kpi: (..., N, 2) xy pixels; di: (..., N) depths; depthj: (..., H, W) or
    None; returns (kpi_j (..., N, 2), visible (..., N)).

    With `ccth` set, also enforces circle consistency: reproject back through
    view j's depth and require a round-trip error < ccth px^2 (reference
    depth.py:project).
    """
    kpi_3d_i = camera_i.image2cam(kpi) * di[..., None]
    kpi_3d_j = T_itoj.transform(kpi_3d_i)
    kpi_j, validj = camera_j.cam2image(kpi_3d_j)
    valid = validi & validj
    if depthj is None or ccth is None:
        return kpi_j, valid
    dj, validdj = sample_depth(kpi_j, depthj)
    kpi_j_3d_j = camera_j.image2cam(kpi_j) * dj[..., None]
    kpi_j_i, validj_i = camera_i.cam2image(T_itoj.inv().transform(kpi_j_3d_j))
    consistent = jnp.sum((kpi - kpi_j_i) ** 2, axis=-1) < ccth
    return kpi_j, valid & consistent & validj_i & validdj


def dense_warp_consistency(
    depthi: jax.Array,
    depthj: jax.Array,
    T_itoj: Pose,
    camera_i: Camera,
    camera_j: Camera,
    **kwargs,
):
    """Warp every pixel of view i into view j (reference depth.py:71)."""
    H, W = depthi.shape[-2:]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=depthi.dtype),
                          jnp.arange(W, dtype=depthi.dtype), indexing="ij")
    kpi = jnp.stack([xs, ys], axis=-1).reshape(1, H * W, 2) + 0.5
    kpi = jnp.broadcast_to(kpi, depthi.shape[:-2] + (H * W, 2))
    di = depthi.reshape(depthi.shape[:-2] + (H * W,))
    validi = di > 0
    kpir, validir = project(
        kpi, di, depthj, camera_i, camera_j, T_itoj, validi, **kwargs)
    return (kpir.reshape(depthi.shape[:-2] + (H, W, 2)),
            validir.reshape(depthi.shape[:-2] + (H, W)))
