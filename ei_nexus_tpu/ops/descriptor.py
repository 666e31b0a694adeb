"""Descriptor postprocessing: normalization, sparse sampling, upsampling.

Capability parity with reference `core/modules/utils/descriptor_util.py`
(normalize_descriptors, sparsify_low/full_resolution_descriptors,
upsample_descriptors, get_dense_descriptors), re-designed for NHWC maps and
fixed-K keypoint slots (batched gathers instead of per-sample grid_sample
loops).

Coordinate conventions reproduced exactly:
 - low-res sampling: full-res positions are shifted by -0.5, normalized by
   (padded_size - 1), and bilinearly sampled on the coarse map with
   half-pixel centers and zero padding (= torch grid_sample,
   align_corners=False; descriptor_util.py:105-121);
 - full-res sampling: floor integer gather (descriptor_util.py:58-61);
 - upsampling: half-pixel bilinear resize (torchvision resize).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_descriptors(desc: jax.Array, scale_factor: float = 1.0,
                          normalize: bool = True,
                          axis: int = -1) -> jax.Array:
    """L2-normalize along the descriptor axis, then scale."""
    if normalize:
        norm = jnp.linalg.norm(desc, axis=axis, keepdims=True)
        desc = desc / jnp.maximum(norm, 1e-12)
    return scale_factor * desc


def _bilinear_gather_nhwc(fmap: jax.Array, px: jax.Array,
                          py: jax.Array) -> jax.Array:
    """Bilinear sample of (B, H, W, C) at float pixel-index coords (B, K)
    with zero padding outside (torch grid_sample zeros semantics)."""
    B, H, W, C = fmap.shape
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = fmap.reshape(B, H * W, C)
        vals = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def sample_descriptors_lowres(
    raw_desc: jax.Array,
    positions: jax.Array,
    padded_size: Tuple[int, int],
    scale_factor: float = 1.0,
    normalize: bool = True,
    ordering: str = "yx",
) -> jax.Array:
    """Sample a coarse (B, h, w, D) descriptor map at full-res keypoints.

    positions: (B, K, >=2) in full-res padded pixel coords (`ordering`).
    Exact reproduction of reference sparsify_low_resolution_descriptors:
    pos' = (pos - 0.5); u = 2*pos'/(S-1) - 1; grid_sample(align_corners=False)
    => low-res coord l = (u+1)/2 * w_low - 0.5.
    """
    assert ordering in ("yx", "xy")
    H, W = padded_size
    h, w = raw_desc.shape[1], raw_desc.shape[2]
    if ordering == "yx":
        py_full, px_full = positions[..., 0], positions[..., 1]
    else:
        px_full, py_full = positions[..., 0], positions[..., 1]
    uy = 2.0 * (py_full - 0.5) / (H - 1) - 1.0
    ux = 2.0 * (px_full - 0.5) / (W - 1) - 1.0
    ly = (uy + 1.0) / 2.0 * h - 0.5
    lx = (ux + 1.0) / 2.0 * w - 0.5
    desc = _bilinear_gather_nhwc(raw_desc, lx, ly)
    return normalize_descriptors(desc, scale_factor, normalize)


def sample_descriptors_fullres(
    raw_desc: jax.Array,
    positions: jax.Array,
    scale_factor: float = 1.0,
    normalize: bool = True,
    ordering: str = "yx",
) -> jax.Array:
    """Integer (floor) gather from a full-res (B, H, W, D) descriptor map at
    (B, K, >=2) positions (reference sparsify_full_resolution_descriptors)."""
    assert ordering in ("yx", "xy")
    B, H, W, D = raw_desc.shape
    if ordering == "yx":
        yi = jnp.floor(positions[..., 0]).astype(jnp.int32)
        xi = jnp.floor(positions[..., 1]).astype(jnp.int32)
    else:
        xi = jnp.floor(positions[..., 0]).astype(jnp.int32)
        yi = jnp.floor(positions[..., 1]).astype(jnp.int32)
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    flat = raw_desc.reshape(B, H * W, D)
    desc = jnp.take_along_axis(flat, (yi * W + xi)[..., None], axis=1)
    return normalize_descriptors(desc, scale_factor, normalize)


def upsample_descriptors(raw_desc: jax.Array, image_size: Tuple[int, int],
                         scale_factor: float = 1.0) -> jax.Array:
    """Bilinear-resize a coarse (B, h, w, D) map to (B, H, W, D), then
    L2-normalize (reference upsample_descriptors; torchvision bilinear =
    half-pixel centers, no antialias on upscale)."""
    B, _, _, D = raw_desc.shape
    H, W = image_size
    up = jax.image.resize(raw_desc, (B, H, W, D), method="bilinear")
    return normalize_descriptors(up, scale_factor)


def dense_descriptors(normalized_desc: jax.Array) -> jax.Array:
    """(B, H, W, D) -> (B, H*W, D) row-major flatten."""
    B, H, W, D = normalized_desc.shape
    return normalized_desc.reshape(B, H * W, D)
