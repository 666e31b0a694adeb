"""Centered padding of feature maps to a cell-size multiple.

Parity with reference `core/modules/utils/util.py:5` (Padder): pad H, W up to
the next multiple of `cell` split evenly (left = pad//2), replicate-edge for
float data / zeros for bool masks; unpad maps and shift sparse positions back.

Shapes are static under jit, so this is a plain Python helper whose arithmetic
happens at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Padder:
    """Pads (..., H, W, C) or (..., H, W) maps; NHWC layout."""

    def __init__(self, height: int, width: int, cell: int):
        h_pad = (-height) % cell
        w_pad = (-width) % cell
        self.top, self.bottom = h_pad // 2, h_pad - h_pad // 2
        self.left, self.right = w_pad // 2, w_pad - w_pad // 2
        self.height, self.width = height, width
        self.padded_height = height + h_pad
        self.padded_width = width + w_pad

    def pad(self, x: jax.Array, hw_axes=(-3, -2)) -> jax.Array:
        """Pad the two spatial axes (default: NHWC's H, W)."""
        ha, wa = [a % x.ndim for a in hw_axes]
        cfg = [(0, 0, 0)] * x.ndim
        cfg[ha] = (self.top, self.bottom, 0)
        cfg[wa] = (self.left, self.right, 0)
        if x.dtype == jnp.bool_:
            return jax.lax.pad(x, jnp.asarray(False), cfg)
        # replicate-edge padding
        pad_width = [(c[0], c[1]) for c in cfg]
        return jnp.pad(x, pad_width, mode="edge")

    def unpad(self, x: jax.Array, hw_axes=(-3, -2)) -> jax.Array:
        ha, wa = [a % x.ndim for a in hw_axes]
        idx = [slice(None)] * x.ndim
        idx[ha] = slice(self.top, self.top + self.height)
        idx[wa] = slice(self.left, self.left + self.width)
        return x[tuple(idx)]

    def unpad_positions(self, positions: jax.Array,
                        ordering: str = "yx") -> jax.Array:
        """Shift (..., N, >=2) keypoint positions back to unpadded coords."""
        assert ordering in ("yx", "xy")
        if ordering == "yx":
            off = jnp.asarray([self.top, self.left], positions.dtype)
        else:
            off = jnp.asarray([self.left, self.top], positions.dtype)
        shifted = positions[..., :2] - off
        return jnp.concatenate([shifted, positions[..., 2:]], axis=-1)
