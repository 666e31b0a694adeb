"""Pallas TPU kernel: fused iterative NMS.

The XLA NMS (ops/detector.nms) runs each suppression iteration as a pair of
reduce_window max-pools with the score map bouncing through HBM between
`while_loop` iterations. This kernel keeps the whole (H, W) map in VMEM for
all iterations and computes the (2r+1)^2 window max separably (row max then
column max via shifted maxima) on the VPU — one HBM read and one write per
image total.

Semantics match `nms(..., max_iter=n_iter)`: `n_iter` fixed suppression
rounds (the iterate-until-converged reference `fast_nms` converges in 2-3
rounds on real score maps; n_iter=4 default gives identical outputs there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -jnp.inf


def _shift_rows(z: jax.Array, d: int) -> jax.Array:
    """Shift rows by d (positive = pull from below), -inf fill."""
    H, W = z.shape
    fill = jnp.full((abs(d), W), _NEG, z.dtype)
    if d > 0:
        return jnp.concatenate([z[d:], fill], axis=0)
    return jnp.concatenate([fill, z[:d]], axis=0)


def _shift_cols(z: jax.Array, d: int) -> jax.Array:
    H, W = z.shape
    fill = jnp.full((H, abs(d)), _NEG, z.dtype)
    if d > 0:
        return jnp.concatenate([z[:, d:], fill], axis=1)
    return jnp.concatenate([fill, z[:, :d]], axis=1)


def _window_max(z: jax.Array, radius: int) -> jax.Array:
    """Separable (2r+1)^2 window max."""
    m = z
    for d in range(1, radius + 1):
        m = jnp.maximum(m, jnp.maximum(_shift_rows(z, d), _shift_rows(z, -d)))
    rowmax = m
    m = rowmax
    for d in range(1, radius + 1):
        m = jnp.maximum(m, jnp.maximum(_shift_cols(rowmax, d),
                                       _shift_cols(rowmax, -d)))
    return m


def _nms_kernel(score_ref, out_ref, *, radius, n_iter):
    x = score_ref[0]

    def body(_, x):
        pooled = _window_max(x, radius)
        is_max = (x == pooled) & (x > 0)
        neigh = _window_max(jnp.where(is_max, 1.0, 0.0), radius) > 0
        return jnp.where(neigh & ~is_max, 0.0, x)

    out_ref[0] = jax.lax.fori_loop(0, n_iter, body, x)


@functools.partial(jax.jit, static_argnames=("radius", "n_iter", "interpret"))
def nms_pallas(score: jax.Array, radius: int, n_iter: int = 4,
               interpret: bool = False) -> jax.Array:
    """(B, H, W) score map -> suppressed map, n_iter fused rounds."""
    B, H, W = score.shape
    return pl.pallas_call(
        functools.partial(_nms_kernel, radius=radius, n_iter=n_iter),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), score.dtype),
        interpret=interpret,
    )(score)
