"""PointNet++ building blocks: set abstraction (single/multi-scale grouping),
feature propagation, farthest-point sampling, ball query.

Parity with reference `core/modules/net/pointnet.py` (PointNet_SA_Module:162,
PointNet_SA_Module_MSG:204, PointNet_FP_Module:260, fps/ball-query helpers) —
dormant infrastructure there (imported by EventExtractors but unused by any
extractor variant); provided here as the same building blocks for
point-cloud event extractors, in fixed-shape jittable jnp + flax.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def square_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances."""
    return (jnp.sum(a**2, -1)[..., :, None]
            + jnp.sum(b**2, -1)[..., None, :]
            - 2 * jnp.einsum("...nd,...md->...nm", a, b))


def farthest_point_sample(xyz: jax.Array, n_samples: int,
                          mask: Optional[jax.Array] = None) -> jax.Array:
    """Iterative FPS: (N, 3) -> (n_samples,) indices (jit, fixed shape)."""
    N = xyz.shape[0]
    if mask is None:
        mask = jnp.ones(N, bool)
    big = jnp.asarray(1e10, xyz.dtype)

    def body(carry, _):
        dist, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, -1)
        dist = jnp.minimum(dist, jnp.where(mask, d, -big))
        nxt = jnp.argmax(jnp.where(mask, dist, -big))
        return (dist, nxt), nxt

    first = jnp.argmax(mask)  # first valid point
    (_, _), idx = jax.lax.scan(
        body, (jnp.where(mask, big, -big), first), None,
        length=n_samples - 1)
    return jnp.concatenate([first[None], idx])


def ball_query(xyz: jax.Array, centers: jax.Array, radius: float,
               n_neighbors: int,
               mask: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """(N, 3), (S, 3) -> neighbor indices (S, K) + validity (S, K); points
    outside the radius fall back to the nearest valid neighbor (PointNet++
    grouping convention of repeating the first point)."""
    d2 = square_distance(centers, xyz)                    # (S, N)
    if mask is not None:
        d2 = jnp.where(mask[None, :], d2, jnp.inf)
    in_ball = d2 <= radius**2
    # top-K by (not in_ball, distance): in-ball nearest first
    key = jnp.where(in_ball, d2, d2 + 1e9)
    neg = -key
    _, idx = jax.lax.top_k(neg, n_neighbors)              # (S, K)
    valid = jnp.take_along_axis(in_ball, idx, axis=1)
    # repeat the first (nearest) neighbor where invalid
    first = idx[:, :1]
    idx = jnp.where(valid, idx, first)
    return idx, valid


class PointNetSAModule(nn.Module):
    """Set abstraction: FPS centers -> ball-query groups -> shared MLP ->
    max pool (reference PointNet_SA_Module:162)."""

    n_centers: int
    radius: float
    n_neighbors: int
    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, feats: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None):
        """xyz (N, 3), feats (N, C) -> (centers (S, 3), out (S, mlp[-1]))."""
        centers_idx = farthest_point_sample(xyz, self.n_centers, mask)
        centers = xyz[centers_idx]
        nbr_idx, nbr_valid = ball_query(xyz, centers, self.radius,
                                        self.n_neighbors, mask)
        grouped = xyz[nbr_idx] - centers[:, None, :]       # (S, K, 3)
        if feats is not None:
            grouped = jnp.concatenate([grouped, feats[nbr_idx]], axis=-1)
        h = grouped.astype(self.dtype)
        for i, width in enumerate(self.mlp):
            h = nn.Dense(width, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = nn.relu(h)
        h = jnp.where(nbr_valid[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=1)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return centers, out


class PointNetSAModuleMSG(nn.Module):
    """Multi-scale grouping SA (reference PointNet_SA_Module_MSG:204)."""

    n_centers: int
    radii: Sequence[float]
    n_neighbors: Sequence[int]
    mlps: Sequence[Sequence[int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, feats: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None):
        centers_idx = farthest_point_sample(xyz, self.n_centers, mask)
        centers = xyz[centers_idx]
        outs = []
        for si, (radius, k, mlp) in enumerate(
                zip(self.radii, self.n_neighbors, self.mlps)):
            nbr_idx, nbr_valid = ball_query(xyz, centers, radius, k, mask)
            grouped = xyz[nbr_idx] - centers[:, None, :]
            if feats is not None:
                grouped = jnp.concatenate([grouped, feats[nbr_idx]], axis=-1)
            h = grouped.astype(self.dtype)
            for i, width in enumerate(mlp):
                h = nn.Dense(width, dtype=self.dtype,
                             name=f"scale{si}_mlp_{i}")(h)
                h = nn.relu(h)
            h = jnp.where(nbr_valid[..., None], h, -jnp.inf)
            o = jnp.max(h, axis=1)
            outs.append(jnp.where(jnp.isfinite(o), o, 0.0))
        return centers, jnp.concatenate(outs, axis=-1)


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP
    (reference PointNet_FP_Module:260)."""

    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz_dst: jax.Array, xyz_src: jax.Array,
                 feats_dst: Optional[jax.Array], feats_src: jax.Array):
        """Interpolate src features onto dst points; concat with existing
        dst features; MLP. xyz_dst (N, 3); xyz_src (S, 3); feats_src
        (S, C)."""
        d2 = square_distance(xyz_dst, xyz_src)             # (N, S)
        neg = -d2
        top, idx = jax.lax.top_k(neg, 3)
        w = 1.0 / jnp.maximum(-top, 1e-8)
        w = w / jnp.sum(w, -1, keepdims=True)
        interp = jnp.sum(feats_src[idx] * w[..., None], axis=1)  # (N, C)
        h = interp if feats_dst is None else jnp.concatenate(
            [feats_dst, interp], axis=-1)
        h = h.astype(self.dtype)
        for i, width in enumerate(self.mlp):
            h = nn.Dense(width, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = nn.relu(h)
        return h
