"""Batched SE(3) rigid transforms as a JAX pytree.

Capability parity with the reference's `core/geometry/wrappers.py:111` (Pose),
re-designed as an immutable flax.struct dataclass so it threads through
`jit`/`vmap`/`grad` and device meshes like any other array pytree (the
reference packs R|t into a 12-vector torch tensor with a __torch_function__
shim; none of that is needed under JAX's functional model).

Conventions: `R` is (..., 3, 3), `t` is (..., 3); `T_A2B.transform(p_A) ->
p_B`; composition `T_B2C @ T_A2B -> T_A2C`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def skew_symmetric(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix from a (..., 3) vector."""
    z = jnp.zeros_like(v[..., 0])
    rows = [
        z, -v[..., 2], v[..., 1],
        v[..., 2], z, -v[..., 0],
        -v[..., 1], v[..., 0], z,
    ]
    return jnp.stack(rows, axis=-1).reshape(v.shape[:-1] + (3, 3))


def so3exp_map(w: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Rodrigues' formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta < eps
    div = jnp.where(small, jnp.ones_like(theta), theta)
    W = skew_symmetric(w / div)
    th = theta[..., None]
    res = W * jnp.sin(th) + (W @ W) * (1.0 - jnp.cos(th))
    res = jnp.where(small[..., None], W, res)  # first-order Taylor for tiny angles
    return jnp.eye(3, dtype=w.dtype) + res


def to_homogeneous(points: jax.Array) -> jax.Array:
    """(..., N) -> (..., N+1) with a trailing 1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: jax.Array, eps: float = 0.0) -> jax.Array:
    """(..., N+1) -> (..., N), dividing by the last coordinate."""
    return points[..., :-1] / (points[..., -1:] + eps)


@struct.dataclass
class Pose:
    """Batched SE(3) transform. Fields broadcast over leading dims."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_Rt(cls, R: jax.Array, t: jax.Array) -> "Pose":
        return cls(R=jnp.asarray(R), t=jnp.asarray(t))

    @classmethod
    def from_aa(cls, aa: jax.Array, t: jax.Array) -> "Pose":
        """From axis-angle rotation vector and translation."""
        return cls(R=so3exp_map(jnp.asarray(aa)), t=jnp.asarray(t))

    @classmethod
    def from_4x4mat(cls, T: jax.Array) -> "Pose":
        T = jnp.asarray(T)
        return cls(R=T[..., :3, :3], t=T[..., :3, 3])

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return cls(R=R, t=t)

    # -- properties --------------------------------------------------------
    @property
    def shape(self):
        return self.t.shape[:-1]

    @property
    def dtype(self):
        return self.t.dtype

    def as_4x4mat(self) -> jax.Array:
        bottom = jnp.zeros(self.shape + (1, 4), dtype=self.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    # -- algebra -----------------------------------------------------------
    def inv(self) -> "Pose":
        Rinv = jnp.swapaxes(self.R, -1, -2)
        tinv = -(Rinv @ self.t[..., None])[..., 0]
        return Pose(R=Rinv, t=tinv)

    def compose(self, other: "Pose") -> "Pose":
        """T_B2C.compose(T_A2B) -> T_A2C."""
        R = self.R @ other.R
        t = self.t + (self.R @ other.t[..., None])[..., 0]
        return Pose(R=R, t=t)

    def transform(self, p3d: jax.Array) -> jax.Array:
        """Apply to (..., N, 3) points."""
        return p3d @ jnp.swapaxes(self.R, -1, -2) + self.t[..., None, :]

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def J_transform(self, p3d_out: jax.Array) -> jax.Array:
        """Jacobian of transformed points wrt a left-multiplied se3 twist.

        Matches reference `wrappers.py:J_transform`: [I | -skew(p)] (N, 3, 6).
        """
        eye = jnp.zeros(p3d_out.shape + (3,), dtype=p3d_out.dtype)
        eye = eye + jnp.eye(3, dtype=p3d_out.dtype)
        J_rot = -skew_symmetric(p3d_out)
        return jnp.concatenate([eye, J_rot], axis=-1)

    def magnitude(self):
        """(rotation angle in degrees, translation norm)."""
        trace = jnp.trace(self.R, axis1=-2, axis2=-1)
        cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
        dr = jnp.abs(jnp.arccos(cos)) / jnp.pi * 180.0
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt
