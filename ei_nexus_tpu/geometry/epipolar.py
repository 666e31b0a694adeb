"""Epipolar geometry: essential/fundamental matrices, symmetric epipolar
distances, essential-matrix decomposition and angular pose errors.

Functional parity with reference `core/geometry/epipolar.py`; pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import Pose, skew_symmetric, to_homogeneous
from .camera import Camera


def T_to_E(T: Pose) -> jax.Array:
    """Pose -> essential matrix E = [t]x R."""
    return skew_symmetric(T.t) @ T.R


def E_to_F(cam0: Camera, cam1: Camera, E: jax.Array) -> jax.Array:
    K0inv = jnp.linalg.inv(cam0.calibration_matrix())
    K1inv = jnp.linalg.inv(cam1.calibration_matrix())
    return jnp.swapaxes(K1inv, -1, -2) @ E @ K0inv


def T_to_F(cam0: Camera, cam1: Camera, T_0to1: Pose) -> jax.Array:
    return E_to_F(cam0, cam1, T_to_E(T_0to1))


def F_to_E(cam0: Camera, cam1: Camera, F: jax.Array) -> jax.Array:
    K0 = cam0.calibration_matrix()
    K1 = cam1.calibration_matrix()
    return jnp.swapaxes(K1, -1, -2) @ F @ K0


def sym_epipolar_distance(p0, p1, E, squared: bool = True) -> jax.Array:
    """Pairwise (aligned) symmetric epipolar distance of N point pairs.

    p0, p1: (..., N, 2|3); E: (..., 3, 3). Returns (..., N).
    """
    if p0.shape[-1] != 3:
        p0 = to_homogeneous(p0)
    if p1.shape[-1] != 3:
        p1 = to_homogeneous(p1)
    p1_E_p0 = jnp.einsum("...ni,...ij,...nj->...n", p1, E, p0)
    E_p0 = jnp.einsum("...ij,...nj->...ni", E, p0)
    Et_p1 = jnp.einsum("...ij,...ni->...nj", E, p1)
    d0 = jnp.maximum(E_p0[..., 0] ** 2 + E_p0[..., 1] ** 2, 1e-6)
    d1 = jnp.maximum(Et_p1[..., 0] ** 2 + Et_p1[..., 1] ** 2, 1e-6)
    if squared:
        return p1_E_p0**2 * (1 / d0 + 1 / d1)
    return jnp.abs(p1_E_p0) * (1 / jnp.sqrt(d0) + 1 / jnp.sqrt(d1)) / 2


def sym_epipolar_distance_all(p0, p1, E, eps: float = 1e-15) -> jax.Array:
    """All-pairs symmetric epipolar distance.

    p0: (..., N, 2|3), p1: (..., M, 2|3) -> (..., N, M)
    (same N-rows/M-cols layout as reference epipolar.py:61).
    """
    if p0.shape[-1] != 3:
        p0 = to_homogeneous(p0)
    if p1.shape[-1] != 3:
        p1 = to_homogeneous(p1)
    p1_E_p0 = jnp.abs(jnp.einsum("...mi,...ij,...nj->...nm", p1, E, p0))
    E_p0 = jnp.einsum("...ij,...nj->...ni", E, p0)
    Et_p1 = jnp.einsum("...ij,...mi->...mj", E, p1)
    d0 = p1_E_p0 / jnp.sqrt(E_p0[..., None, 0] ** 2 + E_p0[..., None, 1] ** 2 + eps)
    d1 = p1_E_p0 / jnp.sqrt(
        Et_p1[..., None, :, 0] ** 2 + Et_p1[..., None, :, 1] ** 2 + eps)
    return (d0 + d1) / 2


def decompose_essential_matrix(E: jax.Array):
    """E -> (R1, R2, t) candidate decompositions (reference epipolar.py:101)."""
    U, _, Vt = jnp.linalg.svd(E)
    mask = jnp.ones_like(E).at[..., :, -1].multiply(-1.0)
    maskt = jnp.swapaxes(mask, -1, -2)
    U = jnp.where((jnp.linalg.det(U) < 0)[..., None, None], U * mask, U)
    Vt = jnp.where((jnp.linalg.det(Vt) < 0)[..., None, None], Vt * maskt, Vt)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., -1]
    return R1, R2, t


def angle_error_mat(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Angular distance in degrees between two rotation matrices."""
    cos = (jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1) - 1) / 2
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.abs(jnp.arccos(cos)))


def angle_error_vec(v1: jax.Array, v2: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Angular distance in degrees between two vectors."""
    n = jnp.maximum(jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), eps)
    cos = jnp.clip(jnp.sum(v1 * v2, axis=-1) / n, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def relative_pose_error(T_0to1: Pose, R: jax.Array, t: jax.Array,
                        eps: float = 1e-10):
    """Angular (t_err, R_err) in degrees of an estimated relative pose vs GT.

    t_err is folded to <=90 deg to handle the essential-matrix sign ambiguity
    (reference epipolar.py:148).
    """
    t_err = angle_error_vec(t, T_0to1.t, eps)
    t_err = jnp.minimum(t_err, 180.0 - t_err)
    r_err = angle_error_mat(R, T_0to1.R)
    return t_err, r_err


def generalized_epi_dist(kpts0, kpts1, cam0: Camera, cam1: Camera,
                         T_0to1: Pose, all_pairs: bool = True,
                         essential: bool = True):
    """Epipolar distances in normalized (essential) or pixel (fundamental)
    coordinates (reference epipolar.py:76)."""
    if essential:
        E = T_to_E(T_0to1)
        p0 = cam0.image2cam(kpts0)
        p1 = cam1.image2cam(kpts1)
        if all_pairs:
            return sym_epipolar_distance_all(p0, p1, E)
        return sym_epipolar_distance(p0, p1, E, squared=False)
    F = E_to_F(cam0, cam1, T_to_E(T_0to1))
    if all_pairs:
        return sym_epipolar_distance_all(kpts0, kpts1, F)
    return sym_epipolar_distance(kpts0, kpts1, F, squared=False)
