"""Pose-graph optimization and distributed Schur-complement bundle adjustment.

New capability beyond the reference (which estimates pose only per-pair via
OpenCV RANSAC, matching_metrics.py:362-450; its only triangulation code is
the unused TrackTriangulator, datasets/Pose.py:71-160). This module provides
the SLAM back-end of the BASELINE.json north star: keyframes + landmarks
refined jointly, scaling over a device mesh.

TPU-first design:
 - the problem is fixed-shape: M keyframes (se3 twists), L landmarks,
   O observations as flat index/measurement arrays with validity masks;
 - Gauss-Newton / Levenberg-Marquardt steps build the Schur-complement
   reduced camera system implicitly: Hll (3x3 per landmark) is inverted in
   closed form, and the reduced system  S dp = b  is solved MATRIX-FREE by
   preconditioned conjugate gradients — every CG iteration is two
   segment-sums over observations (no M*6 x M*6 matrix is ever formed);
 - distribution: observations are sharded over the mesh's data axis; the
   segment-sums inside jit become `psum`-style collectives over ICI
   automatically under `jax.sharding` (see tests/test_ba.py for the
   8-device CPU-mesh equivalence check).

Conventions: pose twists are (rot, trans) 6-vectors mapping world->camera
as x_cam = R(w) x_world + t; pinhole projection with per-keyframe
intrinsics (fx, fy, cx, cy).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import so3exp_map, skew_symmetric


class BAProblem(NamedTuple):
    """Fixed-shape bundle adjustment problem.

    poses:      (M, 6)  se3 twists (w, t), world->camera
    intrinsics: (M, 4)  fx, fy, cx, cy
    points:     (L, 3)  world landmarks
    obs_pose:   (O,)    keyframe index per observation
    obs_point:  (O,)    landmark index per observation
    obs_uv:     (O, 2)  pixel measurements
    obs_valid:  (O,)    validity mask
    fixed_poses:(M,)    True = keep this pose fixed (gauge)
    """

    poses: jax.Array
    intrinsics: jax.Array
    points: jax.Array
    obs_pose: jax.Array
    obs_point: jax.Array
    obs_uv: jax.Array
    obs_valid: jax.Array
    fixed_poses: jax.Array


def _transform(pose6: jax.Array, X: jax.Array) -> jax.Array:
    R = so3exp_map(pose6[..., :3])
    return jnp.einsum("...ij,...j->...i", R, X) + pose6[..., 3:]


def _project(intr: jax.Array, Xc: jax.Array) -> jax.Array:
    z = jnp.maximum(Xc[..., 2], 1e-6)
    u = intr[..., 0] * Xc[..., 0] / z + intr[..., 2]
    v = intr[..., 1] * Xc[..., 1] / z + intr[..., 3]
    return jnp.stack([u, v], axis=-1)


def residuals(problem: BAProblem) -> jax.Array:
    """(O, 2) masked reprojection residuals."""
    pose = problem.poses[problem.obs_pose]
    intr = problem.intrinsics[problem.obs_pose]
    X = problem.points[problem.obs_point]
    Xc = _transform(pose, X)
    r = _project(intr, Xc) - problem.obs_uv
    return r * problem.obs_valid[..., None]


def _obs_jacobians(problem: BAProblem):
    """Per-observation Jacobians: Jp (O, 2, 6) wrt the pose twist
    (left-multiplied increment), Jx (O, 2, 3) wrt the landmark."""
    pose = problem.poses[problem.obs_pose]
    intr = problem.intrinsics[problem.obs_pose]
    X = problem.points[problem.obs_point]
    Xc = _transform(pose, X)
    z = jnp.maximum(Xc[..., 2], 1e-6)
    fx, fy = intr[..., 0], intr[..., 1]
    x, y = Xc[..., 0], Xc[..., 1]

    # d(project)/d(Xc): (O, 2, 3)
    zero = jnp.zeros_like(z)
    Jproj = jnp.stack([
        jnp.stack([fx / z, zero, -fx * x / z**2], -1),
        jnp.stack([zero, fy / z, -fy * y / z**2], -1),
    ], -2)

    # d(Xc)/d(twist) for a left increment: [ -[Xc]x | I ]
    JXc_pose = jnp.concatenate(
        [-skew_symmetric(Xc), jnp.broadcast_to(
            jnp.eye(3), Xc.shape[:-1] + (3, 3))], axis=-1)   # (O, 3, 6)
    Jp = Jproj @ JXc_pose                                    # (O, 2, 6)

    R = so3exp_map(pose[..., :3])
    Jx = Jproj @ R                                           # (O, 2, 3)

    m = problem.obs_valid[..., None, None]
    return Jp * m, Jx * m


def _segment_matvec(values, idx, num, v_per_idx):
    """sum_i values_i @ v[idx_i] grouped back by idx (generic building
    block of the matrix-free Schur product)."""
    contrib = jnp.einsum("oij,oj->oi", values, v_per_idx)
    return contrib, idx


def _obs_z(problem: BAProblem) -> jax.Array:
    """(O,) camera-frame depth of each observed landmark."""
    Xc = _transform(problem.poses[problem.obs_pose],
                    problem.points[problem.obs_point])
    return Xc[..., 2]


def _irls_weights(r: jax.Array, delta: float, robust: str) -> jax.Array:
    """(O,) sqrt-IRLS weights of the robust loss on the 2-norm of each
    residual pair, applied to residuals AND Jacobians so the normal
    equations solve the robustified problem.

    huber: w=1 inside the quadratic zone, delta/|r| outside — monotone
      (safe from any initialization) but outlier influence stays constant
      at delta, leaving an O(delta * outlier_rate) bias.
    cauchy: w = 1/(1+(|r|/delta)^2) — redescending: gross outliers get
      ~zero influence (unbiased given a decent initialization)."""
    n2 = jnp.sum(r * r, axis=-1) + 1e-12
    if robust == "cauchy":
        return jnp.sqrt(1.0 / (1.0 + n2 / (delta * delta)))
    n = jnp.sqrt(n2)
    return jnp.sqrt(jnp.minimum(1.0, delta / n))


@functools.partial(jax.jit,
                   static_argnames=("iters", "cg_iters", "huber_delta",
                                    "z_min", "robust"))
def ba_solve(problem: BAProblem, iters: int = 10, cg_iters: int = 20,
             damping: float = 1e-4,
             huber_delta: Optional[float] = None,
             z_min: Optional[float] = None,
             robust: str = "huber",
             prior_poses: Optional[jax.Array] = None,
             prior_weight: float = 1.0,
             ) -> Tuple[BAProblem, jax.Array]:
    """Levenberg-Marquardt BA with Schur complement + matrix-free CG.

    huber_delta: optional robust loss — IRLS weighting (in pixels) of
    residuals/Jacobians, and the LM accept test uses the robust cost.
    robust: "huber" (monotone, safe) or "cauchy" (redescending: gross
    outliers get ~zero influence — unbiased given a decent init).
    z_min: optional cheirality gate — observations whose landmark sits at
    camera-frame depth < z_min get zero weight THIS iteration (they re-enter
    the moment the optimization brings them back in front); without it a
    point pushed behind a camera hits the projection z-clamp pole and its
    residual (~1e9 px) dominates the quadratic cost.

    prior_poses/prior_weight: optional Gaussian pose prior (VIO-style
    odometry regularization): adds residuals prior_weight * log(P @
    P_prior^-1) per non-fixed pose (Jacobian ~ identity in the
    left-increment), i.e. Hpp += w^2 I and bp -= w^2 rel, and the LM
    accept test scores the prior term too. Use when the front-end's
    keypoint noise is large relative to the baselines (pure reprojection
    then trades trajectory accuracy for image fit — measured on
    mini-MVSEC tracks, tools/slam_mvsec.py); prior_weight is in
    px-per-(rad|m) units: the exchange rate between one unit of pose
    deviation and one pixel of reprojection error.

    Returns (refined problem, per-iteration mean cost (iters+1,): squared-px
    MSE, or mean Huber cost when huber_delta is set).
    """
    M = problem.poses.shape[0]
    L = problem.points.shape[0]

    def obs_weights(problem, r):
        w = problem.obs_valid.astype(r.dtype)
        if z_min is not None:
            w = w * (_obs_z(problem) > z_min)
        if huber_delta is not None:
            w = w * _irls_weights(r, huber_delta, robust)
        return w

    def gn_step(problem, lm_lambda):
        r = residuals(problem)                               # (O, 2)
        Jp, Jx = _obs_jacobians(problem)                     # (O,2,6),(O,2,3)
        w = obs_weights(problem, r)
        r = r * w[:, None]
        Jp = Jp * w[:, None, None]
        Jx = Jx * w[:, None, None]
        op, ox = problem.obs_pose, problem.obs_point

        # block diagonals
        Hpp = jnp.zeros((M, 6, 6)).at[op].add(
            jnp.einsum("oik,oil->okl", Jp, Jp))
        Hll = jnp.zeros((L, 3, 3)).at[ox].add(
            jnp.einsum("oik,oil->okl", Jx, Jx))
        bp = jnp.zeros((M, 6)).at[op].add(
            -jnp.einsum("oik,oi->ok", Jp, r))
        bl = jnp.zeros((L, 3)).at[ox].add(
            -jnp.einsum("oik,oi->ok", Jx, r))

        eye6 = jnp.eye(6)
        eye3 = jnp.eye(3)
        if prior_poses is not None:
            rel = _pose_compose(problem.poses, _pose_inv(prior_poses))
            Hpp = Hpp + (prior_weight ** 2) * eye6
            bp = bp - (prior_weight ** 2) * rel
        Hpp_d = Hpp + lm_lambda * eye6
        Hll_d = Hll + lm_lambda * eye3
        Hll_inv = jnp.linalg.inv(Hll_d)                      # (L, 3, 3)

        # gauge: fixed poses get identity rows (zero update)
        fixed = problem.fixed_poses[:, None, None]
        Hpp_d = jnp.where(fixed, eye6, Hpp_d)
        bp = bp * (~problem.fixed_poses[:, None])

        # reduced rhs: b~ = bp - W Hll^-1 bl, with W = sum Jp^T Jx per obs
        def W_apply(y_l):
            """x_m = sum_obs Jp^T Jx y[landmark]  (O-parallel)."""
            contrib = jnp.einsum("oik,oil,ol->ok", Jp, Jx, y_l[ox])
            return jnp.zeros((M, 6)).at[op].add(contrib)

        def Wt_apply(x_m):
            contrib = jnp.einsum("oik,oil,ok->ol", Jp, Jx, x_m[op])
            return jnp.zeros((L, 3)).at[ox].add(contrib)

        b_red = bp - W_apply(jnp.einsum("lij,lj->li", Hll_inv, bl))
        b_red = b_red * (~problem.fixed_poses[:, None])

        def S_apply(x_m):
            """S x = (Hpp + lam) x - W Hll^-1 W^T x, matrix-free."""
            x_m = x_m * (~problem.fixed_poses[:, None])
            h = jnp.einsum("mij,mj->mi", Hpp_d, x_m)
            wtx = Wt_apply(x_m)
            h = h - W_apply(jnp.einsum("lij,lj->li", Hll_inv, wtx))
            return h * (~problem.fixed_poses[:, None]) + \
                x_m * problem.fixed_poses[:, None]

        # Jacobi-preconditioned CG on the reduced camera system
        diag = jnp.diagonal(Hpp_d, axis1=-2, axis2=-1)
        precond = 1.0 / jnp.maximum(diag, 1e-8)

        def cg_body(state, _):
            x, rr, p, rz = state
            Sp = S_apply(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-12)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = rr * precond
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros((M, 6))
        r0 = b_red
        z0 = r0 * precond
        (dp, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, jnp.sum(r0 * z0)), None, length=cg_iters)

        # back-substitute landmarks: dl = Hll^-1 (bl - W^T dp)
        dl = jnp.einsum("lij,lj->li", Hll_inv, bl - Wt_apply(dp))

        # left-multiplied pose update: T_new = exp(dp) * T
        w_new = problem.poses[:, :3]
        R_old = so3exp_map(w_new)
        R_inc = so3exp_map(dp[:, :3])
        R_new = R_inc @ R_old
        t_new = jnp.einsum("mij,mj->mi", R_inc, problem.poses[:, 3:]) \
            + dp[:, 3:]
        # rotation back to twist via log map
        w_out = _so3log(R_new)
        new_poses = jnp.concatenate([w_out, t_new], axis=-1)
        new_poses = jnp.where(problem.fixed_poses[:, None], problem.poses,
                              new_poses)
        new_points = problem.points + dl
        return problem._replace(poses=new_poses, points=new_points)

    def mse(problem):
        r = residuals(problem)
        gate = problem.obs_valid.astype(r.dtype)
        if z_min is not None:
            gate = gate * (_obs_z(problem) > z_min)
        n = jnp.maximum(jnp.sum(gate), 1)
        def with_prior(cost):
            if prior_poses is not None:
                rel = _pose_compose(problem.poses,
                                    _pose_inv(prior_poses))
                rel = rel * (~problem.fixed_poses[:, None])
                cost = cost + (prior_weight ** 2) * jnp.sum(rel ** 2) / n
            return cost

        if huber_delta is None:
            return with_prior(jnp.sum(gate[:, None] * r**2) / n)
        # Huber cost (matches the IRLS weighting; the accept test must
        # score candidates with the cost actually being minimized)
        d = huber_delta
        n2 = jnp.sum(r * r, axis=-1) + 1e-12
        if robust == "cauchy":
            rho = 0.5 * d * d * jnp.log1p(n2 / (d * d))
        else:
            nr = jnp.sqrt(n2)
            rho = jnp.where(nr <= d, 0.5 * nr**2, d * (nr - 0.5 * d))
        cost = jnp.sum(gate * rho) / n
        if prior_poses is not None:
            rel = _pose_compose(problem.poses, _pose_inv(prior_poses))
            rel = rel * (~problem.fixed_poses[:, None])
            cost = cost + (prior_weight ** 2) * jnp.sum(rel ** 2) / n
        return cost

    def lm_body(carry, _):
        prob, lam, err = carry
        cand = gn_step(prob, lam)
        cand_err = mse(cand)
        # a candidate that blew up (point behind a camera -> z-clamp pole
        # -> inf/NaN cost) is simply rejected like any uphill step; the
        # error carry must use where(), not minimum() — IEEE minimum
        # propagates NaN and would poison every later iteration
        accept = (cand_err < err) & jnp.isfinite(cand_err)
        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), a, b), cand, prob)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        err = jnp.where(accept, cand_err, err)
        return (prob, lam, err), err

    err0 = mse(problem)
    (out, _, _), errs = jax.lax.scan(
        lm_body, (problem, jnp.asarray(damping), err0), None, length=iters)
    return out, jnp.concatenate([err0[None], errs])


def _so3log(R: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Gradient-safe at the identity: theta = atan2(|axis|, trace-1) (note
    |axis| = 2 sin(theta)), with an eps-regularized norm — arccos-based
    formulations have unbounded gradients as trace -> 3."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    axis = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                      R[..., 0, 2] - R[..., 2, 0],
                      R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    norm = jnp.sqrt(jnp.sum(axis**2, axis=-1) + eps)
    theta = jnp.arctan2(norm, trace - 1.0)
    small = norm < 1e-6
    safe_norm = jnp.where(small, 1.0, norm)
    scale = jnp.where(small, 0.5, theta / safe_norm)
    return axis * scale[..., None]


# ---------------------------------------------------------------------------
# Pose-graph optimization
# ---------------------------------------------------------------------------


class PoseGraph(NamedTuple):
    """poses: (M, 6) twists world->camera; edges (i, j) with measured
    relative transforms T_i_to_j (as twists) and scalar weights."""

    poses: jax.Array
    edge_i: jax.Array
    edge_j: jax.Array
    edge_rel: jax.Array   # (E, 6) measured twist of T_j * T_i^-1
    edge_weight: jax.Array
    fixed: jax.Array      # (M,) gauge


def _pose_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    Ra, Rb = so3exp_map(a[..., :3]), so3exp_map(b[..., :3])
    R = Ra @ Rb
    t = a[..., 3:] + jnp.einsum("...ij,...j->...i", Ra, b[..., 3:])
    return jnp.concatenate([_so3log(R), t], axis=-1)


def _pose_inv(a: jax.Array) -> jax.Array:
    R = so3exp_map(a[..., :3])
    Rt = jnp.swapaxes(R, -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, a[..., 3:])
    return jnp.concatenate([-a[..., :3], t], axis=-1)


def pose_graph_residuals(g: PoseGraph) -> jax.Array:
    """(E, 6) residual twists log(meas^-1 * T_j * T_i^-1)."""
    Ti = g.poses[g.edge_i]
    Tj = g.poses[g.edge_j]
    rel = _pose_compose(Tj, _pose_inv(Ti))
    r = _pose_compose(_pose_inv(g.edge_rel), rel)
    return r * g.edge_weight[..., None]


@functools.partial(jax.jit, static_argnames=("iters",))
def pose_graph_solve(g: PoseGraph, iters: int = 20,
                     lr: float = 0.5) -> Tuple[PoseGraph, jax.Array]:
    """Gauss-Newton-flavoured pose-graph relaxation via autodiff gradient
    steps on the quadratic edge cost (robust, jit-friendly; the full GN
    normal equations are unnecessary at keyframe-graph sizes)."""

    def cost(poses):
        r = pose_graph_residuals(g._replace(poses=poses))
        return 0.5 * jnp.sum(r**2)

    def body(carry, _):
        poses, prev = carry
        c, grad = jax.value_and_grad(cost)(poses)
        # per-pose Jacobi scaling from edge degrees
        deg = (jnp.zeros(poses.shape[0]).at[g.edge_i].add(g.edge_weight)
               .at[g.edge_j].add(g.edge_weight))
        step = lr * grad / jnp.maximum(deg, 1.0)[:, None]
        poses = jnp.where(g.fixed[:, None], poses, poses - step)
        return (poses, c), c

    (poses, _), costs = jax.lax.scan(body, (g.poses, jnp.inf), None,
                                     length=iters)
    return g._replace(poses=poses), costs
