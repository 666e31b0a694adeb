"""Bundle adjustment + pose graph tests on synthetic scenes, including the
8-device sharded equivalence check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.parallel.ba import (
    BAProblem, ba_solve, residuals, PoseGraph, pose_graph_solve,
    pose_graph_residuals, _so3log)
from ei_nexus_tpu.geometry.se3 import so3exp_map


def synth_ba_problem(rng, M=6, L=120, noise_pose=0.02, noise_point=0.05,
                     noise_px=0.0):
    """Cameras in a ring looking at a landmark cloud; noisy initialization."""
    intr = np.tile(np.array([300.0, 300.0, 160.0, 120.0]), (M, 1))
    points = rng.uniform([-2, -2, 4], [2, 2, 8], (L, 3))
    poses = []
    for m in range(M):
        w = np.array([0.0, 0.05 * m, 0.0])
        t = np.array([0.3 * m - 0.75, 0.0, 0.0])
        poses.append(np.concatenate([w, -so3_apply(w, t)]))
    poses = np.stack(poses)

    obs_pose, obs_point, obs_uv = [], [], []
    for m in range(M):
        Xc = so3_apply_batch(poses[m, :3], points) + poses[m, 3:]
        uv = np.stack([intr[m, 0] * Xc[:, 0] / Xc[:, 2] + intr[m, 2],
                       intr[m, 1] * Xc[:, 1] / Xc[:, 2] + intr[m, 3]], -1)
        obs_pose.extend([m] * L)
        obs_point.extend(range(L))
        obs_uv.append(uv)
    obs_uv = np.concatenate(obs_uv)
    if noise_px:
        obs_uv = obs_uv + rng.normal(0, noise_px, obs_uv.shape)

    init_poses = poses.copy()
    init_poses[1:] += rng.normal(0, noise_pose, (M - 1, 6))
    init_points = points + rng.normal(0, noise_point, points.shape)
    fixed = np.zeros(M, bool)
    fixed[0] = True

    return BAProblem(
        poses=jnp.asarray(init_poses, jnp.float32),
        intrinsics=jnp.asarray(intr, jnp.float32),
        points=jnp.asarray(init_points, jnp.float32),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_valid=jnp.ones(len(obs_pose), bool),
        fixed_poses=jnp.asarray(fixed),
    ), poses, points


def so3_apply(w, t):
    return np.asarray(so3exp_map(jnp.asarray(w))) @ t


def so3_apply_batch(w, X):
    return X @ np.asarray(so3exp_map(jnp.asarray(w))).T


class TestBA:
    def test_converges_to_zero_error(self, rng):
        prob, gt_poses, gt_points = synth_ba_problem(rng)
        err0 = float(jnp.mean(residuals(prob) ** 2))
        refined, errs = ba_solve(prob, iters=12, cg_iters=25)
        err1 = float(errs[-1])
        assert err0 > 1.0          # meaningful initial error
        assert err1 < err0 * 1e-3, (err0, err1)

    def test_fixed_pose_untouched(self, rng):
        prob, *_ = synth_ba_problem(rng)
        refined, _ = ba_solve(prob, iters=5)
        np.testing.assert_allclose(np.asarray(refined.poses[0]),
                                   np.asarray(prob.poses[0]), atol=1e-7)

    def test_noisy_measurements_plateau(self, rng):
        prob, *_ = synth_ba_problem(rng, noise_px=0.5)
        refined, errs = ba_solve(prob, iters=10)
        # converges to ~noise level (0.25 px^2 per dim -> ~0.25 mse)
        assert float(errs[-1]) < 1.0
        assert float(errs[-1]) > 0.01

    def test_invalid_observations_ignored(self, rng):
        prob, *_ = synth_ba_problem(rng)
        # corrupt half the measurements but mark them invalid
        bad_uv = prob.obs_uv.at[::2].add(500.0)
        valid = jnp.asarray(np.arange(len(prob.obs_pose)) % 2 == 1)
        prob2 = prob._replace(obs_uv=bad_uv, obs_valid=valid)
        refined, errs = ba_solve(prob2, iters=10)
        assert float(errs[-1]) < 1e-3

    def test_huber_survives_gross_outliers(self, rng):
        """5% of measurements corrupted by +300 px but left VALID: plain
        L2 BA is dragged away from the true geometry; Huber-IRLS
        (huber_delta, ba.py:_irls_weights) recovers the inliers' solution.
        Compared on the TRUE inlier residuals, not the training cost."""
        prob, *_ = synth_ba_problem(rng)
        O = len(np.asarray(prob.obs_pose))
        out_idx = np.arange(O) % 20 == 0
        bad_uv = prob.obs_uv.at[np.nonzero(out_idx)[0]].add(300.0)
        prob2 = prob._replace(obs_uv=bad_uv)
        ref_l2, _ = ba_solve(prob2, iters=12, cg_iters=25)
        ref_hu, _ = ba_solve(prob2, iters=12, cg_iters=25, huber_delta=2.0)
        ref_ca, _ = ba_solve(prob2, iters=12, cg_iters=25, huber_delta=2.0,
                             robust="cauchy")

        def inlier_mse(refined):
            r = np.asarray(residuals(refined._replace(obs_uv=prob.obs_uv)))
            return float((r[~out_idx] ** 2).mean())

        l2, hu, ca = (inlier_mse(m) for m in (ref_l2, ref_hu, ref_ca))
        # measured: l2 1.07, huber 0.90, cauchy 0.027. Monotone Huber
        # keeps constant outlier influence -> O(delta * outlier_rate)
        # bias; redescending Cauchy removes it (gross outliers get ~zero
        # weight); L2 spreads the corruption over the whole solution.
        assert ca < 0.05, (l2, hu, ca)
        assert ca < l2 * 0.05 and hu < l2, (l2, hu, ca)

    def test_cheirality_gate_blocks_clamp_pole(self, rng):
        """A landmark initialized BEHIND a camera hits the projection
        z-clamp pole (residual ~1e9 px) and freezes plain LM (every step
        rejected); z_min gates it out so the rest of the problem still
        optimizes, and the gated solve ends near zero error."""
        prob, *_ = synth_ba_problem(rng)
        pts = prob.points.at[0].set(jnp.asarray([0.0, 0.0, -50.0]))
        prob2 = prob._replace(points=pts)
        _, errs_plain = ba_solve(prob2, iters=8, cg_iters=25)
        refined, errs_gate = ba_solve(prob2, iters=8, cg_iters=25,
                                      z_min=0.01, huber_delta=4.0)
        assert float(errs_plain[-1]) > 1e6      # frozen at the pole
        assert float(errs_gate[-1]) < 1e-2, float(errs_gate[-1])

    def test_sharded_matches_single_device(self, rng):
        """Observation-sharded BA on an 8-device mesh gives the same result
        as single-device (collectives inserted by XLA)."""
        from ei_nexus_tpu.parallel import make_mesh, replicate
        from jax.sharding import NamedSharding, PartitionSpec as P
        prob, *_ = synth_ba_problem(rng, M=4, L=64)
        # pad observations to a multiple of 8
        O = len(np.asarray(prob.obs_pose))
        pad = (-O) % 8
        def padded(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        prob_p = prob._replace(
            obs_pose=padded(prob.obs_pose), obs_point=padded(prob.obs_point),
            obs_uv=padded(prob.obs_uv),
            obs_valid=padded(prob.obs_valid, False))
        single, errs_single = ba_solve(prob_p, iters=4)

        mesh = make_mesh(data=8)
        with jax.set_mesh(mesh):
            obs_sharding = NamedSharding(mesh, P("data"))
            sharded_prob = prob_p._replace(
                obs_pose=jax.device_put(prob_p.obs_pose, obs_sharding),
                obs_point=jax.device_put(prob_p.obs_point, obs_sharding),
                obs_uv=jax.device_put(prob_p.obs_uv, obs_sharding),
                obs_valid=jax.device_put(prob_p.obs_valid, obs_sharding),
                poses=replicate(prob_p.poses, mesh),
                points=replicate(prob_p.points, mesh),
                intrinsics=replicate(prob_p.intrinsics, mesh),
                fixed_poses=replicate(prob_p.fixed_poses, mesh),
            )
            sharded, errs_sharded = ba_solve(sharded_prob, iters=4)
        # float summation order differs across shards: compare the
        # trajectory above the convergence floor, then both must converge
        np.testing.assert_allclose(np.asarray(errs_sharded[:2]),
                                   np.asarray(errs_single[:2]), rtol=0.05)
        assert float(errs_sharded[-1]) < 1e-6
        assert float(errs_single[-1]) < 1e-6


class TestPoseGraph:
    def _ring_graph(self, rng, M=8, noise=0.05):
        # GT poses along a line with small rotations
        gt = np.zeros((M, 6), np.float32)
        gt[:, 4] = np.linspace(0, 1.0, M)   # ty
        gt[:, 1] = np.linspace(0, 0.3, M)   # wy
        edges_i, edges_j, rels = [], [], []
        from ei_nexus_tpu.parallel.ba import _pose_compose, _pose_inv
        for i in range(M - 1):
            rel = np.asarray(_pose_compose(jnp.asarray(gt[i + 1]),
                                           _pose_inv(jnp.asarray(gt[i]))))
            edges_i.append(i)
            edges_j.append(i + 1)
            rels.append(rel)
        # loop closure
        rel = np.asarray(_pose_compose(jnp.asarray(gt[0]),
                                       _pose_inv(jnp.asarray(gt[M - 1]))))
        edges_i.append(M - 1)
        edges_j.append(0)
        rels.append(rel)

        init = gt.copy()
        init[1:] += rng.normal(0, noise, (M - 1, 6)).astype(np.float32)
        fixed = np.zeros(M, bool)
        fixed[0] = True
        return PoseGraph(
            poses=jnp.asarray(init),
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            edge_rel=jnp.asarray(np.stack(rels), jnp.float32),
            edge_weight=jnp.ones(len(edges_i), jnp.float32),
            fixed=jnp.asarray(fixed),
        ), gt

    def test_reduces_residuals(self, rng):
        g, gt = self._ring_graph(rng)
        r0 = float(jnp.sum(pose_graph_residuals(g) ** 2))
        solved, costs = pose_graph_solve(g, iters=100)
        r1 = float(jnp.sum(pose_graph_residuals(solved) ** 2))
        assert r1 < r0 * 0.05, (r0, r1)

    def test_gauge_fixed(self, rng):
        g, _ = self._ring_graph(rng)
        solved, _ = pose_graph_solve(g, iters=10)
        np.testing.assert_allclose(np.asarray(solved.poses[0]),
                                   np.asarray(g.poses[0]), atol=1e-8)


class TestSO3Log:
    def test_roundtrip(self, rng):
        w = rng.normal(0, 0.8, (16, 3)).astype(np.float32)
        R = so3exp_map(jnp.asarray(w))
        w2 = np.asarray(_so3log(R))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_identity(self):
        w = np.asarray(_so3log(jnp.eye(3)))
        np.testing.assert_allclose(w, 0.0, atol=1e-7)


class TestSLAMAssembly:
    def test_tracks_and_refinement(self, rng):
        """Synthetic 4-keyframe scene: noisy poses + exact matches ->
        track chaining -> triangulation -> BA recovers the structure."""
        from ei_nexus_tpu.parallel.slam import (Keyframe, chain_tracks,
                                                refine_map)
        K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        M, L = 4, 60
        X = rng.uniform([-1.5, -1, 4], [1.5, 1, 7], (L, 3))
        kfs, all_uv = [], []
        for m in range(M):
            t = np.array([0.25 * m, 0.0, 0.0])
            pose = np.eye(4)
            pose[:3, 3] = -t  # world->camera of a camera at +t
            Xc = X - t
            uv = (K @ Xc.T).T
            uv = uv[:, :2] / uv[:, 2:]
            kps = np.concatenate(
                [uv[:, ::-1], np.ones((L, 1))], 1).astype(np.float32)  # yx
            noisy = pose.copy()
            if m > 0:
                noisy[:3, 3] += rng.normal(0, 0.02, 3)
            kfs.append(Keyframe(keypoints=kps, valid=np.ones(L, bool),
                                pose=noisy, K=K))
            all_uv.append(uv)
        # exact identity matches between consecutive frames
        matches01 = [np.arange(L) for _ in range(M - 1)]

        tracks = chain_tracks(matches01, L)
        assert len(tracks) == L
        assert all(len(t) == M for t in tracks)

        refined, errs = refine_map(kfs, matches01, iters=8)
        assert refined is not None
        assert errs[0] > 0.3         # noisy init has visible reprojection
        assert errs[-1] < 1e-2       # BA converges
        # refined structure matches GT up to the fixed-gauge frame
        np.testing.assert_allclose(np.asarray(refined.points), X, atol=0.05)

    def test_partial_matches(self, rng):
        from ei_nexus_tpu.parallel.slam import chain_tracks
        m01 = np.array([1, -1, 0])
        m12 = np.array([2, 0, -1])
        tracks = chain_tracks([m01, m12], 3)
        # kp0:0 -> kp1:1 -> kp2:0 ; kp0:2 -> kp1:0 -> kp2:2
        lens = sorted(len(t) for t in tracks)
        assert lens == [3, 3]
