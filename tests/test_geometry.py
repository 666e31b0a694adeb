"""Geometry core unit tests: SE3, Camera, epipolar, depth projection, GT
matches — against analytic cases and brute-force numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.geometry import (
    Pose, Camera, epipolar, depthproj,
    gt_matches_from_pose_depth, gt_matches_from_homography,
    warp_points_homography, sample_homography_corners,
)
from ei_nexus_tpu.geometry.se3 import skew_symmetric, so3exp_map


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


class TestPose:
    def test_compose_inverse(self, rng):
        R1, R2 = random_rotation(rng), random_rotation(rng)
        t1, t2 = rng.normal(size=3), rng.normal(size=3)
        T1 = Pose.from_Rt(R1, t1)
        T2 = Pose.from_Rt(R2, t2)
        T = T1 @ T2
        p = rng.normal(size=(5, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(T.transform(p)),
            np.asarray(T1.transform(T2.transform(p))), rtol=2e-5, atol=2e-5)
        Tinv = T.inv()
        np.testing.assert_allclose(
            np.asarray((T @ Tinv).R), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray((T @ Tinv).t), np.zeros(3), atol=1e-5)

    def test_from_4x4_roundtrip(self, rng):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        T4 = np.eye(4)
        T4[:3, :3], T4[:3, 3] = R, t
        T = Pose.from_4x4mat(T4)
        np.testing.assert_allclose(np.asarray(T.as_4x4mat()), T4, atol=1e-6)

    def test_so3exp(self, rng):
        # 90 deg about z
        w = np.array([0.0, 0.0, np.pi / 2])
        R = np.asarray(so3exp_map(jnp.asarray(w)))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
        np.testing.assert_allclose(R, expected, atol=1e-6)
        # tiny angle -> first order
        w = np.array([1e-9, 0, 0])
        R = np.asarray(so3exp_map(jnp.asarray(w)))
        np.testing.assert_allclose(R, np.eye(3) + np.asarray(
            skew_symmetric(jnp.asarray(w))), atol=1e-12)

    def test_magnitude(self, rng):
        w = np.array([0.0, 0.0, 0.3])
        T = Pose.from_aa(w, np.array([3.0, 4.0, 0.0]))
        dr, dt = T.magnitude()
        assert np.isclose(float(dr), np.degrees(0.3), atol=1e-4)
        assert np.isclose(float(dt), 5.0, atol=1e-5)

    def test_batched_vmap(self, rng):
        Rs = np.stack([random_rotation(rng) for _ in range(4)])
        ts = rng.normal(size=(4, 3))
        T = Pose.from_Rt(Rs, ts)
        p = rng.normal(size=(4, 7, 3)).astype(np.float32)
        out = jax.jit(lambda T, p: T.transform(p))(T, jnp.asarray(p))
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(out[i]), p[i] @ Rs[i].T + ts[i], rtol=1e-4, atol=1e-4)


class TestCamera:
    def _cam(self):
        K = np.array([[200.0, 0, 160], [0, 210.0, 120], [0, 0, 1]])
        return Camera.from_calibration_matrix(K, size=(320, 240)), K

    def test_calibration_roundtrip(self):
        cam, K = self._cam()
        np.testing.assert_allclose(np.asarray(cam.calibration_matrix()), K)

    def test_project_denormalize(self):
        cam, K = self._cam()
        p3d = jnp.asarray([[0.1, -0.2, 2.0], [0.0, 0.0, 1.0]])
        p2d, valid = cam.cam2image(p3d)
        expected = (K @ np.concatenate(
            [np.asarray(p3d).T, ]))[:2] / np.asarray(p3d).T[2]
        np.testing.assert_allclose(np.asarray(p2d), expected.T, rtol=1e-5)
        assert bool(valid[0]) and bool(valid[1])

    def test_behind_camera_invalid(self):
        cam, _ = self._cam()
        p3d = jnp.asarray([[0.0, 0.0, -1.0]])
        _, valid = cam.cam2image(p3d)
        assert not bool(valid[0])

    def test_image2cam_inverse(self):
        cam, _ = self._cam()
        p2d = jnp.asarray([[100.0, 50.0], [160.0, 120.0]])
        rays = cam.image2cam(p2d)
        back, _ = cam.cam2image(rays * 3.0)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p2d), rtol=1e-5)

    def test_in_image(self):
        cam, _ = self._cam()
        p = jnp.asarray([[0.0, 0.0], [319.0, 239.0], [-1.0, 5.0], [320.0, 5.0]])
        v = np.asarray(cam.in_image(p))
        assert list(v) == [True, True, False, False]

    def test_distortion_identity_when_zero(self):
        cam, _ = self._cam()
        pts = jnp.asarray([[0.1, 0.2], [-0.3, 0.05]])
        out, valid = cam.distort(pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-7)
        assert np.all(np.asarray(valid))

    def test_radial_distortion(self):
        cam = Camera.from_params(320, 240, 200, 210, 160, 120,
                                 dist=np.array([0.1, 0.01]))
        pts = np.array([[0.2, -0.1]])
        r2 = (pts**2).sum()
        expected = pts * (1 + 0.1 * r2 + 0.01 * r2**2)
        out, _ = cam.distort(jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_scale_crop(self):
        cam, _ = self._cam()
        cam2 = cam.scale(0.5)
        np.testing.assert_allclose(np.asarray(cam2.f), np.asarray(cam.f) * 0.5)
        cam3 = cam.crop((10.0, 20.0), (100, 80))
        np.testing.assert_allclose(
            np.asarray(cam3.c), np.asarray(cam.c) - np.array([10.0, 20.0]))


class TestEpipolar:
    def _setup(self, rng):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        return Pose.from_Rt(R, t)

    def test_epipolar_constraint(self, rng):
        """x1^T E x0 == 0 for true correspondences."""
        T = self._setup(rng)
        E = epipolar.T_to_E(T)
        p3d = rng.normal(size=(20, 3)) + np.array([0, 0, 5.0])
        x0 = p3d / p3d[:, 2:]
        p3d_1 = np.asarray(T.transform(jnp.asarray(p3d)))
        x1 = p3d_1 / p3d_1[:, 2:]
        res = np.einsum("ni,ij,nj->n", x1, np.asarray(E), x0)
        np.testing.assert_allclose(res, 0.0, atol=1e-6)

    def test_sym_epipolar_distance_zero_on_inliers(self, rng):
        T = self._setup(rng)
        E = epipolar.T_to_E(T)
        p3d = rng.normal(size=(20, 3)) + np.array([0, 0, 5.0])
        x0 = (p3d / p3d[:, 2:])[:, :2]
        p3d_1 = np.asarray(T.transform(jnp.asarray(p3d)))
        x1 = (p3d_1 / p3d_1[:, 2:])[:, :2]
        d = epipolar.sym_epipolar_distance(
            jnp.asarray(x0), jnp.asarray(x1), E, squared=False)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)
        dall = epipolar.sym_epipolar_distance_all(
            jnp.asarray(x0), jnp.asarray(x1), E)
        # diagonal (true pairs) must be ~0
        np.testing.assert_allclose(np.diag(np.asarray(dall)), 0.0, atol=1e-4)

    def test_decompose_essential(self, rng):
        T = self._setup(rng)
        E = epipolar.T_to_E(T)
        R1, R2, t = epipolar.decompose_essential_matrix(E)
        # one of the rotations must match T.R, translation up to sign/scale
        errs = [float(epipolar.angle_error_mat(R, T.R)) for R in (R1, R2)]
        assert min(errs) < 1e-3
        terr = float(epipolar.angle_error_vec(t, T.t))
        assert min(terr, 180 - terr) < 1e-3

    def test_relative_pose_error_zero(self, rng):
        T = self._setup(rng)
        t_err, r_err = epipolar.relative_pose_error(T, T.R, T.t)
        assert float(t_err) < 1e-3 and float(r_err) < 1e-2

    def test_angle_error_vec(self):
        a = jnp.asarray([1.0, 0, 0])
        b = jnp.asarray([0.0, 1.0, 0])
        assert np.isclose(float(epipolar.angle_error_vec(a, b)), 90.0)


class TestDepthSampling:
    def test_sample_center_exact(self):
        depth = jnp.ones((1, 8, 8)) * 2.0
        pts = jnp.asarray([[[3.5, 4.5], [1.0, 1.0]]])
        d, valid = depthproj.sample_depth(pts, depth)
        np.testing.assert_allclose(np.asarray(d), 2.0, rtol=1e-6)
        assert np.all(np.asarray(valid))

    def test_bilinear_interp_values(self):
        depth = np.zeros((1, 4, 4), np.float32)
        depth[0, 1, 1] = 1.0
        depth[0, 1, 2] = 3.0
        # halfway between pixel centers (1.5, 1.5) and (2.5, 1.5): the
        # zero-weight corners in row y=2 are invalid (NaN), which poisons the
        # bilinear value (0*NaN=NaN, same as torch grid_sample) -> nearest
        # fallback picks depth[1, 2] = 3.0
        pts = jnp.asarray([[[2.0, 1.5]]])
        d, valid = depthproj.sample_depth(jnp.asarray(pts), jnp.asarray(depth))
        assert bool(valid[0, 0])
        np.testing.assert_allclose(float(d[0, 0]), 3.0, rtol=1e-5)
        # fully-valid neighborhood: true bilinear mix
        depth2 = np.full((1, 4, 4), 2.0, np.float32)
        depth2[0, 1, 1], depth2[0, 1, 2] = 1.0, 3.0
        d2, _ = depthproj.sample_depth(pts, jnp.asarray(depth2))
        np.testing.assert_allclose(float(d2[0, 0]), 2.0, rtol=1e-5)

    def test_invalid_fallback_nearest(self):
        depth = np.zeros((1, 4, 4), np.float32)
        depth[0, 2, 2] = 5.0  # all neighbors invalid
        pts = jnp.asarray([[[2.6, 2.6]]])  # inside pixel (2,2)
        d, valid = depthproj.sample_depth(jnp.asarray(pts), jnp.asarray(depth))
        assert bool(valid[0, 0])
        np.testing.assert_allclose(float(d[0, 0]), 5.0)

    def test_fully_invalid(self):
        depth = jnp.zeros((1, 4, 4))
        pts = jnp.asarray([[[2.0, 2.0]]])
        d, valid = depthproj.sample_depth(pts, depth)
        assert not bool(valid[0, 0])


class TestProjection:
    def _scene(self, rng, n=50):
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        cam = Camera.from_calibration_matrix(K, size=(160, 120))
        # camera 1 slightly translated
        T01 = Pose.from_aa(np.array([0.0, 0.02, 0.0]), np.array([0.1, 0, 0]))
        # flat plane at depth 2
        depth0 = np.full((1, 120, 160), 2.0, np.float32)
        return cam, T01, depth0

    def test_project_roundtrip(self, rng):
        cam, T01, depth0 = self._scene(rng)
        kp0 = jnp.asarray(
            rng.uniform([20, 20], [140, 100], size=(1, 30, 2)).astype(np.float32))
        d0, valid0 = depthproj.sample_depth(kp0, jnp.asarray(depth0))
        kp01, vis = depthproj.project(
            kp0, d0, None, cam, cam, T01, valid0)
        # project back
        d01 = jnp.ones_like(d0) * 0.0
        kp010, vis2 = depthproj.project(
            kp01, _depth_of(kp01, cam, T01, d0, kp0), None, cam, cam,
            T01.inv(), vis)
        np.testing.assert_allclose(
            np.asarray(kp010)[np.asarray(vis2)],
            np.asarray(kp0)[np.asarray(vis2)], atol=1e-2)
        assert np.asarray(vis2).sum() > 10


def _depth_of(kp1, cam, T01, d0, kp0):
    """Depth of warped points in view 1 given plane scene."""
    p3d0 = cam.image2cam(kp0) * d0[..., None]
    p3d1 = T01.transform(p3d0)
    return p3d1[..., 2]


class TestHomographyWarp:
    def test_identity(self):
        pts = jnp.asarray([[[10.0, 20.0], [5.0, 5.0]]])
        H = jnp.eye(3)
        np.testing.assert_allclose(
            np.asarray(warp_points_homography(pts, H, inverse=False)),
            np.asarray(pts), rtol=2e-5, atol=1e-5)

    def test_translation_and_inverse(self):
        H = jnp.asarray([[1.0, 0, 3], [0, 1.0, -2], [0, 0, 1]])
        pts = jnp.asarray([[[1.0, 1.0]]])
        fwd = warp_points_homography(pts, H, inverse=False)
        np.testing.assert_allclose(np.asarray(fwd), [[[4.0, -1.0]]], atol=1e-4)
        back = warp_points_homography(fwd, H, inverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_sample_homography_corners(self, rng):
        H, full, warped, patch = sample_homography_corners(
            (320, 240), (256, 192), difficulty=0.5, rng=rng)
        assert H.shape == (3, 3)
        # corners of the full image warp to the sampled patch corners
        w2 = np.asarray(warp_points_homography(
            jnp.asarray(full, jnp.float32), jnp.asarray(H, jnp.float32),
            inverse=False))
        np.testing.assert_allclose(w2, warped, atol=1e-3)


class TestGtMatches:
    def test_homography_identity_selfmatch(self, rng):
        kp = rng.uniform(10, 100, size=(1, 16, 2)).astype(np.float32)
        out = gt_matches_from_homography(
            jnp.asarray(kp), jnp.asarray(kp), jnp.eye(3), pos_th=3, neg_th=6)
        np.testing.assert_array_equal(
            np.asarray(out["matches0"])[0], np.arange(16))
        np.testing.assert_array_equal(
            np.asarray(out["matches1"])[0], np.arange(16))
        assert np.asarray(out["assignment"]).sum() == 16

    def test_homography_unmatched(self, rng):
        kp0 = np.array([[[10.0, 10.0], [50.0, 50.0]]], np.float32)
        kp1 = np.array([[[10.0, 10.0], [200.0, 200.0]]], np.float32)
        out = gt_matches_from_homography(
            jnp.asarray(kp0), jnp.asarray(kp1), jnp.eye(3), pos_th=3, neg_th=6)
        m0 = np.asarray(out["matches0"])[0]
        assert m0[0] == 0
        assert m0[1] == -1  # farther than neg_th from every kp1

    def test_pose_depth_identity(self, rng):
        """Identity pose + flat depth: keypoints must match themselves."""
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        cam = Camera.from_calibration_matrix(
            np.tile(K, (1, 1, 1)), size=(160, 120))
        T_I = Pose.identity((1,))
        depth = jnp.full((1, 120, 160), 2.0)
        kp = rng.uniform(20, 100, size=(1, 12, 2)).astype(np.float32)
        out = gt_matches_from_pose_depth(
            jnp.asarray(kp), jnp.asarray(kp), cam, cam, depth, depth,
            T_I, T_I, pos_th=3, neg_th=5, ordering="yx")
        np.testing.assert_array_equal(
            np.asarray(out["matches0"])[0], np.arange(12))
        assert np.asarray(out["assignment"]).sum() == 12

    def test_pose_depth_translation(self, rng):
        """Known translation: projections must shift by f*tx/z."""
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        cam = Camera.from_calibration_matrix(
            np.tile(K, (1, 1, 1)), size=(160, 120))
        T01 = Pose.from_Rt(
            np.eye(3)[None], np.array([[0.2, 0.0, 0.0]]))  # +x shift
        depth = jnp.full((1, 120, 160), 2.0)
        kp0_yx = np.array([[[60.0, 70.0], [40.0, 50.0]]], np.float32)
        # shift in x by f*tx/z = 100*0.2/2 = 10 px
        kp1_yx = kp0_yx + np.array([0.0, 10.0], np.float32)
        out = gt_matches_from_pose_depth(
            jnp.asarray(kp0_yx), jnp.asarray(kp1_yx), cam, cam, depth, depth,
            T01, T01.inv(), pos_th=3, neg_th=5, ordering="yx")
        np.testing.assert_array_equal(
            np.asarray(out["matches0"])[0], np.arange(2))

    def test_mask_forces_ignore(self, rng):
        kp = rng.uniform(10, 100, size=(1, 8, 2)).astype(np.float32)
        mask0 = np.ones((1, 8), bool)
        mask0[0, 3] = False
        out = gt_matches_from_homography(
            jnp.asarray(kp), jnp.asarray(kp), jnp.eye(3),
            mask0=jnp.asarray(mask0))
        m0 = np.asarray(out["matches0"])[0]
        assert m0[3] == -2
        assert np.asarray(out["assignment"])[0, 3].sum() == 0

    def test_jit_compatible(self, rng):
        kp = jnp.asarray(rng.uniform(10, 100, size=(2, 8, 2)).astype(np.float32))
        H = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        f = jax.jit(lambda a, b, H: gt_matches_from_homography(a, b, H))
        out = f(kp, kp, H)
        assert out["matches0"].shape == (2, 8)
