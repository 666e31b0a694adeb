"""Metrics tests: AUC vs manual integration, repeatability/MMA on analytic
homographies, and the RPE estimators — OpenCV backend on a synthetic scene
plus agreement of the batched JAX RANSAC with the OpenCV result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.metrics import (
    compute_auc, Repeatability, ValidDescriptorsDistance, MatchingRatio,
    MeanMatchingAccuracy, HomographyEstimation, RelativePoseEstimation,
)
from ei_nexus_tpu.metrics.ransac import estimate_pose_jax, estimate_pose_batch


class TestAUC:
    def test_zero_errors_full_auc(self):
        auc = compute_auc([0.0] * 10, [5])
        assert auc["5"] == pytest.approx(1.0, abs=1e-6)

    def test_all_above_threshold(self):
        auc = compute_auc([100.0] * 10, [5])
        assert auc["5"] == pytest.approx(0.0, abs=1e-6)

    def test_half(self):
        # half the errors at 0, half at inf: recall plateaus at 0.5
        auc = compute_auc([0.0] * 5 + [1e9] * 5, [10])
        assert auc["10"] == pytest.approx(0.5, abs=0.01)

    def test_ignores_nonfinite(self):
        auc1 = compute_auc([1.0, np.inf, np.nan, 1.0], [5])
        auc2 = compute_auc([1.0, 1.0], [5])
        assert auc1["5"] == pytest.approx(auc2["5"])


class TestRepeatability:
    def test_identity_perfect(self, rng):
        pts = rng.uniform(10, 90, (20, 2)).astype(np.float32)
        m = Repeatability("rep", distance_thresh=1, ordering="xy")
        out = m.update_one(pts, pts, (100, 100), (100, 100), np.eye(3))
        assert out["rep"] == pytest.approx(1.0)

    def test_translation(self, rng):
        pts = rng.uniform(20, 80, (20, 2)).astype(np.float32)
        H = np.eye(3)
        H[0, 2] = 5.0  # x shift
        warped = pts + np.array([5.0, 0])
        m = Repeatability("rep", distance_thresh=1, ordering="xy")
        out = m.update_one(pts, warped, (100, 100), (100, 100), H)
        assert out["rep"] == pytest.approx(1.0)

    def test_disjoint_zero(self, rng):
        p1 = rng.uniform(0, 10, (5, 2)).astype(np.float32)
        p2 = rng.uniform(80, 90, (5, 2)).astype(np.float32)
        m = Repeatability("rep", distance_thresh=1, ordering="xy")
        out = m.update_one(p1, p2, (100, 100), (100, 100), np.eye(3))
        assert out["rep"] == pytest.approx(0.0)


class TestVVD:
    def test_identical_descriptors(self, rng):
        pts = rng.uniform(10, 90, (10, 2)).astype(np.float32)
        desc = rng.normal(size=(10, 16)).astype(np.float32)
        m = ValidDescriptorsDistance("vvd", [1, 3], ordering="xy")
        out = m.update_one(pts, pts, desc, desc, (100, 100), (100, 100),
                           np.eye(3))
        assert out["vvd_Repeatability@1"] == pytest.approx(1.0)
        assert out["vvd_ValidDistance@1"] == pytest.approx(0.0, abs=1e-5)
        assert out["vvd_Angle@1"] == pytest.approx(0.0, abs=0.1)


class TestMatchingRatioMMA:
    def test_ratio(self):
        m = MatchingRatio("mr")
        out = m.update_one(np.zeros((5, 2)), np.zeros((5, 2)),
                           np.zeros((10, 2)), np.zeros((20, 2)))
        assert out["mr"] == pytest.approx(0.5, rel=1e-5)

    def test_mma_identity(self, rng):
        pts = rng.uniform(0, 100, (30, 2)).astype(np.float32)
        m = MeanMatchingAccuracy("mma", threshold=3, ordering="xy")
        out = m.update_one(pts, pts, np.eye(3))
        assert out["mma"] == pytest.approx(1.0)

    def test_mma_outliers(self, rng):
        pts = rng.uniform(0, 100, (10, 2)).astype(np.float32)
        bad = pts.copy()
        bad[:5] += 50  # 5 bad matches
        m = MeanMatchingAccuracy("mma", threshold=3, ordering="xy")
        out = m.update_one(pts, bad, np.eye(3))
        assert out["mma"] == pytest.approx(0.5)

    def test_mma_yx_ordering(self, rng):
        pts_yx = rng.uniform(0, 100, (10, 2)).astype(np.float32)
        H = np.eye(3)
        H[0, 2] = 7.0  # shift x
        warped_yx = pts_yx + np.array([0.0, 7.0])  # yx: x is col 1
        m = MeanMatchingAccuracy("mma", threshold=1, ordering="yx")
        out = m.update_one(pts_yx, warped_yx, H)
        assert out["mma"] == pytest.approx(1.0)


class TestHomographyEstimation:
    def test_recovers_known_homography(self, rng):
        H_true = np.array([[1.05, 0.02, 5.0], [-0.01, 0.98, -3.0],
                           [1e-5, -2e-5, 1.0]])
        pts = rng.uniform(10, 300, (100, 2))
        w = np.concatenate([pts, np.ones((100, 1))], 1) @ H_true.T
        w = w[:, :2] / w[:, 2:]
        m = HomographyEstimation("he", [3, 5, 10], ordering="xy")
        out = m.update_one((240, 320), pts.astype(np.float32),
                           w.astype(np.float32), H_true)
        assert out["he_errors"] < 1.0
        assert out["he@3_ratio"] == 1.0

    def test_too_few_points(self):
        m = HomographyEstimation("he", [3], ordering="xy")
        out = m.update_one((100, 100), np.zeros((2, 2)), np.zeros((2, 2)),
                           np.eye(3))
        assert out["he_errors"] == np.inf


def synthetic_pose_scene(rng, n=200, noise=0.0, outlier_frac=0.0):
    """Two views of a random 3D point cloud under a known relative pose."""
    K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]])
    aa = np.array([0.03, -0.05, 0.02])
    t = np.array([0.4, -0.1, 0.15])
    t /= np.linalg.norm(t)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec(aa).as_matrix()
    p3d = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (n, 3))
    x0 = (K @ p3d.T).T
    x0 = x0[:, :2] / x0[:, 2:]
    p3d_1 = p3d @ R.T + t
    x1 = (K @ p3d_1.T).T
    x1 = x1[:, :2] / x1[:, 2:]
    if noise:
        x0 = x0 + rng.normal(0, noise, x0.shape)
        x1 = x1 + rng.normal(0, noise, x1.shape)
    if outlier_frac:
        n_out = int(n * outlier_frac)
        x1[:n_out] = rng.uniform([0, 0], [320, 240], (n_out, 2))
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return x0, x1, K, T, (R, t)


class TestRPE:
    def test_opencv_backend_exact_scene(self, rng):
        x0, x1, K, T, (R, t) = synthetic_pose_scene(rng, noise=0.2,
                                                    outlier_frac=0.2)
        m = RelativePoseEstimation("rpe", [5, 10, 20], ordering="xy",
                                   backend="opencv")
        out = m.update_one(x0.astype(np.float32), x1.astype(np.float32),
                           K, K, T)
        assert out["rpe_R_errs"] < 1.0
        assert out["rpe_t_errs"] < 2.0
        assert out["rpe@5_ratio"] == 1.0
        assert out["rpe_inliers"] > 0.5

    def test_jax_backend_matches_opencv(self, rng):
        x0, x1, K, T, _ = synthetic_pose_scene(rng, noise=0.3,
                                               outlier_frac=0.3)
        mj = RelativePoseEstimation("rpe", [5, 10, 20], ordering="xy",
                                    backend="jax")
        out = mj.update_one(x0.astype(np.float32), x1.astype(np.float32),
                            K, K, T)
        assert out["rpe_R_errs"] < 1.5
        assert out["rpe_t_errs"] < 3.0
        assert out["rpe@5_ratio"] == 1.0

    def test_update_batch_and_auc(self, rng):
        m = RelativePoseEstimation("rpe", [5, 10, 20], ordering="xy")
        mk1, mk2, K0, K1, T = [], [], [], [], []
        for _ in range(3):
            x0, x1, K, Tm, _ = synthetic_pose_scene(rng, n=100, noise=0.2)
            mk1.append(x0.astype(np.float32))
            mk2.append(x1.astype(np.float32))
            K0.append(K)
            K1.append(K)
            T.append(Tm)
        out = m.update_batch(mk1, mk2, K0, K1, T)
        assert out["rpe@5_auc"] > 0.25  # ~3 deg errors on 100 noisy points
        assert out["rpe@20_auc"] > 0.7
        assert out["rpe_pose_errs"] < 5.0

    def test_too_few_matches(self):
        m = RelativePoseEstimation("rpe", [5], ordering="xy")
        out = m.update_one(np.zeros((3, 2), np.float32),
                           np.zeros((3, 2), np.float32),
                           np.eye(3), np.eye(3), np.eye(4))
        assert out["rpe_pose_errs"] == np.inf

    def test_batched_jax_pose(self, rng):
        """estimate_pose_batch over 4 pairs in one program."""
        B, N = 4, 128
        p0s, p1s, Rs, ts = [], [], [], []
        for _ in range(B):
            x0, x1, K, T, (R, t) = synthetic_pose_scene(rng, n=N, noise=0.1)
            p0s.append((x0 - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]])
            p1s.append((x1 - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]])
            Rs.append(R)
            ts.append(t)
        p0 = jnp.asarray(np.stack(p0s), jnp.float32)
        p1 = jnp.asarray(np.stack(p1s), jnp.float32)
        mask = jnp.ones((B, N), bool)
        thr = jnp.full((B,), 2.0 / 320.0, jnp.float32)
        R, t, inl, n = estimate_pose_batch(p0, p1, mask, thr,
                                           jax.random.PRNGKey(0))
        for b in range(B):
            cos = np.clip((np.trace(np.asarray(R[b]).T @ Rs[b]) - 1) / 2,
                          -1, 1)
            r_err = np.degrees(np.arccos(cos))
            dt = np.abs(np.dot(np.asarray(t[b]), ts[b]))
            t_err = np.degrees(np.arccos(np.clip(dt, -1, 1)))
            assert r_err < 2.0, (b, r_err)  # 0.1px noise, 128-sample 5pt
            assert t_err < 3.0, (b, t_err)


class TestRPEBatchDevice:
    """update_batch_device: fixed-K slot format, one device call per batch."""

    def test_matches_slot_format_vs_update_one(self, rng):
        B, K = 3, 256
        positions0 = np.zeros((B, K, 3), np.float32)
        positions1 = np.zeros((B, K, 3), np.float32)
        matches0 = np.full((B, K), -1, np.int32)
        Ks, Ts = [], []
        n_per = [180, 140, 100]
        for b in range(B):
            n = n_per[b]
            x0, x1, Km, Tm, _ = synthetic_pose_scene(rng, n=n, noise=0.2,
                                                     outlier_frac=0.1)
            # yx ordering with a prob column; scatter matches into shuffled
            # slots of view 1 to exercise the take_along_axis gather
            perm = rng.permutation(K)[:n]
            positions0[b, :n, :2] = x0[:, ::-1]
            positions1[b, perm, :2] = x1[:, ::-1]
            matches0[b, :n] = perm
            Ks.append(Km)
            Ts.append(Tm)
        m = RelativePoseEstimation("rpe", [5, 10, 20], ordering="yx",
                                   backend="jax")
        outs = m.update_batch_device(positions0, positions1, matches0,
                                     np.stack(Ks), np.stack(Ks),
                                     np.stack(Ts))
        assert len(outs) == B
        for b, out in enumerate(outs):
            assert out["rpe_R_errs"] < 2.5, (b, out)
            assert out["rpe_t_errs"] < 4.0, (b, out)
            assert out["rpe@5_ratio"] == 1.0
        assert len(m.error_list) == B

    def test_unmatchable_pair_gives_inf(self, rng):
        B, K = 2, 64
        positions0 = np.zeros((B, K, 3), np.float32)
        positions1 = np.zeros((B, K, 3), np.float32)
        matches0 = np.full((B, K), -1, np.int32)
        x0, x1, Km, Tm, _ = synthetic_pose_scene(rng, n=50, noise=0.2)
        positions0[0, :50, :2] = x0[:, ::-1]
        positions1[0, :50, :2] = x1[:, ::-1]
        matches0[0, :50] = np.arange(50)
        # pair 1: only 4 matches (< the 5pt minimal set, like cv2's
        # 5-point gate) -> None -> inf errors
        positions0[1, :4, :2] = x0[:4, ::-1]
        positions1[1, :4, :2] = x1[:4, ::-1]
        matches0[1, :4] = np.arange(4)
        m = RelativePoseEstimation("rpe", [5], ordering="yx", backend="jax")
        outs = m.update_batch_device(positions0, positions1, matches0,
                                     np.stack([Km, Km]), np.stack([Km, Km]),
                                     np.stack([Tm, Tm]))
        assert outs[0]["rpe_pose_errs"] < 5.0
        assert outs[1]["rpe_pose_errs"] == np.inf
