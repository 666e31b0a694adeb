"""Tests for the parity/auxiliary modules: matcher metrics, triangulation,
homographic sampling, pointnet blocks, rectification, val-pair generation,
visualization, image IO, profiling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.metrics.matching import matcher_metrics
from ei_nexus_tpu.geometry.triangulation import (triangulate_linear,
                                                 triangulate_tracks)
from ei_nexus_tpu.geometry import Pose, Camera
from ei_nexus_tpu.geometry.epipolar import generalized_epi_dist, T_to_E
from ei_nexus_tpu.ops.homographic import (
    create_meshgrid, perspective_transform_from_points, transform_points,
    extract_crop, extract_crops_batched)
from ei_nexus_tpu.models.pointnet import (
    farthest_point_sample, ball_query, PointNetSAModule, PointNetSAModuleMSG,
    PointNetFPModule)
from ei_nexus_tpu.data.rectify import (rectify_events,
                                       undistort_events_pinhole)
from ei_nexus_tpu.data.val_pairs import (generate_candidate_pairs,
                                         pair_overlap_ratio,
                                         sample_final_indices)
from ei_nexus_tpu.utils.visualize import (accumulation_to_u8, draw_keypoints,
                                          draw_matches, depth_to_color)
from ei_nexus_tpu.utils.image_io import image_to_array, resize_image
from ei_nexus_tpu.utils.profiling import StepTimer


class TestMatcherMetrics:
    def test_perfect_prediction(self):
        gt = np.array([[2, -1, 0, -2]])
        pred = np.array([[2, -1, 0, 5]])
        sc = np.array([[0.9, 0.0, 0.8, 0.1]])
        out = matcher_metrics(pred, gt, sc)
        assert out["match_recall"][0] == pytest.approx(1.0)   # both gt>-1 hit
        assert out["accuracy"][0] == pytest.approx(1.0)       # ignores -2
        assert out["match_precision"][0] == pytest.approx(1.0)

    def test_wrong_prediction(self):
        gt = np.array([[2, 1, 0]])
        pred = np.array([[0, -1, 0]])
        sc = np.array([[0.9, 0.0, 0.8]])
        out = matcher_metrics(pred, gt, sc)
        assert out["match_recall"][0] == pytest.approx(1 / 3)
        assert out["match_precision"][0] == pytest.approx(1 / 2)


class TestTriangulation:
    def test_exact_recovery(self, rng):
        K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        V = 4
        cams = Camera.from_calibration_matrix(
            np.tile(K, (V, 1, 1)), size=(320, 240))
        Rs = np.tile(np.eye(3), (V, 1, 1))
        ts = np.stack([[0.3 * v, 0, 0] for v in range(V)]).astype(np.float64)
        poses = Pose.from_Rt(Rs, ts)
        X = rng.uniform([-1, -1, 4], [1, 1, 8], (10, 3))
        kpts = []
        for v in range(V):
            Xc = X + ts[v]
            uv = (K @ Xc.T).T
            kpts.append(uv[:, :2] / uv[:, 2:])
        kpts = np.stack(kpts, axis=1)  # (T, V, 2)
        got = np.asarray(triangulate_tracks(
            jnp.asarray(kpts, jnp.float32), poses, cams))
        np.testing.assert_allclose(got, X, atol=1e-2)

    def test_masked_views(self, rng):
        K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        V = 4
        cams = Camera.from_calibration_matrix(
            np.tile(K, (V, 1, 1)), size=(320, 240))
        ts = np.stack([[0.3 * v, 0, 0] for v in range(V)])
        poses = Pose.from_Rt(np.tile(np.eye(3), (V, 1, 1)), ts)
        X = np.array([0.5, -0.3, 5.0])
        kpts = []
        for v in range(V):
            uv = K @ (X + ts[v])
            kpts.append(uv[:2] / uv[2])
        kpts = np.stack(kpts).astype(np.float32)
        kpts[3] = [9999, 9999]  # corrupted view, masked out
        mask = jnp.asarray([True, True, True, False])
        got = np.asarray(triangulate_linear(jnp.asarray(kpts), poses, cams,
                                            mask))
        np.testing.assert_allclose(got, X, atol=1e-2)


class TestGeneralizedEpiDist:
    def test_zero_on_true_matches(self, rng):
        K = np.array([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]])
        cam = Camera.from_calibration_matrix(K, size=(320, 240))
        T = Pose.from_aa(np.array([0.02, 0.01, 0.0]),
                         np.array([0.3, 0.0, 0.1]))
        X = rng.uniform([-1, -1, 4], [1, 1, 8], (20, 3))
        x0 = (K @ X.T).T
        x0 = x0[:, :2] / x0[:, 2:]
        X1 = np.asarray(T.transform(jnp.asarray(X)))
        x1 = (K @ X1.T).T
        x1 = x1[:, :2] / x1[:, 2:]
        d = generalized_epi_dist(jnp.asarray(x0, jnp.float32),
                                 jnp.asarray(x1, jnp.float32), cam, cam, T,
                                 all_pairs=False, essential=True)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)


class TestHomographicSampler:
    def test_dlt_identity(self):
        src = jnp.asarray([[0.0, 0], [0, 1], [1, 1], [1, 0]])
        H = perspective_transform_from_points(src, src)
        np.testing.assert_allclose(np.asarray(H), np.eye(3), atol=1e-5)

    def test_dlt_translation(self):
        src = jnp.asarray([[0.0, 0], [0, 1], [1, 1], [1, 0]])
        dst = src + jnp.asarray([2.0, 3.0])
        H = perspective_transform_from_points(src, dst)
        got = transform_points(H, jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(got), [[2.5, 3.5]], atol=1e-5)

    def test_extract_crop_identity(self, rng):
        img = jnp.asarray(rng.normal(size=(16, 20, 3)).astype(np.float32))
        crop = extract_crop(img, jnp.eye(3), (16, 20))
        np.testing.assert_allclose(np.asarray(crop), np.asarray(img),
                                   atol=1e-4)

    def test_extract_crop_shift(self, rng):
        img = jnp.asarray(rng.normal(size=(16, 20, 1)).astype(np.float32))
        H = jnp.asarray([[1.0, 0, -2], [0, 1.0, 0], [0, 0, 1]])  # src->crop
        crop = extract_crop(img, H, (16, 20))
        # crop(x) = img(x+2)
        np.testing.assert_allclose(np.asarray(crop[:, :18]),
                                   np.asarray(img[:, 2:]), atol=1e-4)

    def test_batched(self, rng):
        imgs = jnp.asarray(rng.normal(size=(3, 8, 8, 1)).astype(np.float32))
        Hs = jnp.broadcast_to(jnp.eye(3), (3, 3, 3))
        crops = extract_crops_batched(imgs, Hs, (8, 8))
        np.testing.assert_allclose(np.asarray(crops), np.asarray(imgs),
                                   atol=1e-4)

    def test_meshgrid(self):
        g = np.asarray(create_meshgrid(4, 2, normalized=False))
        assert g.shape == (2, 4, 2)
        np.testing.assert_allclose(g[0, 0], [0.5, 0.5])
        np.testing.assert_allclose(g[1, 3], [3.5, 1.5])


class TestPointNet:
    def test_fps_spreads(self, rng):
        pts = np.concatenate([np.zeros((10, 3)),
                              np.ones((10, 3)) * 10]).astype(np.float32)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 2))
        # the two samples must come from different clusters
        assert (idx[0] < 10) != (idx[1] < 10)

    def test_ball_query_radius(self, rng):
        pts = jnp.asarray(rng.uniform(0, 10, (64, 3)).astype(np.float32))
        centers = pts[:4]
        idx, valid = ball_query(pts, centers, radius=2.0, n_neighbors=8)
        d = np.linalg.norm(np.asarray(pts)[np.asarray(idx)]
                           - np.asarray(centers)[:, None], axis=-1)
        assert (d[np.asarray(valid)] <= 2.0 + 1e-5).all()

    def test_sa_module_shapes(self, rng):
        pts = jnp.asarray(rng.uniform(0, 1, (128, 3)).astype(np.float32))
        m = PointNetSAModule(n_centers=32, radius=0.3, n_neighbors=16,
                             mlp=(32, 64))
        vs = m.init(jax.random.PRNGKey(0), pts)
        centers, feats = m.apply(vs, pts)
        assert centers.shape == (32, 3) and feats.shape == (32, 64)
        assert np.isfinite(np.asarray(feats)).all()

    def test_msg_and_fp(self, rng):
        pts = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
        msg = PointNetSAModuleMSG(n_centers=16, radii=(0.2, 0.4),
                                  n_neighbors=(8, 16), mlps=((16,), (16,)))
        vs = msg.init(jax.random.PRNGKey(0), pts)
        centers, feats = msg.apply(vs, pts)
        assert feats.shape == (16, 32)
        fp = PointNetFPModule(mlp=(24,))
        vs2 = fp.init(jax.random.PRNGKey(1), pts, centers, None, feats)
        up = fp.apply(vs2, pts, centers, None, feats)
        assert up.shape == (64, 24)


class TestRectify:
    def test_event_map_lookup(self):
        H, W = 8, 10
        x_map = np.tile(np.arange(W, dtype=np.float32), (H, 1)) + 1.0
        y_map = np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W))
        ev = np.array([[2.0, 3.0, 0.1, 1.0], [8.9, 5.0, 0.2, 0.0]])
        out = rectify_events(ev, x_map, y_map, (W, H))
        # first event shifts x by +1; second maps to x=10 -> dropped (>= W-1)
        assert len(out) == 1
        np.testing.assert_allclose(out[0, :2], [3.0, 3.0])

    def test_undistort_identity(self, rng):
        K = np.array([[200.0, 0, 120], [0, 200.0, 90], [0, 0, 1]])
        ev = np.concatenate([
            rng.uniform(0, 1, (50, 1)),
            rng.uniform(10, 220, (50, 1)),
            rng.uniform(10, 170, (50, 1)),
            rng.integers(0, 2, (50, 1)).astype(float)], axis=1)
        out = undistort_events_pinhole(ev, K, np.zeros(4), (240, 180))
        np.testing.assert_allclose(out[:, 1:3], ev[:, 1:3], atol=1e-6)


class TestValPairs:
    def test_candidates_within_window(self, rng):
        pairs = generate_candidate_pairs(200, time_window=30, num_pairs=100,
                                         rng=rng)
        assert ((pairs[:, 1] >= pairs[:, 0])
                & (pairs[:, 1] <= pairs[:, 0] + 30)).all()

    def test_overlap_ratio_identity(self):
        depth = np.full((60, 80), 3.0, np.float32)
        K = np.array([[60.0, 0, 40], [0, 60.0, 30], [0, 0, 1]])
        r = pair_overlap_ratio(depth, depth, K, np.eye(4), np.eye(4),
                               stride=8)
        assert r == pytest.approx(1.0, abs=0.01)

    def test_sample_final(self, rng):
        idx = np.arange(40).reshape(20, 2)
        out = sample_final_indices(idx, 5, rng)
        assert out.shape == (5, 2)


class TestVisualize:
    def test_accumulation_u8(self):
        acc = np.array([[0.0, 1.0], [2.0, 4.0]])
        u8 = accumulation_to_u8(acc)
        assert u8.dtype == np.uint8 and u8.max() == 255 and u8.min() == 0

    def test_draw_keypoints_and_matches(self, rng):
        img = rng.integers(0, 255, (40, 50), dtype=np.uint8)
        kp = np.array([[10.0, 20.0, 0.9], [5.0, 5.0, 0.5]])
        out = draw_keypoints(img, kp, "yx")
        assert out.shape == (40, 50, 3)
        canvas = draw_matches(img, img, kp, kp, "yx")
        assert canvas.shape == (40, 100, 3)

    def test_depth_colormap(self, rng):
        d = rng.uniform(1, 5, (20, 30))
        d[0, 0] = np.nan
        out = depth_to_color(d)
        assert out.shape == (20, 30, 3)
        assert (out[0, 0] == 0).all()


class TestImageIO:
    def test_array_and_resize(self, rng):
        img = rng.integers(0, 255, (20, 30), dtype=np.uint8)
        arr = image_to_array(img)
        assert arr.shape == (20, 30, 1) and arr.max() <= 1.0
        out, scale = resize_image(img, (10, 15))
        assert out.shape == (10, 15)
        assert scale == (0.5, 0.5)


class TestStepTimer:
    def test_stats(self):
        t = StepTimer()
        for _ in range(3):
            t.tic()
            x = jnp.ones(8) * 2
            t.toc(x)
        s = t.stats()
        assert s["steps_per_s"] > 0
        assert "step_time_p95_s" in s


class TestFlow:
    def test_lazy_evaluation_and_tape(self):
        from ei_nexus_tpu.utils.flow import Flow
        calls = []

        flow = Flow("x")
        flow.define_transition("y", lambda x: calls.append("y") or x * 2, "x")
        flow.define_transition("z", lambda x, y: calls.append("z") or x + y,
                               "x", "y")
        flow.define_transition("unused", lambda x: calls.append("u") or -x,
                               "x")
        assert flow("z", x=3) == 9
        assert calls == ["y", "z"]  # "unused" never ran
        assert flow.get_tape(["z"]) == ["y", "z"]

    def test_multi_output_and_jit(self):
        from ei_nexus_tpu.utils.flow import Flow
        import jax
        flow = Flow("a", "b")
        flow.define_transition("s", lambda a, b: a + b, "a", "b")
        flow.define_transition("p", lambda s, a: s * a, "s", "a")
        y, p = flow(("s", "p"), a=jnp.asarray(2.0), b=jnp.asarray(3.0))
        assert float(y) == 5.0 and float(p) == 10.0
        f = jax.jit(lambda a, b: flow("p", a=a, b=b))
        assert float(f(2.0, 3.0)) == 10.0

    def test_cycle_and_unknown(self):
        from ei_nexus_tpu.utils.flow import Flow
        flow = Flow("x")
        flow.define_transition("a", lambda b: b, "b")
        flow.define_transition("b", lambda a: a, "a")
        with pytest.raises(ValueError):
            flow("a", x=1)
        with pytest.raises(KeyError):
            flow("nope", x=1)

    def test_auto_forward(self):
        from ei_nexus_tpu.utils.flow import Flow, AutoForward
        flow = Flow("x")
        flow.define_transition("y", lambda x: x + 1, "x")
        m = AutoForward(flow, "y")
        assert m.forward_flow(x=4) == 5
