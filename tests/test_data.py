"""Data layer tests on synthetic MVSEC HDF5 / EC directory fixtures that
reproduce the on-disk layouts, plus pipeline sharding/prefetch tests."""

import os

import numpy as np
import pytest

from ei_nexus_tpu.data.interpolator import PoseInterpolator, Rt_to_T, T_to_Rt
from ei_nexus_tpu.data.mvsec import (
    MVSECArchive, MVSECSequence, MVSECPairDataset, relative_pose)
from ei_nexus_tpu.data.ec import ECArchive, ECSequence, ECPairDataset
from ei_nexus_tpu.data.pipeline import DataLoader, collate
from ei_nexus_tpu.data.augment import PairAugmentation, \
    PairAugmentationEvents


# ---------------------------------------------------------------------------
# fixtures: synthetic datasets in the reference on-disk layouts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mvsec_root(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("mvsec")
    rng = np.random.default_rng(0)
    W, H = 346, 260
    n_frames, n_events = 400, 40000
    t0, t1 = 100.0, 120.0

    for seq, scene in [("indoor_flying1", "indoor_flying"),
                       ("indoor_flying4", "indoor_flying")]:
        d = root / scene
        d.mkdir(exist_ok=True)
        image_ts = np.linspace(t0, t1, n_frames)
        depth_ts = image_ts[::2] + 0.001
        ev_t = np.sort(rng.uniform(t0, t1, n_events))
        ev = np.stack([rng.uniform(0, W - 1, n_events),
                       rng.uniform(0, H - 1, n_events), ev_t,
                       rng.integers(0, 2, n_events).astype(float)], 1)
        pose_ts = np.linspace(t0 - 1, t1 + 1, 100)
        poses = np.tile(np.eye(4), (100, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 1, 100)  # translate along x

        with h5py.File(d / f"{seq}_data.hdf5", "w") as f:
            f.create_dataset("davis/left/image_raw_ts", data=image_ts)
            f.create_dataset("davis/left/image_raw",
                             data=rng.integers(0, 255, (n_frames, H, W),
                                               dtype=np.uint8))
        with h5py.File(d / f"{seq}_gt.hdf5", "w") as f:
            depth = rng.uniform(1, 5, (len(depth_ts), H, W)).astype(
                np.float32)
            depth[:, :10] = np.nan  # invalid band
            f.create_dataset("davis/left/depth_image_rect", data=depth)
            f.create_dataset("davis/left/depth_image_rect_ts", data=depth_ts)
            f.create_dataset("davis/left/pose", data=poses)
            f.create_dataset("davis/left/pose_ts", data=pose_ts)
        with h5py.File(d / f"{seq}_rectified.h5", "w") as f:
            f.create_dataset("davis/left/events_rect", data=ev)
            f.create_dataset("davis/left/image_rect",
                             data=rng.integers(0, 255, (n_frames, H, W),
                                               dtype=np.uint8))

    calib = root / "indoor_flying_calib"
    calib.mkdir()
    with open(calib / "camchain-imucam-indoor_flying.yaml", "w") as f:
        f.write("cam0:\n  intrinsics: [199.0, 199.0, 173.0, 130.0]\n")
    return str(root)


@pytest.fixture(scope="module")
def ec_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("ec")
    rng = np.random.default_rng(1)
    W, H = 240, 180
    n_frames, n_events = 260, 20000
    t0, t1 = 0.0, 13.0
    for seq in ["shapes_translation", "boxes_rotation"]:
        d = root / seq
        (d / "images_corrected").mkdir(parents=True)
        frame_ts = np.linspace(t0, t1, n_frames)
        with open(d / "images.txt", "w") as f:
            for i, ts in enumerate(frame_ts):
                f.write(f"{ts} images/frame_{i:08d}.png\n")
        for i in range(n_frames):
            cv2.imwrite(str(d / "images_corrected" / f"frame_{i:08d}.png"),
                        rng.integers(0, 255, (H, W), dtype=np.uint8))
        ev = np.stack([np.sort(rng.uniform(t0, t1, n_events)),
                       rng.uniform(0, W - 1, n_events),
                       rng.uniform(0, H - 1, n_events),
                       rng.integers(0, 2, n_events).astype(float)], 1)
        np.save(d / "events_corrected.npy", ev)
        np.savetxt(d / "calib.txt",
                   np.array([199.0, 199.0, 120.0, 90.0, 0, 0, 0, 0]))
        pose_ts = np.linspace(t0 - 0.5, t1 + 0.5, 60)
        gt = np.zeros((60, 8))
        gt[:, 0] = pose_ts
        gt[:, 1] = np.linspace(0, 0.5, 60)
        gt[:, 7] = 1.0  # identity quaternion (w last)
        np.save(d / "groundtruth.npy", gt)
    return str(root)


class TestInterpolator:
    def test_linear_translation(self):
        ts = np.array([0.0, 1.0, 2.0])
        t = np.array([[0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        R = np.tile(np.eye(3), (3, 1, 1))
        pi = PoseInterpolator(ts, t, R, quat_R=False)
        T = pi.interpolate(0.5)
        # returns inv(world pose): translation -0.5 along x
        np.testing.assert_allclose(T[:3, 3], [-0.5, 0, 0], atol=1e-8)

    def test_slerp_rotation(self):
        from scipy.spatial.transform import Rotation
        ts = np.array([0.0, 1.0])
        R = Rotation.from_euler("z", [[0], [90]], degrees=True).as_matrix()
        pi = PoseInterpolator(ts, np.zeros((2, 3)), R, quat_R=False)
        T = pi.interpolate(0.5)
        ang = Rotation.from_matrix(T[:3, :3]).as_rotvec(degrees=True)
        assert np.isclose(ang[2], -45.0, atol=1e-6)  # inverse pose

    def test_batch_matches_scalar(self):
        ts = np.linspace(0, 1, 5)
        t = np.random.default_rng(0).normal(size=(5, 3))
        from scipy.spatial.transform import Rotation
        R = Rotation.random(5, rng=np.random.default_rng(1)).as_matrix()
        pi = PoseInterpolator(ts, t, R, quat_R=False)
        q = np.array([0.1, 0.4, 0.9])
        batch = pi.interpolate_batch(q)
        for i, qi in enumerate(q):
            np.testing.assert_allclose(batch[i], pi.interpolate(qi),
                                       atol=1e-10)


class TestMVSEC:
    def test_archive_readers(self, mvsec_root):
        a = MVSECArchive(mvsec_root)
        K = a.get_K("indoor_flying1")
        np.testing.assert_allclose(np.diag(K), [199.0, 199.0, 1.0])
        t, ds = a.get_event_datasets("indoor_flying1")
        assert len(t) == ds.shape[0]
        assert (np.diff(t) >= 0).all()

    def test_sequence_crop_and_views(self, mvsec_root):
        a = MVSECArchive(mvsec_root)
        seq = MVSECSequence(a, "indoor_flying1")
        # crop (80, -80) applied after pose-ts clamp
        assert len(seq) > 0
        v = seq.view(0, event_dt=0.4, max_events=4096)
        assert v["image"].shape == (260, 346, 1)
        assert v["depth"].shape == (260, 346)
        assert v["events_x"].shape == (4096,)
        assert v["events_valid"].any()
        # stamps are RELATIVE to the window's first event in f32 (epoch-
        # scale absolute f64 would truncate at the device boundary): the
        # (ts-dt, ts] window selection now shows as values in [0, dt)
        tv = v["events_t"][v["events_valid"]]
        assert tv.dtype == np.float32
        assert tv[0] == 0.0
        assert (np.diff(tv) >= 0).all()
        assert (tv < 0.4 + 1e-6).all()
        # depth NaN band became 0 with mask False
        assert not v["depth_mask"][:10].any()
        assert (v["depth"][:10] == 0).all()

    def test_single_mode_identity(self, mvsec_root):
        ds = MVSECPairDataset(mvsec_root, ["indoor_flying1"], mode="single",
                              max_events=2048)
        d0, d1, T01, T10 = ds[0]
        np.testing.assert_allclose(T01, np.eye(4))
        assert d0 is d1

    def test_random_pair_relative_pose(self, mvsec_root):
        ds = MVSECPairDataset(mvsec_root, ["indoor_flying1"],
                              mode="random_pair", max_events=2048, seed=3)
        d0, d1, T01, T10 = ds[2]
        # known linear motion along x: T01 translation is along x only
        np.testing.assert_allclose(T01 @ T10, np.eye(4), atol=1e-5)
        np.testing.assert_allclose(
            T01, relative_pose(d0["pose"], d1["pose"]), atol=1e-6)

    def test_index_pairs_mode(self, mvsec_root, tmp_path):
        idx_file = tmp_path / "pairs.txt"
        np.savetxt(idx_file, np.array([[0, 3], [1, 4]]))
        ds = MVSECPairDataset(mvsec_root, ["indoor_flying4"],
                              mode="index_pairs", index_files=[str(idx_file)],
                              max_events=2048)
        assert len(ds) == 2
        d0, d1, T01, _ = ds[0]
        assert d0["image_ts"] < d1["image_ts"]


class TestEC:
    def test_single_mode_augmented(self, ec_root):
        """EC single-mode with PairAugmentationEvents: crop resolution,
        in-bounds events (no depth in EC samples)."""
        aug = PairAugmentationEvents(crop_size=(96, 128), rotate_angle=5.0,
                                     rng=np.random.default_rng(0))
        ds = ECPairDataset(ec_root, ["shapes_translation"], mode="single",
                           max_events=1024, augment=aug)
        d0, d1, T01, _ = ds[0]
        assert d0 is d1
        np.testing.assert_allclose(T01, np.eye(4))
        assert d0["image"].shape == (96, 128, 1)
        v = d0["events_valid"]
        if v.any():
            assert d0["events_x"][v].max() < 128
            assert d0["events_y"][v].max() < 96

    def test_sequence(self, ec_root):
        a = ECArchive(ec_root)
        seq = ECSequence(a, "shapes_translation")
        # [100:-100] crop after dropping frames outside the event/pose span
        assert 50 < len(seq) <= 60
        v = seq.view(0, event_dt=0.04, max_events=1024)
        assert v["image"].shape == (180, 240, 1)
        assert v["K"][0, 0] == pytest.approx(199.0)

    def test_val_pairs(self, ec_root, tmp_path):
        f1 = tmp_path / "p1.txt"
        np.savetxt(f1, np.array([[0, 5], [2, 8], [3, 3]]))
        ds = ECPairDataset(ec_root, ["shapes_translation"],
                           mode="index_pairs", index_files=[str(f1)],
                           max_events=1024)
        assert len(ds) == 3
        d0, d1, T01, T10 = ds[0]
        np.testing.assert_allclose(T01 @ T10, np.eye(4), atol=1e-5)
        # identity pair shortcut
        d0, d1, T01, _ = ds[2]
        np.testing.assert_allclose(T01, np.eye(4))


class TestPipeline:
    class FakeDataset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32), "i": np.int32(i)}

    def test_collate_nested(self):
        s = [({"a": np.ones(2)}, np.zeros(3)) for _ in range(4)]
        out = collate(s)
        assert out[0]["a"].shape == (4, 2)
        assert out[1].shape == (4, 3)

    def test_batching_and_len(self):
        dl = DataLoader(self.FakeDataset(10), batch_size=4, shuffle=False)
        batches = list(dl)
        assert len(batches) == len(dl) == 2
        np.testing.assert_array_equal(batches[0]["i"], [0, 1, 2, 3])

    def test_sharding_partitions(self):
        ds = self.FakeDataset(16)
        seen = []
        for p in range(2):
            dl = DataLoader(ds, batch_size=8, shuffle=True, seed=5,
                            process_index=p, process_count=2)
            for b in dl:
                seen.extend(b["i"].tolist())
        assert sorted(seen) == list(range(16))

    def test_shuffle_epoch_determinism(self):
        ds = self.FakeDataset(12)
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
        e0 = [b["i"].tolist() for b in dl]
        e0b = [b["i"].tolist() for b in dl]
        assert e0 == e0b
        dl.set_epoch(1)
        e1 = [b["i"].tolist() for b in dl]
        assert e0 != e1

    def test_worker_error_propagates(self):
        class Bad(self.FakeDataset):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        dl = DataLoader(Bad(4), batch_size=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)

    def test_device_prefetch_order_and_errors(self):
        # threaded path is OPT-IN since the round-5 on-target A/B showed
        # it loses through the tunnel (data/pipeline.py device_prefetch)
        from ei_nexus_tpu.data import device_prefetch
        import os
        items = list(range(7))
        os.environ["EI_NEXUS_DEVICE_PREFETCH"] = "1"
        try:
            out = list(device_prefetch(iter(items), lambda x: x * 10))
            assert out == [x * 10 for x in items]  # order preserved

            def bad_put(x):
                if x == 3:
                    raise ValueError("put failed")
                return x

            with pytest.raises(ValueError, match="put failed"):
                list(device_prefetch(iter(items), bad_put))
        finally:
            del os.environ["EI_NEXUS_DEVICE_PREFETCH"]

        # default (unset) = inline fallback
        out = list(device_prefetch(iter(items), lambda x: x + 1))
        assert out == [x + 1 for x in items]


class TestAugment:
    def test_pair_augmentation_shapes_and_consistency(self, rng):
        aug = PairAugmentation(crop_size=(32, 32), flip_p_h=1.0, flip_p_w=0.0,
                               rotate_angle=0.0,
                               rng=np.random.default_rng(0))
        x = rng.normal(size=(16, 48, 64)).astype(np.float32)
        y = rng.normal(size=(1, 48, 64)).astype(np.float32)
        m = (rng.uniform(size=(1, 48, 64)) > 0.5).astype(np.float32)
        xa, ya, ma = aug(x, y, m)
        assert xa.shape == (16, 32, 32)
        assert ya.shape == (1, 32, 32)
        assert ma.shape == (1, 32, 32)

    def test_pair_augmentation_events(self, rng):
        """Event-coordinate pair aug: crop resolution, in-bounds validity,
        and image/event geometric consistency under rotation."""
        H, W, N = 64, 80, 400
        sample = {
            "events_x": np.full(N, 40.0, np.float32),
            "events_y": np.full(N, 30.0, np.float32),
            "events_t": np.linspace(0, 0.4, N).astype(np.float32),
            "events_p": np.ones(N, np.float32),
            "events_valid": np.ones(N, bool),
            "image": np.zeros((H, W, 1), np.float32),
            "depth": np.full((H, W), 2.0, np.float32),
            "depth_mask": np.ones((H, W), bool),
        }
        sample["image"][30, 40, 0] = 255.0
        aug = PairAugmentationEvents(crop_size=(48, 56), flip_p_h=0.0,
                                     flip_p_w=0.0, rotate_angle=10.0,
                                     rng=np.random.default_rng(3))
        out = aug(sample)
        assert out["image"].shape == (48, 56, 1)
        assert out["depth"].shape == (48, 56)
        v = out["events_valid"]
        if v.any():
            x, y = out["events_x"][v], out["events_y"][v]
            assert x.min() >= 0 and x.max() < 56
            assert y.min() >= 0 and y.max() < 48
            py, px, _ = np.unravel_index(np.argmax(out["image"]),
                                         out["image"].shape)
            assert abs(x[0] - px) < 1.5 and abs(y[0] - py) < 1.5
        assert (out["events_x"][~v] == -1).all()
