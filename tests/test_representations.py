"""Event representation kernels vs brute-force numpy references implementing
the documented semantics (trilinear splat, last-timestamp surface, signed
counts, chamfer distance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.data.representations import (
    events_to_voxel_grid,
    events_to_time_surface,
    events_to_event_stack,
    events_to_accumulation_image,
    events_to_distance_map,
    normalize_time,
    pad_events,
)


def make_events(rng, n, H, W, dt=0.4):
    x = rng.uniform(0, W - 1, n).astype(np.float32)
    y = rng.uniform(0, H - 1, n).astype(np.float32)
    t = np.sort(rng.uniform(0, dt, n)).astype(np.float64)
    p = rng.integers(0, 2, n).astype(np.float32)
    return x, y, t, p


def voxel_grid_numpy(x, y, t, p, bins, H, W, normalize=True):
    """Brute-force per-event trilinear splat (the reference algorithm)."""
    tn = (t - t[0]) / (t[-1] - t[0] + 1e-8) if len(t) else t
    ts = (bins - 1) * tn
    val = np.where(p < 1, -1.0, 1.0)
    grid = np.zeros((bins, H, W), np.float64)
    for i in range(len(x)):
        x0, y0, t0 = int(x[i]), int(y[i]), int(ts[i])
        for xl in (x0, x0 + 1):
            for yl in (y0, y0 + 1):
                for tl in (t0, t0 + 1):
                    if 0 <= xl < W and 0 <= yl < H and 0 <= tl < bins:
                        w = (val[i] * (1 - abs(xl - x[i])) * (1 - abs(yl - y[i]))
                             * (1 - abs(tl - ts[i])))
                        grid[tl, yl, xl] += w
    if normalize:
        nz = grid != 0
        if nz.sum() > 0:
            mean = grid[nz].mean()
            std = grid[nz].std(ddof=1)
            if std > 0:
                grid[nz] = (grid[nz] - mean) / std
            else:
                grid[nz] = grid[nz] - mean
    return grid.astype(np.float32)


class TestVoxelGrid:
    def test_matches_bruteforce(self, rng):
        # compare unnormalized: the nonzero-entry normalization mask is
        # unstable under f32-vs-f64 cancellation (same in the reference)
        H, W, bins = 16, 20, 4
        x, y, t, p = make_events(rng, 200, H, W)
        got = np.asarray(events_to_voxel_grid(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W, normalize=False))
        want = voxel_grid_numpy(x, y, t, p, bins, H, W, normalize=False)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_normalization_matches_bruteforce(self, rng):
        # integer-coordinate events -> no cancellation, masks agree exactly
        H, W, bins = 8, 8, 3
        n = 60
        x = rng.integers(0, W, n).astype(np.float32)
        y = rng.integers(0, H, n).astype(np.float32)
        t = np.sort(rng.uniform(0, 1, n))
        p = rng.integers(0, 2, n).astype(np.float32)
        got = np.asarray(events_to_voxel_grid(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W, normalize=True))
        want = voxel_grid_numpy(x, y, t, p, bins, H, W, normalize=True)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_unnormalized_single_event(self):
        # one event at integer coords: all weight on one voxel
        got = np.asarray(events_to_voxel_grid(
            jnp.asarray([3.0]), jnp.asarray([2.0]), jnp.asarray([0.1]),
            jnp.asarray([1.0]), bins=4, height=8, width=8, normalize=False))
        assert got[0, 2, 3] == pytest.approx(1.0)
        assert np.abs(got).sum() == pytest.approx(1.0)

    def test_padding_mask_ignored(self, rng):
        H, W, bins = 12, 12, 4
        x, y, t, p = make_events(rng, 100, H, W)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 160)
        got = np.asarray(events_to_voxel_grid(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp), jnp.asarray(pp),
            bins=bins, height=H, width=W, mask=jnp.asarray(m)))
        want = voxel_grid_numpy(x, y, t, p, bins, H, W)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_truncation_keeps_tail(self, rng):
        x, y, t, p = make_events(rng, 100, 8, 8)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 40)
        assert m.sum() == 40
        np.testing.assert_array_equal(xp, x[-40:])

    def test_negative_polarity_convention(self):
        # p=0 -> -1
        got = np.asarray(events_to_voxel_grid(
            jnp.asarray([3.0]), jnp.asarray([2.0]), jnp.asarray([0.1]),
            jnp.asarray([0.0]), bins=2, height=8, width=8, normalize=False))
        assert got[0, 2, 3] == pytest.approx(-1.0)


class TestTimeSurface:
    def test_last_timestamp_wins(self):
        # two events, same pixel & polarity & bin: later timestamp kept
        x = jnp.asarray([3.0, 3.0, 5.0])
        y = jnp.asarray([2.0, 2.0, 4.0])
        t = jnp.asarray([0.0, 0.1, 1.0])
        p = jnp.asarray([1.0, 1.0, 0.0])
        ts = np.asarray(events_to_time_surface(
            x, y, t, p, bins=2, height=8, width=8))
        tn = np.array([0.0, 0.1, 1.0]) / (1.0 + 1e-8)
        assert ts[1, 2, 3] == pytest.approx(tn[1], rel=1e-5)  # ch 2*0+1
        assert ts[0, 4, 5] == pytest.approx(tn[2], rel=1e-5)  # ch 2*0+0
        assert ts.shape == (2, 8, 8)

    def test_bin_split(self):
        # bins=4 -> n_bins=2 per polarity; events early/late land in bins 0/1
        x = jnp.asarray([1.0, 2.0])
        y = jnp.asarray([1.0, 2.0])
        t = jnp.asarray([0.0, 1.0])
        p = jnp.asarray([1.0, 1.0])
        ts = np.asarray(events_to_time_surface(
            x, y, t, p, bins=4, height=4, width=4))
        assert ts[1, 1, 1] > 0 or ts[1, 1, 1] == 0.0  # t=0 normalized to 0
        assert ts[3, 2, 2] == pytest.approx(1.0 / (1 + 1e-8), rel=1e-5)


class TestEventStack:
    def test_signed_counts(self):
        x = jnp.asarray([3.0, 3.0, 3.0])
        y = jnp.asarray([2.0, 2.0, 2.0])
        t = jnp.asarray([0.0, 0.01, 0.02])
        p = jnp.asarray([1.0, 1.0, 0.0])
        st = np.asarray(events_to_event_stack(
            x, y, t, p, bins=1, height=4, width=4))
        assert st[0, 2, 3] == pytest.approx(1.0)  # +1 +1 -1

    def test_bins_partition(self, rng):
        H = W = 10
        x, y, t, p = make_events(rng, 300, H, W)
        st = np.asarray(events_to_event_stack(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=4, height=H, width=W))
        # total signed count preserved, modulo boundary double-count
        total = st.sum()
        want = (2 * p - 1).sum()
        assert abs(total - want) <= 2  # at most a couple of boundary events


class TestAccumulation:
    def test_counts(self):
        x = jnp.asarray([1.0, 1.0, 2.0])
        y = jnp.asarray([1.0, 1.0, 3.0])
        img = np.asarray(events_to_accumulation_image(x, y, height=5, width=5))
        assert img[1, 1] == 2.0 and img[3, 2] == 1.0
        assert img.sum() == 3.0

    def test_out_of_bounds_dropped(self):
        x = jnp.asarray([-1.0, 10.0, 2.0])
        y = jnp.asarray([1.0, 1.0, 2.0])
        img = np.asarray(events_to_accumulation_image(x, y, height=5, width=5))
        assert img.sum() == 1.0


class TestDistanceMap:
    def test_zero_at_events_chamfer_elsewhere(self):
        x = jnp.asarray([4.0])
        y = jnp.asarray([4.0])
        t = jnp.asarray([0.5])
        p = jnp.asarray([1.0])
        dm = np.asarray(events_to_distance_map(
            x, y, t, p, bins=1, height=9, width=9))
        assert dm[0, 4, 4] == 0.0
        assert dm[0, 4, 5] == pytest.approx(0.955, abs=1e-3)
        assert dm[0, 5, 5] == pytest.approx(1.3693, abs=1e-3)
        assert dm[0, 4, 6] == pytest.approx(2 * 0.955, abs=1e-3)

    def test_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        H = W = 24
        x, y, t, p = make_events(rng, 30, H, W)
        dm = np.asarray(events_to_distance_map(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=1, height=H, width=W))
        occ = np.zeros((H, W), np.uint8)
        occ[y.astype(int), x.astype(int)] = 1
        want = cv2.distanceTransform(1 - occ, cv2.DIST_L2, 3)
        np.testing.assert_allclose(dm[0], want, atol=1e-3)


class TestNormalizeTime:
    def test_plain(self):
        t = jnp.asarray([2.0, 3.0, 4.0])
        tn = np.asarray(normalize_time(t))
        np.testing.assert_allclose(tn, [0, 0.5, 1.0], atol=1e-6)

    def test_masked_tail(self):
        t = jnp.asarray([2.0, 3.0, 4.0, 0.0, 0.0])
        m = jnp.asarray([True, True, True, False, False])
        tn = np.asarray(normalize_time(t, m))
        np.testing.assert_allclose(tn[:3], [0, 0.5, 1.0], atol=1e-6)


class TestMatmulSplat:
    """events_to_voxel_grid_splat (MXU fast path) vs the exact scatter."""

    def test_matches_scatter_f32(self, rng):
        from ei_nexus_tpu.data.representations import (
            events_to_voxel_grid_splat)
        import jax.numpy as jnp
        H, W, bins = 64, 80, 16
        x, y, t, p = make_events(rng, 20000, H, W)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 32768)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False))
        got, acc = events_to_voxel_grid_splat(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False,
            matmul_dtype=jnp.float32, chunk=2048)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        acc_want = np.asarray(events_to_accumulation_image(
            jnp.asarray(xp), jnp.asarray(yp), height=H, width=W,
            mask=jnp.asarray(m)))
        np.testing.assert_allclose(np.asarray(acc), acc_want)

    def test_normalized_and_empty(self, rng):
        from ei_nexus_tpu.data.representations import (
            events_to_voxel_grid_splat)
        import jax.numpy as jnp
        H, W, bins = 32, 32, 8
        # empty (all-padding) input stays finite and zero
        e = jnp.zeros(1024)
        g, acc = events_to_voxel_grid_splat(
            e, e, e, e, bins=bins, height=H, width=W,
            mask=jnp.zeros(1024, bool), matmul_dtype=jnp.float32)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) == 0.0


class TestBurstyStreams:
    """Realistic event statistics: temporal bursts, hot pixels, timestamp
    ties. The splat path must equal the exact scatter and report zero
    dropped weight; a pathological burst must be DETECTED by the counter
    (VERDICT r1 item 7)."""

    @staticmethod
    def bursty_events(rng, n, H, W, **kwargs):
        from ei_nexus_tpu.data.synth import bursty_events
        return bursty_events(rng, n, H, W, **kwargs)

    def test_splat_exact_on_dense_bursty_stream(self, rng):
        """High-rate bursty stream (realistic MVSEC flying rates): chunks
        span < 1 bin even through bursts -> exact, zero drop."""
        from ei_nexus_tpu.data.representations import (
            events_to_voxel_grid_splat)
        import jax.numpy as jnp
        H, W, bins = 64, 80, 16
        x, y, t, p = self.bursty_events(rng, 120000, H, W)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 131072)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False))
        got, acc, drop = events_to_voxel_grid_splat(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False,
            matmul_dtype=jnp.float32, with_drop_stat=True)
        assert float(drop) == 0.0
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_sparse_bursty_stream_drop_is_counted(self, rng):
        """Low-rate bursty stream: chunks straddle burst gaps and DO lose
        weight — the counter must equal the actual loss exactly."""
        from ei_nexus_tpu.data.representations import (
            events_to_voxel_grid_splat)
        import jax.numpy as jnp
        H, W, bins = 64, 80, 16
        x, y, t, p = self.bursty_events(rng, 30000, H, W)
        p = np.ones_like(p)  # all-positive so sums don't cancel
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 32768)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False))
        got, acc, drop = events_to_voxel_grid_splat(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False, align_bins=False,
            matmul_dtype=jnp.float32, with_drop_stat=True)
        lost = float(want.sum() - np.asarray(got).sum())
        assert float(drop) > 0.0
        np.testing.assert_allclose(float(drop), lost, rtol=1e-3)

        # the default bin-aligned path is EXACT on the same stream
        ga, _, da = events_to_voxel_grid_splat(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False,
            matmul_dtype=jnp.float32, with_drop_stat=True)
        assert float(da) == 0.0
        np.testing.assert_allclose(np.asarray(ga), want, atol=1e-4)

    def test_pathological_burst_detected(self, rng):
        """A 4096-event chunk spanning > slots-1 time bins loses weight —
        the counter must report it (and report how much)."""
        from ei_nexus_tpu.data.representations import (
            events_to_voxel_grid_splat)
        import jax.numpy as jnp
        H, W, bins = 32, 32, 16
        n = 4096
        # one chunk whose events sweep ALL 16 bins: guaranteed > 3-bin span
        t = np.linspace(0, 0.4, n).astype(np.float32)
        x = rng.uniform(0, W - 1, n).astype(np.float32)
        y = rng.uniform(0, H - 1, n).astype(np.float32)
        p = np.ones(n, np.float32)
        g, acc, drop = events_to_voxel_grid_splat(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W, normalize=False, align_bins=False,
            matmul_dtype=jnp.float32, with_drop_stat=True)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W, normalize=False))
        lost_actual = float(np.abs(want).sum() - np.abs(np.asarray(g)).sum())
        assert float(drop) > 0.0
        # counter magnitude ~= actually-lost weight (all-positive polarity)
        np.testing.assert_allclose(float(drop), lost_actual, rtol=1e-3)

    def test_drop_stat_flows_through_train_batch(self, rng):
        from ei_nexus_tpu.train.steps import batch_representation
        import jax.numpy as jnp
        H, W = 32, 40
        x, y, t, p = self.bursty_events(rng, 40000, H, W)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 65536)
        bv = {k: jnp.asarray(v)[None] for k, v in zip(
            ("events_x", "events_y", "events_t", "events_p",
             "events_valid"), (xp, yp, tp, pp, m))}
        rep, mask, drop = batch_representation(bv, "VoxelGrid", 8, H, W,
                                               with_drop_stat=True)
        assert rep.shape == (1, H, W, 8)
        assert float(drop) == 0.0


def test_accumulation_image_representation(rng):
    """'AccumulationImage' representation kind == the reference events_image
    (raw counts, MVSEC.py:850-855) with a leading channel axis."""
    import jax.numpy as jnp
    from ei_nexus_tpu.data.representations import (
        build_representation, events_to_accumulation_image)
    H, W = 24, 32
    x, y, t, p = make_events(rng, 500, H, W)
    xp, yp, tp, pp, m = pad_events(x, y, t, p, 512)
    rep = build_representation("AccumulationImage", jnp.asarray(xp),
                               jnp.asarray(yp), jnp.asarray(tp),
                               jnp.asarray(pp), bins=1, height=H, width=W,
                               mask=jnp.asarray(m))
    assert rep.shape == (1, H, W)
    want = events_to_accumulation_image(jnp.asarray(xp), jnp.asarray(yp),
                                        height=H, width=W,
                                        mask=jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(rep[0]), np.asarray(want))
    assert float(rep.sum()) == 500.0
