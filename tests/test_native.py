"""Native (C++/OpenMP) event rasterizer vs the jax reference kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from ei_nexus_tpu import native
from ei_nexus_tpu.data.representations import (
    events_to_voxel_grid, events_to_time_surface, events_to_event_stack,
    events_to_accumulation_image)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def make_events(rng, n, H, W):
    x = rng.uniform(0, W - 1, n).astype(np.float32)
    y = rng.uniform(0, H - 1, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 0.4, n))
    p = rng.integers(0, 2, n).astype(np.float32)
    return x, y, t, p


class TestNativeParity:
    def test_voxel_grid_unnormalized(self, rng):
        H, W, bins = 32, 40, 8
        x, y, t, p = make_events(rng, 5000, H, W)
        got = native.voxel_grid(x, y, t, p, bins, H, W, normalize=False)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W, normalize=False))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_voxel_grid_normalized(self, rng):
        H, W, bins = 16, 16, 4
        n = 500
        x = rng.integers(0, W, n).astype(np.float32)
        y = rng.integers(0, H, n).astype(np.float32)
        t = np.sort(rng.uniform(0, 1, n))
        p = rng.integers(0, 2, n).astype(np.float32)
        got = native.voxel_grid(x, y, t, p, bins, H, W, normalize=True)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W, normalize=True))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_time_surface(self, rng):
        H, W, bins = 24, 24, 6
        x, y, t, p = make_events(rng, 3000, H, W)
        got = native.time_surface(x, y, t, p, bins, H, W)
        want = np.asarray(events_to_time_surface(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_event_stack(self, rng):
        H, W, bins = 24, 24, 4
        x, y, t, p = make_events(rng, 3000, H, W)
        got = native.event_stack(x, y, t, p, bins, H, W)
        want = np.asarray(events_to_event_stack(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            bins=bins, height=H, width=W))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_accumulation(self, rng):
        H, W = 20, 30
        x, y, t, p = make_events(rng, 1000, H, W)
        got = native.accumulation_image(x, y, H, W)
        want = np.asarray(events_to_accumulation_image(
            jnp.asarray(x), jnp.asarray(y), height=H, width=W))
        np.testing.assert_allclose(got, want)

    def test_empty_events(self):
        out = native.voxel_grid(np.zeros(0, np.float32),
                                np.zeros(0, np.float32),
                                np.zeros(0, np.float64),
                                np.zeros(0, np.float32), 4, 8, 8)
        assert out.shape == (4, 8, 8) and (out == 0).all()

    def test_throughput_sane(self, rng):
        """Native path should rasterize clearly faster than the reference's
        python loop (~5M events/s at 0.2M events / 40ms). Unloaded it does
        >10M/s; the bar is 6M/s because best-of-5 still degrades ~30% when
        the suite shares the host with a concurrent CPU training run
        (OpenMP threads contend for every core)."""
        import time
        H, W, bins = 260, 346, 16
        x, y, t, p = make_events(rng, 200_000, H, W)
        native.voxel_grid(x, y, t, p, bins, H, W)  # warm
        # best-of-N: the mean is load-sensitive (CI shares the host with
        # concurrent benches); the best iteration reflects the code's speed
        dt = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            native.voxel_grid(x, y, t, p, bins, H, W)
            dt = min(dt, time.perf_counter() - t0)
        rate = 200_000 / dt
        assert rate > 6e6, f"{rate/1e6:.1f} M events/s"
