"""Pallas kernels in interpreter mode vs their XLA references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.ops.detector import nms
from ei_nexus_tpu.ops.pallas_nms import nms_pallas
from ei_nexus_tpu.ops.pallas_splat import voxel_grid_splat_pallas
from ei_nexus_tpu.data.representations import (
    events_to_voxel_grid, events_to_accumulation_image, pad_events)


class TestPallasNMS:
    def test_sparse_map(self, rng):
        s = rng.uniform(0, 1, (2, 40, 48)).astype(np.float32)
        s[s < 0.6] = 0
        want = np.asarray(nms(jnp.asarray(s), 4))
        got = np.asarray(nms_pallas(jnp.asarray(s), 4, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_dense_map(self, rng):
        s = rng.uniform(0.01, 1, (1, 32, 32)).astype(np.float32)
        want = np.asarray(nms(jnp.asarray(s), 3, max_iter=4))
        got = np.asarray(nms_pallas(jnp.asarray(s), 3, n_iter=4,
                                    interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_separation_property(self, rng):
        s = rng.uniform(0, 1, (1, 48, 48)).astype(np.float32)
        out = np.asarray(nms_pallas(jnp.asarray(s), 4, interpret=True))[0]
        ys, xs = np.nonzero(out)
        for i in range(len(ys)):
            for j in range(i + 1, len(ys)):
                assert max(abs(ys[i] - ys[j]), abs(xs[i] - xs[j])) > 4


class TestPallasSplat:
    def test_matches_scatter(self, rng):
        H, W, bins = 48, 64, 8
        n = 6000
        x = rng.uniform(0, W - 1, n).astype(np.float32)
        y = rng.uniform(0, H - 1, n).astype(np.float32)
        t = np.sort(rng.uniform(0, 0.4, n))
        p = rng.integers(0, 2, n).astype(np.float32)
        xp, yp, tp, pp, m = pad_events(x, y, t, p, 8192)
        want = np.asarray(events_to_voxel_grid(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(tp),
            jnp.asarray(pp), bins=bins, height=H, width=W,
            mask=jnp.asarray(m), normalize=False))
        grid, acc = voxel_grid_splat_pallas(
            jnp.asarray(xp)[None], jnp.asarray(yp)[None],
            jnp.asarray(tp)[None], jnp.asarray(pp)[None], bins=bins,
            height=H, width=W, mask=jnp.asarray(m)[None], normalize=False,
            chunk=2048, interpret=True)
        # bf16 matmuls -> ~1e-2 relative tolerance
        np.testing.assert_allclose(np.asarray(grid[0]), want, atol=2e-2)
        acc_want = np.asarray(events_to_accumulation_image(
            jnp.asarray(xp), jnp.asarray(yp), height=H, width=W,
            mask=jnp.asarray(m)))
        np.testing.assert_allclose(np.asarray(acc[0]), acc_want)

    def test_empty(self):
        e = jnp.zeros((1, 2048))
        g, a = voxel_grid_splat_pallas(
            e, e, e, e, bins=4, height=16, width=16,
            mask=jnp.zeros((1, 2048), bool), normalize=False, interpret=True)
        assert float(jnp.abs(g).sum()) == 0.0


