"""Ops layer tests: padding, pixel shuffle, NMS, fixed-K selection, descriptor
sampling — cross-checked against torch ops (pixel_shuffle / grid_sample /
max_pool2d / quantile) which define the reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ei_nexus_tpu.ops import (
    Padder, logits_to_prob, depth_to_space, space_to_depth,
    remove_border_scores, nms, select_topk_keypoints, smooth_score_mask,
    normalize_descriptors, sample_descriptors_lowres,
    sample_descriptors_fullres, upsample_descriptors, dense_descriptors,
)
from ei_nexus_tpu.ops.detector import dense_positions


class TestPadder:
    def test_pad_shapes(self):
        p = Padder(260, 346, 8)
        assert p.padded_height == 264 and p.padded_width == 352
        x = jnp.ones((2, 260, 346, 3))
        xp = p.pad(x)
        assert xp.shape == (2, 264, 352, 3)
        assert p.unpad(xp).shape == (2, 260, 346, 3)

    def test_pad_centered_replicate(self):
        p = Padder(6, 6, 8)  # pad to 8x8: 1 top 1 bottom, 1 left 1 right
        x = jnp.arange(36, dtype=jnp.float32).reshape(1, 6, 6, 1)
        xp = p.pad(x)
        np.testing.assert_allclose(np.asarray(xp[0, 0, 1:7, 0]),
                                   np.asarray(x[0, 0, :, 0]))  # replicated row
        np.testing.assert_allclose(np.asarray(xp[0, 1:7, 0, 0]),
                                   np.asarray(x[0, :, 0, 0]))

    def test_bool_pads_zero(self):
        p = Padder(6, 6, 8)
        m = jnp.ones((1, 6, 6), bool)
        mp = p.pad(m, hw_axes=(-2, -1))
        assert not bool(mp[0, 0, 0])
        assert bool(mp[0, 1, 1])

    def test_unpad_positions(self):
        p = Padder(6, 6, 8)
        pos = jnp.asarray([[[3.5, 2.5, 0.9]]])  # yx + prob in padded coords
        out = np.asarray(p.unpad_positions(pos, "yx"))
        np.testing.assert_allclose(out, [[[2.5, 1.5, 0.9]]])

    def test_roundtrip_matches_torch_padder_semantics(self):
        # replicate-pad H,W to multiple of 8 with left = pad//2 (reference
        # Padder splits as (w0, w1, h0, h1) = (p//2, p-p//2, ...))
        H, W = 5, 7
        x = np.random.default_rng(0).normal(size=(1, 1, H, W)).astype(np.float32)
        h_pad, w_pad = (-H) % 8, (-W) % 8
        tp = F.pad(torch.from_numpy(x),
                   (w_pad // 2, w_pad - w_pad // 2,
                    h_pad // 2, h_pad - h_pad // 2), mode="replicate")
        p = Padder(H, W, 8)
        jp = p.pad(jnp.asarray(x[0, 0][None, :, :, None]))
        np.testing.assert_allclose(np.asarray(jp[0, :, :, 0]),
                                   tp.numpy()[0, 0], atol=1e-7)


class TestDepthToSpace:
    def test_matches_torch_pixel_shuffle(self, rng):
        B, h, w, cell = 2, 4, 5, 8
        logits = rng.normal(size=(B, cell * cell + 1, h, w)).astype(np.float32)
        prob_t = torch.softmax(torch.from_numpy(logits), dim=1)
        want = F.pixel_shuffle(prob_t[:, :64], cell).numpy()[:, 0]
        prob_j = logits_to_prob(jnp.asarray(logits.transpose(0, 2, 3, 1)))
        got = np.asarray(depth_to_space(prob_j, cell))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_space_to_depth_roundtrip(self, rng):
        B, H, W = 1, 16, 24
        score = rng.uniform(0, 0.02, (B, H, W)).astype(np.float32)
        cells = space_to_depth(jnp.asarray(score), 8)
        assert cells.shape == (1, 2, 3, 65)
        back = depth_to_space(cells, 8)
        np.testing.assert_allclose(np.asarray(back), score, atol=1e-6)
        # dustbin clamped nonnegative and completes sums to >= 1
        s = np.asarray(cells).sum(-1)
        assert (np.asarray(cells[..., -1]) >= 0).all()
        np.testing.assert_allclose(s, np.maximum(
            np.asarray(cells)[..., :-1].sum(-1), 1.0), atol=1e-6)

    def test_sigmoid_single_channel(self, rng):
        logits = rng.normal(size=(1, 4, 4, 1)).astype(np.float32)
        p = np.asarray(logits_to_prob(jnp.asarray(logits)))
        np.testing.assert_allclose(p, 1 / (1 + np.exp(-logits)), atol=1e-6)


def torch_fast_nms(score: np.ndarray, radius: int, max_iter=-1):
    """Independent torch implementation of iterate-until-converged local-max
    suppression (the documented fast_nms algorithm) for cross-checking."""
    x = torch.from_numpy(score)[:, None]  # B,1,H,W
    ks = 2 * radius + 1
    count = None
    i = 0
    while i != max_iter:
        pooled = F.max_pool2d(x, ks, stride=1, padding=radius)
        is_max = (x == pooled) & (x > 0)
        new_count = int(is_max.sum())
        if new_count == count:
            break
        count = new_count
        neigh = F.max_pool2d(is_max.float(), ks, stride=1, padding=radius) > 0
        x = torch.where(neigh & ~is_max, torch.zeros_like(x), x)
        i += 1
    return x[:, 0].numpy()


class TestNMS:
    def test_simple_peak(self):
        score = np.zeros((1, 16, 16), np.float32)
        score[0, 5, 5] = 1.0
        score[0, 6, 6] = 0.5  # within radius of the peak -> suppressed
        score[0, 12, 12] = 0.8
        out = np.asarray(nms(jnp.asarray(score), radius=4))
        assert out[0, 5, 5] == 1.0
        assert out[0, 6, 6] == 0.0
        assert out[0, 12, 12] == 0.8

    def test_matches_torch_impl(self, rng):
        score = rng.uniform(0, 1, (2, 32, 40)).astype(np.float32)
        score[score < 0.7] = 0.0  # sparsify
        got = np.asarray(nms(jnp.asarray(score), radius=3))
        want = torch_fast_nms(score, 3)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_dense_map(self, rng):
        # dense random map: every pixel nonzero (worst case)
        score = rng.uniform(0.01, 1, (1, 24, 24)).astype(np.float32)
        got = np.asarray(nms(jnp.asarray(score), radius=2, max_iter=20))
        want = torch_fast_nms(score, 2)
        np.testing.assert_allclose(got, want, atol=1e-7)
        # surviving peaks are pairwise separated by > radius (chebyshev)
        ys, xs = np.nonzero(got[0])
        for i in range(len(ys)):
            for j in range(i + 1, len(ys)):
                assert max(abs(ys[i] - ys[j]), abs(xs[i] - xs[j])) > 2

    def test_radius_zero_identity(self, rng):
        score = rng.uniform(0, 1, (1, 8, 8)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(nms(jnp.asarray(score), 0)),
                                      score)

    def test_jit(self, rng):
        score = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)).astype(np.float32))
        f = jax.jit(lambda s: nms(s, 4))
        assert f(score).shape == (1, 16, 16)


class TestTopKSelect:
    def test_positions_and_threshold_rule(self, rng):
        B, H, W, k = 1, 16, 16, 5
        score = np.zeros((B, H, W), np.float32)
        peaks = [(2, 3, 0.9), (5, 10, 0.8), (9, 4, 0.7), (12, 12, 0.6),
                 (14, 2, 0.5), (7, 7, 0.4), (3, 13, 0.3)]
        for y, x, v in peaks:
            score[0, y, x] = v
        pos, valid = select_topk_keypoints(jnp.asarray(score), k=k,
                                           prob_thresh=1.0)
        pos, valid = np.asarray(pos), np.asarray(valid)
        assert pos.shape == (1, k, 3) and valid.shape == (1, k)
        # torch.quantile midpoint rule: thresh = (v5 + v6)/2 = .45 -> all 5 kept
        assert valid.sum() == 5
        for i, (y, x, v) in enumerate(peaks[:k]):
            np.testing.assert_allclose(pos[0, i], [y + 0.5, x + 0.5, v],
                                       atol=1e-6)

    def test_matches_torch_quantile(self, rng):
        B, H, W, k = 2, 12, 12, 10
        score = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
        score[score < 0.5] = 0
        pos, valid = select_topk_keypoints(jnp.asarray(score), k=k,
                                           prob_thresh=1.0)
        t = torch.from_numpy(score.reshape(B, -1))
        q = (H * W - k) / (H * W)
        th = torch.quantile(t, q, dim=1, interpolation="midpoint")
        th = torch.minimum(th, torch.tensor(1.0))
        for b in range(B):
            want = (t[b] > th[b]).sum().item()
            assert np.asarray(valid)[b].sum() == want

    def test_fewer_than_k_points(self):
        score = np.zeros((1, 16, 16), np.float32)
        score[0, 4, 4] = 0.9
        pos, valid = select_topk_keypoints(jnp.asarray(score), k=8,
                                           prob_thresh=1.0)
        assert np.asarray(valid).sum() == 1
        np.testing.assert_allclose(np.asarray(pos)[0, 0], [4.5, 4.5, 0.9],
                                   atol=1e-6)

    def test_xy_ordering(self):
        score = np.zeros((1, 8, 8), np.float32)
        score[0, 2, 5] = 1.0
        pos, _ = select_topk_keypoints(jnp.asarray(score), k=2,
                                       prob_thresh=1.0, ordering="xy")
        np.testing.assert_allclose(np.asarray(pos)[0, 0], [5.5, 2.5, 1.0],
                                   atol=1e-6)

    def test_prob_thresh_caps(self):
        # thresh = min(quantile_midpoint, prob_thresh): prob_thresh is an
        # upper CAP — it can only keep more points, never fewer. Here the
        # quantile midpoint is (0.3+0)/2 = 0.15 < 0.5, so both points stay.
        score = np.zeros((1, 8, 8), np.float32)
        score[0, 1, 1], score[0, 5, 5] = 0.3, 0.9
        pos, valid = select_topk_keypoints(jnp.asarray(score), k=2,
                                           prob_thresh=0.5)
        v = np.asarray(valid)[0]
        assert v[0] and v[1]
        # cap below the quantile: with k=1, quantile = (0.9+0.3)/2 = 0.6, a
        # prob_thresh of 0.25 lowers it -> the reference would keep BOTH
        # points; the fixed-K design keeps the best k (documented deviation),
        # and the kept slot must be valid
        _, valid1 = select_topk_keypoints(jnp.asarray(score), k=1,
                                          prob_thresh=0.25)
        assert np.asarray(valid1)[0, 0]


class TestBorderAndMask:
    def test_remove_border(self, rng):
        s = rng.uniform(0.1, 1, (1, 10, 12)).astype(np.float32)
        out = np.asarray(remove_border_scores(jnp.asarray(s), 3))
        assert (out[0, :3] == 0).all() and (out[0, -3:] == 0).all()
        assert (out[0, :, :3] == 0).all() and (out[0, :, -3:] == 0).all()
        np.testing.assert_array_equal(out[0, 3:-3, 3:-3], s[0, 3:-3, 3:-3])

    def test_smooth_mask_is_dilation(self):
        m = np.zeros((1, 8, 8), bool)
        m[0, 4, 4] = True
        out = np.asarray(smooth_score_mask(jnp.asarray(m)))
        assert out[0, 3:6, 3:6].all()
        assert out.sum() == 9


class TestDescriptorSampling:
    def test_lowres_matches_torch_grid_sample(self, rng):
        B, h, w, D = 1, 6, 8, 16
        cell = 8
        H, W = h * cell, w * cell
        raw = rng.normal(size=(B, D, h, w)).astype(np.float32)
        pos_yx = np.stack([rng.uniform(0, H, 40), rng.uniform(0, W, 40)],
                          -1).astype(np.float32)[None]
        # torch reference: grid_sample path of sparsify_low_resolution
        p = torch.from_numpy(pos_yx[0]) - 0.5
        p = 2.0 * (p / torch.tensor([H - 1.0, W - 1.0])) - 1.0
        p = p[:, [1, 0]][None, None]
        want = F.grid_sample(torch.from_numpy(raw), p, mode="bilinear",
                             align_corners=False)[0, :, 0].T
        want = F.normalize(want, p=2, dim=1).numpy() * 1.41
        got = np.asarray(sample_descriptors_lowres(
            jnp.asarray(raw.transpose(0, 2, 3, 1)), jnp.asarray(pos_yx),
            (H, W), scale_factor=1.41))
        np.testing.assert_allclose(got[0], want, atol=2e-5)

    def test_fullres_integer_gather(self, rng):
        B, H, W, D = 1, 8, 8, 4
        raw = rng.normal(size=(B, H, W, D)).astype(np.float32)
        pos = jnp.asarray([[[2.5, 3.5, 0.9], [7.9, 0.1, 0.5]]])
        got = np.asarray(sample_descriptors_fullres(
            jnp.asarray(raw), pos, normalize=False))
        np.testing.assert_allclose(got[0, 0], raw[0, 2, 3])
        np.testing.assert_allclose(got[0, 1], raw[0, 7, 0])

    def test_upsample_matches_torch_resize(self, rng):
        B, h, w, D = 1, 4, 5, 8
        H, W = 32, 40
        raw = rng.normal(size=(B, D, h, w)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(raw), (H, W), mode="bilinear",
                             align_corners=False)
        want = (want / want.norm(dim=1, keepdim=True).clamp(min=1e-12)).numpy()
        got = np.asarray(upsample_descriptors(
            jnp.asarray(raw.transpose(0, 2, 3, 1)), (H, W)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-5)

    def test_normalize(self, rng):
        d = rng.normal(size=(2, 5, 16)).astype(np.float32)
        out = np.asarray(normalize_descriptors(jnp.asarray(d), 1.41))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.41,
                                   rtol=1e-5)

    def test_dense_positions_row_major(self):
        score = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3)
        dp = np.asarray(dense_positions(score))
        np.testing.assert_allclose(dp[0, 0], [0.5, 0.5, 0.0])
        np.testing.assert_allclose(dp[0, 1], [0.5, 1.5, 1.0])
        np.testing.assert_allclose(dp[0, 3], [1.5, 0.5, 3.0])

    def test_dense_descriptors_shape(self, rng):
        d = jnp.asarray(rng.normal(size=(2, 4, 5, 8)).astype(np.float32))
        out = dense_descriptors(d)
        assert out.shape == (2, 20, 8)
        np.testing.assert_allclose(np.asarray(out[0, 7]),
                                   np.asarray(d[0, 1, 2]))


class TestCoordinateMappings:
    def test_conv_identity_same(self):
        from ei_nexus_tpu.ops.coords import conv2d_mapping
        m = conv2d_mapping(3, padding=1)
        assert m.scale == 1.0 and m.offset == 0.0

    def test_valid_conv_offset(self):
        from ei_nexus_tpu.ops.coords import conv2d_mapping
        m = conv2d_mapping(3, padding=0)
        assert m.offset == 1.0  # output center 0 sits at input center 1

    def test_vgg_np_padding0_gives_plus9(self):
        """The principled derivation of the reference's hardcoded +9 remap
        (EventExtractors.py:319-329)."""
        from ei_nexus_tpu.ops.coords import vgg_np_padding0_mapping
        m = vgg_np_padding0_mapping()
        assert m.scale == 1.0
        assert m.offset == 9.0

    def test_cell8_stride_and_center(self):
        from ei_nexus_tpu.ops.coords import vgg_cell8_mapping
        m = vgg_cell8_mapping()
        assert m.scale == 8.0
        assert m.offset == 3.5  # cell center

    def test_roundtrip(self):
        from ei_nexus_tpu.ops.coords import vgg_cell8_mapping
        m = vgg_cell8_mapping()
        assert m.to_feature(m.to_image(5.0)) == 5.0


class TestBlockedTopK:
    """select_topk_keypoints min_distance block-max fast path vs the plain
    top-k, on NMS-spaced score maps (the production call pattern)."""

    def _nms_spaced_map(self, rng, B, H, W, r):
        import jax.numpy as jnp
        from ei_nexus_tpu.ops.detector import nms
        score = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
        return nms(score, r, impl="xla")

    def test_matches_plain_topk(self, rng):
        import jax.numpy as jnp
        from ei_nexus_tpu.ops.detector import select_topk_keypoints
        B, H, W, r, k = 3, 61, 83, 4, 64  # non-divisible dims -> padding
        m = self._nms_spaced_map(rng, B, H, W, r)
        pos_b, val_b = select_topk_keypoints(m, k, 1.0, "yx",
                                             min_distance=r + 1)
        pos_p, val_p = select_topk_keypoints(m, k, 1.0, "yx")
        np.testing.assert_array_equal(np.asarray(val_b), np.asarray(val_p))
        # valid slots identical (invalid slots may order zeros differently)
        vb = np.asarray(jnp.where(val_b[..., None], pos_b, 0))
        vp = np.asarray(jnp.where(val_p[..., None], pos_p, 0))
        np.testing.assert_allclose(vb, vp)

    def test_padded_blocks_never_validate(self, rng):
        """Block padding can surface out-of-image candidate indices in
        INVALID slots only; every valid slot must index a real pixel."""
        import jax.numpy as jnp
        from ei_nexus_tpu.ops.detector import select_topk_keypoints
        B, H, W, r, k = 2, 30, 34, 4, 128  # k near the survivor count
        m = self._nms_spaced_map(rng, B, H, W, r)
        pos, val = select_topk_keypoints(m, k, 1.0, "yx",
                                         min_distance=r + 1)
        pos = np.asarray(pos)
        val = np.asarray(val)
        assert (pos[val][:, 0] < H).all() and (pos[val][:, 1] < W).all()
        assert (pos[val][:, 2] > 0).all()

    def test_sparse_map_fewer_than_k(self):
        """Fewer nonzero scores than k: the extras are invalid."""
        import jax.numpy as jnp
        from ei_nexus_tpu.ops.detector import select_topk_keypoints
        m = np.zeros((1, 40, 40), np.float32)
        m[0, 5, 7] = 0.9
        m[0, 20, 30] = 0.8
        pos, val = select_topk_keypoints(jnp.asarray(m), 16, 1.0, "yx",
                                         min_distance=5)
        assert int(val.sum()) == 2
        got = {(float(y), float(x)) for y, x, _ in np.asarray(pos)[0][
            np.asarray(val)[0]]}
        assert got == {(5.5, 7.5), (20.5, 30.5)}
