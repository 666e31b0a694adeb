"""Numeric parity against the ACTUAL reference implementation.

Unlike tests/test_port_torch.py (which checks the port against torch trunks
rebuilt here), these tests import the genuine modules from /root/reference
(via tests/reference_oracle.py dependency stubs), initialize them with random
weights, port the real state dicts through models/port_torch.py, and assert
numeric equivalence of every pipeline stage — the SURVEY §7.6 correctness
gate. If any reference layout/semantics assumption drifts (pool placement,
BN ordering, quantile rule, grid_sample convention), these fail.

Tolerances: f32 CPU; conv stacks accumulate ~1e-5 relative error, so maps use
atol 5e-4 on unit-scale activations; keypoint SETS must match exactly;
descriptor vectors (unit-norm) use atol 1e-3.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests") if "tests" not in sys.path else None
import reference_oracle

reference_oracle.ensure()

import jax
import jax.numpy as jnp

from core.modules.utils import detector_util as ref_det
from core.modules.utils import descriptor_util as ref_desc
from core.modules.event_extractors.EventExtractors import (
    VGGExtractor as RefVGGExtractor, VGGExtractorNP as RefVGGExtractorNP)

from ei_nexus_tpu import ops
from ei_nexus_tpu.models import VGGExtractor, KeypointExtractorConfig
from ei_nexus_tpu.models.port_torch import load_vgg_extractor_torch_weights


def t2n(t):
    return t.detach().cpu().numpy()


def nchw(a):
    """jax NHWC -> numpy NCHW for comparison."""
    return np.asarray(a).transpose(0, 3, 1, 2)


def fixed_to_ragged(pos, valid, desc=None):
    """Our fixed-K (B,K,3)+(B,K) -> per-sample arrays sorted by (y,x)."""
    out = []
    pos, valid = np.asarray(pos), np.asarray(valid)
    for b in range(pos.shape[0]):
        p = pos[b][valid[b]]
        order = np.lexsort((p[:, 1], p[:, 0]))
        if desc is not None:
            out.append((p[order], np.asarray(desc)[b][valid[b]][order]))
        else:
            out.append(p[order])
    return out


def ref_sorted(positions, descs=None):
    """Reference ragged tuples -> per-sample arrays sorted by (y,x)."""
    out = []
    for b, p in enumerate(positions):
        p = t2n(p)
        order = np.lexsort((p[:, 1], p[:, 0]))
        if descs is not None:
            out.append((p[order], t2n(descs[b])[order]))
        else:
            out.append(p[order])
    return out


class TestDetectorPostprocParity:
    """ops/detector.py vs the real detector_util.py, function by function."""

    def test_prob_map_pipeline(self, rng):
        """With prob_thresh=1.0 (the value every shipped config uses —
        configs/model/EIM_stage*.yaml), the reference rule
        `prob > min(quantile_k, thresh)` is a pure top-k quantile cut; our
        fixed-K selection must produce the identical keypoint set."""
        B, H, W = 3, 48, 56
        score = rng.random((B, H, W)).astype(np.float32) ** 8
        ts = torch.from_numpy(score)[:, None]  # (B,1,H,W)

        for top_k in (32, 100, H * W + 1):
            ref_nms = ref_det.prob_map_to_points_map(
                ts.clone(), prob_thresh=1.0, nms_dist=4, border_dist=4,
                use_fast_nms=True, top_k=top_k)
            ref_pos = ref_det.prob_map_to_positions_with_prob(
                ref_nms[:, None], threshold=0.0, ordering="yx")

            s = ops.remove_border_scores(jnp.asarray(score), 4)
            nms_map = ops.nms(s, 4, impl="xla")
            k = min(top_k, H * W)
            pos, valid = ops.select_topk_keypoints(nms_map, k, 1.0, "yx")

            ours = fixed_to_ragged(pos, valid)
            refs = ref_sorted(ref_pos)
            for o, r in zip(ours, refs):
                assert o.shape == r.shape, (top_k, o.shape, r.shape)
                np.testing.assert_allclose(o, r, atol=1e-6)

    def test_prob_map_low_threshold_is_a_floor(self, rng):
        """DOCUMENTED DIVERGENCE (dead config path): when prob_thresh <
        quantile_k the reference keeps EVERY NMS survivor above the
        threshold — top_k acts as a floor, not a cap
        (detector_util.py:125 `minimum(top_k_threshold, prob_thresh)`). No
        shipped config hits this (all use 1.0). Our fixed-K contract caps at
        K by construction; assert our set is the top-scoring subset."""
        B, H, W = 2, 48, 56
        score = rng.random((B, H, W)).astype(np.float32) ** 8
        ts = torch.from_numpy(score)[:, None]
        k = 32
        ref_nms = ref_det.prob_map_to_points_map(
            ts.clone(), prob_thresh=0.0005, nms_dist=4, border_dist=4,
            use_fast_nms=True, top_k=k)
        ref_pos = ref_det.prob_map_to_positions_with_prob(
            ref_nms[:, None], threshold=0.0, ordering="yx")

        s = ops.remove_border_scores(jnp.asarray(score), 4)
        nms_map = ops.nms(s, 4, impl="xla")
        pos, valid = ops.select_topk_keypoints(nms_map, k, 0.0005, "yx")
        for b in range(B):
            ref_set = {tuple(np.round(r[:2], 3)) for r in t2n(ref_pos[b])}
            our = np.asarray(pos[b])[np.asarray(valid[b])]
            assert len(ref_set) >= len(our)
            assert all(tuple(np.round(o[:2], 3)) in ref_set for o in our)
            # ours keeps exactly the k highest-scoring of the ref survivors
            ref_scores = np.sort(t2n(ref_pos[b])[:, 2])[::-1]
            np.testing.assert_allclose(np.sort(our[:, 2])[::-1],
                                       ref_scores[:len(our)], atol=1e-6)

    def test_depth_to_space(self, rng):
        B, h, w = 2, 6, 7
        logits = rng.normal(size=(B, 65, h, w)).astype(np.float32)
        tl = torch.from_numpy(logits)
        ref_prob = ref_det.logits_to_prob(tl, channel_dim=1)
        ref_score = ref_det.depth_to_space(ref_prob, cell_size=8)

        prob = ops.logits_to_prob(jnp.asarray(logits.transpose(0, 2, 3, 1)))
        score = ops.depth_to_space(prob, 8)
        np.testing.assert_allclose(nchw(prob), t2n(ref_prob), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(score), t2n(ref_score.squeeze(1)), atol=1e-6)

    def test_remove_border_and_nms(self, rng):
        B, H, W = 2, 40, 40
        score = (rng.random((B, H, W)).astype(np.float32)) ** 4
        ts = torch.from_numpy(score)[:, None]
        ref_b = ref_det.remove_border_points(ts.clone(), border_dist=3)
        ref_n = ref_det.fast_nms(ref_b, nms_dist=4)
        ours_b = ops.remove_border_scores(jnp.asarray(score), 3)
        ours_n = ops.nms(ours_b, 4, impl="xla")
        np.testing.assert_allclose(np.asarray(ours_b), t2n(ref_b.squeeze(1)),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(ours_n), t2n(ref_n.squeeze(1)),
                                   atol=0)

    def test_dense_positions(self, rng):
        B, H, W = 2, 12, 9
        score = rng.random((B, H, W)).astype(np.float32)
        ref_dp = ref_det.get_dense_positions(
            torch.from_numpy(score)[:, None], ordering="yx")
        from ei_nexus_tpu.ops.detector import dense_positions
        ours = dense_positions(jnp.asarray(score), "yx")
        np.testing.assert_allclose(np.asarray(ours), t2n(ref_dp), atol=1e-6)


class TestDescriptorPostprocParity:
    def test_sparsify_lowres(self, rng):
        B, D, h, w = 2, 16, 8, 9
        H, W = 64, 72
        raw = rng.normal(size=(B, D, h, w)).astype(np.float32)
        K = 20
        ys = rng.uniform(0, H, (B, K)).astype(np.float32)
        xs = rng.uniform(0, W, (B, K)).astype(np.float32)
        prob = rng.random((B, K)).astype(np.float32)
        pos = np.stack([ys, xs, prob], axis=-1)

        ref_positions = tuple(torch.from_numpy(pos[b]) for b in range(B))
        ref_out = ref_desc.sparsify_low_resolution_descriptors(
            torch.from_numpy(raw), ref_positions, (H, W),
            scale_factor=1.0, normalize=True)

        ours = ops.sample_descriptors_lowres(
            jnp.asarray(raw.transpose(0, 2, 3, 1)), jnp.asarray(pos),
            (H, W), 1.0, True, "yx")
        for b in range(B):
            np.testing.assert_allclose(np.asarray(ours[b]), t2n(ref_out[b]),
                                       atol=1e-5)

    def test_sparsify_fullres(self, rng):
        B, D, H, W = 2, 12, 32, 40
        raw = rng.normal(size=(B, D, H, W)).astype(np.float32)
        K = 15
        pos = np.stack([
            rng.uniform(0, H - 1, (B, K)), rng.uniform(0, W - 1, (B, K)),
            rng.random((B, K))], axis=-1).astype(np.float32)
        ref_positions = tuple(torch.from_numpy(pos[b]) for b in range(B))
        ref_out = ref_desc.sparsify_full_resolution_descriptors(
            torch.from_numpy(raw), ref_positions,
            scale_factor=1.0, normalize=True)
        ours = ops.sample_descriptors_fullres(
            jnp.asarray(raw.transpose(0, 2, 3, 1)), jnp.asarray(pos),
            1.0, True, "yx")
        for b in range(B):
            np.testing.assert_allclose(np.asarray(ours[b]), t2n(ref_out[b]),
                                       atol=1e-5)

    def test_upsample(self, rng):
        B, D, h, w = 2, 8, 7, 9
        H, W = 56, 72
        raw = rng.normal(size=(B, D, h, w)).astype(np.float32)
        ref_out = ref_desc.upsample_descriptors(
            torch.from_numpy(raw), (H, W), scale_factor=1.0)
        ours = ops.upsample_descriptors(
            jnp.asarray(raw.transpose(0, 2, 3, 1)), (H, W), 1.0)
        np.testing.assert_allclose(nchw(ours), t2n(ref_out), atol=1e-5)


def _port_and_run(ref_model, x, score_mask, cfg, **model_kw):
    """Port ref state dict -> run our flax extractor on the same input."""
    sd = {k: v for k, v in ref_model.state_dict().items()}
    variables = load_vgg_extractor_torch_weights(sd)
    model = VGGExtractor(config=cfg, **model_kw)
    mask_j = None if score_mask is None else jnp.asarray(
        t2n(score_mask).astype(bool)[:, 0])  # torch (B,1,H,W) -> (B,H,W)
    return model.apply(variables, jnp.asarray(t2n(x).transpose(0, 2, 3, 1)),
                       score_mask=mask_j)


def _assert_extractor_parity(ref_out, out, map_atol=5e-4, desc_atol=1e-3,
                             np_variant=False):
    np.testing.assert_allclose(nchw(out["logits"]), t2n(ref_out["logits"]),
                               atol=map_atol)
    np.testing.assert_allclose(
        nchw(out["raw_descriptors"]), t2n(ref_out["raw_descriptors"]),
        atol=map_atol)
    np.testing.assert_allclose(
        nchw(out["backbone_feats"]), t2n(ref_out["backbone_feats"]),
        atol=map_atol)
    np.testing.assert_allclose(
        nchw(out["probability"]), t2n(ref_out["probability"]), atol=map_atol)
    np.testing.assert_allclose(
        np.asarray(out["score"]), t2n(ref_out["score"].squeeze(1)),
        atol=map_atol)
    np.testing.assert_allclose(
        nchw(out["normalized_descriptors"]),
        t2n(ref_out["normalized_descriptors"]), atol=desc_atol)
    if not np_variant:
        np.testing.assert_allclose(
            nchw(out["coarse_descriptors"]),
            t2n(ref_out["coarse_descriptors"]), atol=desc_atol)

    # keypoint sets must match exactly (same pixels selected)
    ours = fixed_to_ragged(out["sparse_positions"], out["sparse_valid"],
                           out["sparse_descriptors"])
    refs = ref_sorted(ref_out["sparse_positions"],
                      ref_out["sparse_descriptors"])
    for (op_, od), (rp, rd) in zip(ours, refs):
        assert op_.shape == rp.shape, (op_.shape, rp.shape)
        np.testing.assert_allclose(op_[:, :2], rp[:, :2], atol=1e-6)
        np.testing.assert_allclose(op_[:, 2], rp[:, 2], atol=map_atol)
        np.testing.assert_allclose(od, rd, atol=desc_atol)


class TestVGGExtractorForwardParity:
    """The real reference VGGExtractor (cell=8) vs our ported flax model."""

    @pytest.mark.parametrize("size", [(64, 64), (60, 52)])
    def test_cell8(self, rng, size):
        H, W = size
        torch.manual_seed(3)
        ref = RefVGGExtractor(in_channels=4, feat_channels=32,
                              descriptor_dim=24, nms_radius=4,
                              detection_top_k=64,
                              detection_threshold=1.0).eval()
        x = torch.from_numpy(rng.normal(size=(2, 4, H, W)).astype(np.float32))
        with torch.no_grad():
            ref_out = ref(x)
        cfg = KeypointExtractorConfig(
            cell_size=8, nms_radius=4, detection_top_k=64,
            detection_threshold=1.0, remove_borders=4,
            sparse_desc_from="lowres", nms_impl="xla")
        out = _port_and_run(ref, x, None, cfg, feat_channels=32,
                            descriptor_dim=24, lat_channels=256)
        _assert_extractor_parity(ref_out, out)

    def test_cell8_with_event_mask(self, rng):
        H, W = 64, 64
        torch.manual_seed(4)
        ref = RefVGGExtractor(in_channels=4, feat_channels=32,
                              descriptor_dim=24, nms_radius=4,
                              detection_top_k=48, detection_threshold=1.0).eval()
        x = torch.from_numpy(rng.normal(size=(2, 4, H, W)).astype(np.float32))
        mask = torch.from_numpy(
            (rng.random((2, 1, H, W)) > 0.6))
        with torch.no_grad():
            ref_out = ref(x, score_mask=mask)
        cfg = KeypointExtractorConfig(
            cell_size=8, nms_radius=4, detection_top_k=48,
            detection_threshold=1.0, smooth_mask=True,
            sparse_desc_from="lowres", nms_impl="xla")
        out = _port_and_run(ref, x, mask, cfg, feat_channels=32,
                            descriptor_dim=24, lat_channels=256)
        _assert_extractor_parity(ref_out, out)

    def test_np_cell1(self, rng):
        """VGGExtractorNP: full-res backbone, sigmoid detector, fullres
        descriptor gather (EventExtractors.py:238)."""
        H, W = 40, 44
        torch.manual_seed(5)
        ref = RefVGGExtractorNP(in_channels=4, feat_channels=32,
                                descriptor_dim=24, nms_radius=4,
                                detection_top_k=64,
                                detection_threshold=1.0).eval()
        x = torch.from_numpy(rng.normal(size=(2, 4, H, W)).astype(np.float32))
        with torch.no_grad():
            ref_out = ref(x)
        cfg = KeypointExtractorConfig(
            cell_size=1, nms_radius=4, detection_top_k=64,
            detection_threshold=1.0, remove_borders=4,
            sparse_desc_from="fullres", nms_impl="xla")
        out = _port_and_run(ref, x, None, cfg, feat_channels=32,
                            descriptor_dim=24, lat_channels=256,
                            use_max_pooling=False)
        _assert_extractor_parity(ref_out, out, np_variant=True)

    def test_np_padding0_coord_remap(self, rng):
        """padding=0 NP variant: VALID convs + the +9px mapping_positions
        remap (EventExtractors.py:319-329) must be derived identically."""
        H, W = 48, 48
        torch.manual_seed(6)
        ref = RefVGGExtractorNP(in_channels=4, feat_channels=32,
                                descriptor_dim=24, nms_radius=4,
                                detection_top_k=64, padding=0,
                                detection_threshold=1.0).eval()
        x = torch.from_numpy(rng.normal(size=(1, 4, H, W)).astype(np.float32))
        # Latent reference bug in this config-dead path: filter_sparse_feats
        # returns *lists* but mapping_positions only handles *tuples*
        # (EventExtractors.py:319-329), so the stock padding=0 forward
        # crashes. Coerce to tuple (the evident intent) to run the oracle.
        orig_mapping = ref.mapping_positions
        ref.mapping_positions = lambda p: orig_mapping(
            tuple(p) if isinstance(p, list) else p)
        with torch.no_grad():
            ref_out = ref(x)
        cfg = KeypointExtractorConfig(
            cell_size=1, nms_radius=4, detection_top_k=64,
            detection_threshold=1.0, remove_borders=4,
            coord_offset=9.0, sparse_desc_from="fullres", nms_impl="xla")
        out = _port_and_run(ref, x, None, cfg, feat_channels=32,
                            descriptor_dim=24, lat_channels=256,
                            use_max_pooling=False, conv_padding="VALID")
        _assert_extractor_parity(ref_out, out, np_variant=True)
