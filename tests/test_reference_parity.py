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

    # keypoint sets must match (same pixels selected), except for
    # disagreements fully explained by near-TIED scores: NMS/top-k select
    # over conv maps that agree only to ~1 ulp between torch and XLA, so a
    # boundary pair with |score diff| < tie_tol can legitimately swap
    # (observed order-dependently in the full suite: 2-3 of 70 keypoints,
    # adjacent pixels, score gap < 1e-5). A real port bug shows up as a
    # disagreement with a LARGE score gap, which still fails.
    ours = fixed_to_ragged(out["sparse_positions"], out["sparse_valid"],
                           out["sparse_descriptors"])
    refs = ref_sorted(ref_out["sparse_positions"],
                      ref_out["sparse_descriptors"])
    for (op_, od), (rp, rd) in zip(ours, refs):
        assert op_.shape == rp.shape, (op_.shape, rp.shape)
        _assert_keypoint_set_parity(op_, od, rp, rd, map_atol, desc_atol)


def _assert_keypoint_set_parity(op_, od, rp, rd, map_atol, desc_atol,
                                tie_tol=1e-4):
    # tie_tol: observed boundary-swap score gaps are <1e-5 (torch-vs-XLA
    # conv maps agree to ~1 ulp); 1e-4 gives 10x slack over that without
    # letting a systematic port error at the selection boundary pass as
    # a "tie" (advisor round 3).
    okeys = [tuple(np.round(k, 3)) for k in op_[:, :2]]
    rkeys = [tuple(np.round(k, 3)) for k in rp[:, :2]]
    if okeys == rkeys:
        np.testing.assert_allclose(op_[:, :2], rp[:, :2], atol=1e-6)
        np.testing.assert_allclose(op_[:, 2], rp[:, 2], atol=map_atol)
        np.testing.assert_allclose(od, rd, atol=desc_atol)
        return
    oset, rset = set(okeys), set(rkeys)
    only_o, only_r = oset - rset, rset - oset
    # at most a handful of boundary swaps, equal counts each side.
    # Budget: observed disagreement is 2-3 of ~70 keypoints; max(3, n//24)
    # admits that while failing a regression that doubles the rate.
    assert len(only_o) == len(only_r), (sorted(only_o), sorted(only_r))
    assert len(only_o) <= max(3, len(rkeys) // 24), \
        (sorted(only_o), sorted(only_r))
    o_by_key = {k: i for i, k in enumerate(okeys)}
    r_by_key = {k: i for i, k in enumerate(rkeys)}
    if only_o:  # equal-but-reordered sets have no swaps to explain
        # every extra keypoint on one side must pair ONE-TO-ONE with a
        # score-tied missing keypoint on the other side (the pair that
        # swapped). For scalar scores the optimal one-to-one matching
        # under max-|diff| is the sorted pairing, so sort both sides by
        # score and compare elementwise — unlike a bipartite
        # nearest-score test this cannot let two spurious keypoints both
        # claim the same reference score (advisor round 3).
        o_scores = np.sort([op_[o_by_key[k], 2] for k in only_o])
        r_scores = np.sort([rp[r_by_key[k], 2] for k in only_r])
        assert np.abs(o_scores - r_scores).max() < tie_tol, \
            (o_scores, r_scores)
    # the agreeing majority must still match scores AND descriptors
    common = sorted(oset & rset)
    oi = [o_by_key[k] for k in common]
    ri = [r_by_key[k] for k in common]
    np.testing.assert_allclose(op_[oi, 2], rp[ri, 2], atol=map_atol)
    np.testing.assert_allclose(od[oi], rd[ri], atol=desc_atol)


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


# ---------------------------------------------------------------------------
# LightGlue vs the real reference matcher (lightglue.py:421)
# ---------------------------------------------------------------------------

from core.modules.matchers.lightglue import LightGlue as RefLightGlue

from ei_nexus_tpu.models.lightglue import (
    LightGlue as OurLightGlue, LightGlueConfig,
    load_lightglue_torch_weights, stack_lightglue_params)
from ei_nexus_tpu.losses.matcher_loss import lightglue_loss


def _lg_pair(rng, B, N, M, D, H=64, W=80):
    """Shared random inputs in both frameworks' formats (all slots valid)."""
    k0 = np.stack([rng.uniform(2, H - 2, (B, N)), rng.uniform(2, W - 2, (B, N)),
                   rng.random((B, N))], -1).astype(np.float32)
    k1 = np.stack([rng.uniform(2, H - 2, (B, M)), rng.uniform(2, W - 2, (B, M)),
                   rng.random((B, M))], -1).astype(np.float32)
    d0 = rng.normal(size=(B, N, D)).astype(np.float32)
    d1 = rng.normal(size=(B, M, D)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    size = np.tile(np.asarray([H, W], np.float32), (B, 1))
    ref0 = {"sparse_positions": torch.from_numpy(k0),
            "sparse_descriptors": torch.from_numpy(d0),
            "image_size": torch.from_numpy(size)}
    ref1 = {"sparse_positions": torch.from_numpy(k1),
            "sparse_descriptors": torch.from_numpy(d1),
            "image_size": torch.from_numpy(size)}
    ours0 = {"sparse_positions": jnp.asarray(k0),
             "sparse_descriptors": jnp.asarray(d0),
             "image_size": jnp.asarray(size)}
    ours1 = {"sparse_positions": jnp.asarray(k1),
             "sparse_descriptors": jnp.asarray(d1),
             "image_size": jnp.asarray(size)}
    return (ref0, ref1), (ours0, ours1)


def _ref_lightglue(n_layers=3, dim=32, heads=2, input_dim=None, seed=7):
    torch.manual_seed(seed)
    conf = reference_oracle.DictConfig({
        "input_dim": input_dim or dim, "descriptor_dim": dim,
        "n_layers": n_layers, "num_heads": heads, "flash": False,
        "filter_threshold": 0.0, "weights": None})
    return RefLightGlue(conf)


def _our_lightglue(ref, n_layers=3, dim=32, heads=2, input_dim=None,
                   scan_layers=False):
    cfg = LightGlueConfig(input_dim=input_dim or dim, descriptor_dim=dim,
                          n_layers=n_layers, num_heads=heads,
                          scan_layers=scan_layers)
    variables = load_lightglue_torch_weights(ref.state_dict(),
                                             n_layers=n_layers)
    if scan_layers:
        variables = {"params": stack_lightglue_params(variables["params"],
                                                      n_layers)}
    return OurLightGlue(config=cfg), variables


class TestLightGlueForwardParity:
    """Ported real reference weights -> identical matches + log assignment."""

    @pytest.mark.parametrize("scan_layers", [False, True])
    def test_eval_forward(self, rng, scan_layers):
        B, N, M, D = 2, 24, 20, 32
        ref = _ref_lightglue().eval()
        (r0, r1), (o0, o1) = _lg_pair(rng, B, N, M, D)
        with torch.no_grad():
            ref_out = ref(r0, r1)
        model, variables = _our_lightglue(ref, scan_layers=scan_layers)
        out = model.apply(variables, o0, o1)
        np.testing.assert_allclose(
            np.asarray(out["log_assignment"]), t2n(ref_out["log_assignment"]),
            atol=2e-3)
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      t2n(ref_out["matches0"]))
        np.testing.assert_array_equal(np.asarray(out["matches1"]),
                                      t2n(ref_out["matches1"]))
        np.testing.assert_allclose(np.asarray(out["matching_scores0"]),
                                   t2n(ref_out["matching_scores0"]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["matching_scores1"]),
                                   t2n(ref_out["matching_scores1"]), atol=1e-3)

    def test_input_proj(self, rng):
        """input_dim != descriptor_dim engages the Linear input projection."""
        B, N, M = 1, 16, 16
        ref = _ref_lightglue(input_dim=48).eval()
        (r0, r1), (o0, o1) = _lg_pair(rng, B, N, M, 48)
        with torch.no_grad():
            ref_out = ref(r0, r1)
        model, variables = _our_lightglue(ref, input_dim=48)
        out = model.apply(variables, o0, o1)
        np.testing.assert_allclose(
            np.asarray(out["log_assignment"]), t2n(ref_out["log_assignment"]),
            atol=2e-3)
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      t2n(ref_out["matches0"]))

    def test_training_deep_supervision_outputs(self, rng):
        """Our all-layer assignments == reference heads re-run on the saved
        per-layer descriptors (what LightGlue.loss:751 computes)."""
        B, N, M, D = 2, 18, 18, 32
        ref = _ref_lightglue().train()
        (r0, r1), (o0, o1) = _lg_pair(rng, B, N, M, D)
        with torch.no_grad():
            ref_out = ref(r0, r1)
        model, variables = _our_lightglue(ref)
        out = model.apply(variables, o0, o1, training=True)
        L = 3
        assert out["all_log_assignments"].shape == (B, L, N + 1, M + 1)
        for i in range(L):
            with torch.no_grad():
                la_i, _ = ref.log_assignment[i](
                    ref_out["ref_descriptors0"][:, i],
                    ref_out["ref_descriptors1"][:, i])
            np.testing.assert_allclose(
                np.asarray(out["all_log_assignments"][:, i]), t2n(la_i),
                atol=2e-3, err_msg=f"layer {i}")
        # confidence logits: token head pre-sigmoid on detached descriptors
        for i in range(L - 1):
            with torch.no_grad():
                logit0 = ref.token_confidence[i].token[0](
                    ref_out["ref_descriptors0"][:, i]).squeeze(-1)
            np.testing.assert_allclose(
                np.asarray(out["confidence_logits0"][:, i]), t2n(logit0),
                atol=2e-3)


class TestLightGlueLossParity:
    def test_training_loss(self, rng):
        """Full deep-supervision NLL + confidence BCE vs LightGlue.loss
        (train mode). N == M (the reference's nll_loss writes the column
        dustbin with :m, lightglue.py:133 — only square shapes are used by
        the pipeline, max_points_num on both sides)."""
        B, N, D, L = 2, 20, 32, 3
        ref = _ref_lightglue(seed=11).train()
        (r0, r1), (o0, o1) = _lg_pair(rng, B, N, N, D)
        with torch.no_grad():
            ref_pred = ref(r0, r1)

        # synthetic GT: a few positives on the diagonal, rest unmatched
        gt_m0 = np.full((B, N), -1, np.int64)
        gt_m1 = np.full((B, N), -1, np.int64)
        assign = np.zeros((B, N, N), bool)
        for b in range(B):
            pos = 2 + rng.choice(N - 2, size=6, replace=False)
            for j in pos:
                gt_m0[b, j] = j
                gt_m1[b, j] = j
                assign[b, j, j] = True
        # ignore (-2) labels exercise the "neither pos nor neg" weight rows
        gt_m0[:, 0] = -2
        gt_m1[:, 1] = -2
        data = {"gt_matches0": torch.from_numpy(gt_m0),
                "gt_matches1": torch.from_numpy(gt_m1),
                "gt_assignment": torch.from_numpy(assign)}
        with torch.no_grad():
            ref_losses, _ = ref.loss(ref_pred, data)

        model, variables = _our_lightglue(ref)
        out = model.apply(variables, o0, o1, training=True)
        gt = {"matches0": jnp.asarray(gt_m0), "matches1": jnp.asarray(gt_m1),
              "assignment": jnp.asarray(assign)}
        loss, metrics = lightglue_loss(out, gt, gamma=1.0, nll_balancing=0.5,
                                       training=True)
        np.testing.assert_allclose(float(loss),
                                   float(ref_losses["total"].mean()),
                                   atol=5e-4)
        np.testing.assert_allclose(float(metrics["matcher_confidence"]),
                                   float(ref_losses["confidence"].mean()),
                                   atol=5e-4)
        np.testing.assert_allclose(float(metrics["matcher_last"]),
                                   float(ref_losses["last"].mean()),
                                   atol=5e-4)
        np.testing.assert_allclose(float(metrics["matcher_row_norm"]),
                                   float(ref_losses["row_norm"].mean()),
                                   atol=5e-4)


# ---------------------------------------------------------------------------
# GT match generation vs the real reference (gt_generation.py:16)
# ---------------------------------------------------------------------------

from core.geometry import gt_generation as ref_gtgen
from core.geometry.wrappers import Camera as RefCamera, Pose as RefPose

from ei_nexus_tpu.geometry import (Camera, Pose, gt_matches_from_pose_depth)


def _scene(rng, B=2, N=40, M=36, H=48, W=64):
    """Random smooth positive depth + small relative motion."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth0 = np.stack([
        2.0 + 0.5 * np.sin(xx / 9.0 + b) * np.cos(yy / 7.0 - b)
        for b in range(B)]).astype(np.float32)
    depth1 = np.stack([
        2.1 + 0.4 * np.cos(xx / 8.0 - b) * np.sin(yy / 6.0 + b)
        for b in range(B)]).astype(np.float32)
    # a few invalid-depth holes
    depth0[:, 10:14, 20:26] = 0.0
    K = np.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    K = np.tile(K, (B, 1, 1))
    aa = rng.normal(size=(B, 3)).astype(np.float32) * 0.02
    t = rng.normal(size=(B, 3)).astype(np.float32) * 0.05
    kp0 = np.stack([rng.uniform(3, H - 3, (B, N)),
                    rng.uniform(3, W - 3, (B, N))], -1).astype(np.float32)
    kp1 = np.stack([rng.uniform(3, H - 3, (B, M)),
                    rng.uniform(3, W - 3, (B, M))], -1).astype(np.float32)
    return kp0, kp1, depth0, depth1, K, aa, t


class TestGtMatchesParity:
    @pytest.mark.parametrize("epi_th", [None, 5.0])
    def test_pose_depth(self, rng, epi_th):
        kp0, kp1, depth0, depth1, K, aa, t = _scene(rng)
        ref_cam = RefCamera.from_calibration_matrix(torch.from_numpy(K))
        ref_T01 = RefPose.from_aa(torch.from_numpy(aa), torch.from_numpy(t))
        ref_T10 = ref_T01.inv()
        ref_out = ref_gtgen.gt_matches_from_pose_depth(
            torch.from_numpy(kp0), torch.from_numpy(kp1),
            ref_cam, ref_cam, torch.from_numpy(depth0),
            torch.from_numpy(depth1), ref_T01, ref_T10,
            pos_th=3, neg_th=5, ordering="yx", epi_th=epi_th)

        cam = Camera.from_calibration_matrix(jnp.asarray(K))
        T01 = Pose.from_aa(jnp.asarray(aa), jnp.asarray(t))
        out = gt_matches_from_pose_depth(
            jnp.asarray(kp0), jnp.asarray(kp1), cam, cam,
            jnp.asarray(depth0), jnp.asarray(depth1), T01, T01.inv(),
            pos_th=3.0, neg_th=5.0, ordering="yx", epi_th=epi_th)

        np.testing.assert_array_equal(np.asarray(out["assignment"]),
                                      t2n(ref_out["assignment"]))
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      t2n(ref_out["matches0"]))
        np.testing.assert_array_equal(np.asarray(out["matches1"]),
                                      t2n(ref_out["matches1"]))
        np.testing.assert_array_equal(np.asarray(out["visible0"]),
                                      t2n(ref_out["visible0"]))
        np.testing.assert_array_equal(np.asarray(out["visible1"]),
                                      t2n(ref_out["visible1"]))
        np.testing.assert_allclose(np.asarray(out["depth_keypoints0"]),
                                   np.nan_to_num(t2n(ref_out["depth_keypoints0"])),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["proj_0to1"]),
                                   t2n(ref_out["proj_0to1"]), atol=1e-3)


# ---------------------------------------------------------------------------
# Full EIM pipeline vs the real reference (EIM.py:13) on shared weights
# ---------------------------------------------------------------------------


class TestEIMEndToEndParity:
    """Reference EIM (vgg events + SuperPointv1 image + 3-layer LightGlue)
    with random weights, ported wholesale into our flax EIM. Our slots are
    score-ordered while the reference's are row-major (both orderings are
    valid; LightGlue is permutation-equivariant over slots), so outputs are
    compared through the position-matching permutation."""

    def _ref_conf(self):
        return reference_oracle.DictConfig({
            "name": "EDM",
            "pretrain_stage1": {"model_path": None},
            "pretrain_stage2": {"model_path": None},
            "event_extractor": {
                "type": "vgg", "freeze": True,
                "vgg": {"in_channels": 4, "feat_channels": 32,
                        "descriptor_dim": 256, "nms_radius": 4,
                        "detection_threshold": 1.0, "detection_top_k": 64,
                        "remove_borders": 4, "ordering": "yx",
                        "descriptor_scale_factor": 1.0,
                        "learnable_descriptor_scale_factor": False,
                        "use_batchnorm": True}},
            "image_extractor": {
                "type": "superpointv1", "freeze": True,
                "superpointv1": {"descriptor_dim": 256, "nms_radius": 4,
                                 "detection_threshold": 1.0,
                                 "detection_top_k": 64, "remove_borders": 4,
                                 "ordering": "yx",
                                 "descriptor_scale_factor": 1.0,
                                 "learnable_descriptor_scale_factor": False}},
            "matcher": {
                "type": "LightGlue", "freeze": False, "max_points_num": 64,
                "pad_mode": "random", "desc_scale_factor": 1.0,
                "MNN": {"ratio_thresh": False, "distance_thresh": False},
                "LightGlue": {"input_dim": 256, "descriptor_dim": 256,
                              "n_layers": 3, "num_heads": 4, "flash": False,
                              "filter_threshold": 0.0, "weights": None}},
        })

    def test_full_pipeline(self, rng, monkeypatch):
        import torch.hub
        monkeypatch.setattr(
            torch.hub, "load_state_dict_from_url",
            lambda url, **kw: reference_oracle.random_superpoint_state_dict())
        from core.modules.EIM import EIM as RefEIM

        torch.manual_seed(20)
        ref = RefEIM(self._ref_conf(), device="cpu")

        B, H, W, K = 2, 128, 128, 64
        events = rng.normal(size=(B, 4, H, W)).astype(np.float32)
        image = rng.uniform(0, 255, (B, 1, H, W)).astype(np.float32)
        with torch.no_grad():
            ref_ev, ref_im, ref_m = ref(torch.from_numpy(events),
                                        torch.from_numpy(image.copy()))

        # ---- ours on the ported state dict ----
        from ei_nexus_tpu.models import EIM as OurEIM, EIMConfig
        from ei_nexus_tpu.models.eim import (ExtractorSpec, MatcherConfig,
                                             KeypointExtractorConfig as KCfg)
        from ei_nexus_tpu.models.lightglue import LightGlueConfig
        from ei_nexus_tpu.models.port_torch import load_eim_torch_checkpoint

        kev = KCfg(cell_size=8, nms_radius=4, detection_top_k=K,
                   detection_threshold=1.0, remove_borders=4,
                   sparse_desc_from="lowres", nms_impl="xla")
        cfg = EIMConfig(
            event_extractor=ExtractorSpec(
                type="vgg", freeze=True, in_channels=4, feat_channels=32,
                descriptor_dim=256, lat_channels=256, keypoints=kev),
            image_extractor=ExtractorSpec(
                type="superpointv1", freeze=True, descriptor_dim=256,
                keypoints=kev),
            matcher=MatcherConfig(
                type="LightGlue", freeze=False, max_points_num=K,
                lightglue=LightGlueConfig(input_dim=256, descriptor_dim=256,
                                          n_layers=3, num_heads=4)))
        variables = load_eim_torch_checkpoint(
            {k: v for k, v in ref.state_dict().items()},
            n_lightglue_layers=3)
        model = OurEIM(config=cfg)
        out_ev, out_im, out_m = model.apply(
            variables, jnp.asarray(events.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)))
        _compare_eim_outputs(ref_ev, ref_im, ref_m,
                             out_ev, out_im, out_m, B, K)


def _compare_eim_outputs(ref_ev, ref_im, ref_m, out_ev, out_im, out_m,
                         B, K):
    """Full-EIM forward equality through the slot permutation (shared by
    the in-memory state-dict port test and the on-disk .pth ingest test)."""
    if True:
        # every slot must be genuinely detected (no random fill in play)
        assert bool(np.asarray(out_ev["sparse_valid"]).all())
        assert bool(np.asarray(out_im["sparse_valid"]).all())
        for b in range(B):
            assert ref_ev["sparse_positions"][b].shape[0] == K
            assert ref_im["sparse_positions"][b].shape[0] == K

        # keypoint sets identical
        for ours, refs in ((out_ev, ref_ev), (out_im, ref_im)):
            o = fixed_to_ragged(ours["sparse_positions"],
                                ours["sparse_valid"])
            r = ref_sorted(refs["sparse_positions"])
            for ob, rb in zip(o, r):
                np.testing.assert_allclose(ob[:, :2], rb[:, :2], atol=1e-6)

        # per-sample permutation: ref slot j -> our slot perm[j]
        def slot_perm(ref_pos, our_pos):
            r = t2n(ref_pos)[:, :2]
            o = np.asarray(our_pos)[:, :2]
            d = np.abs(r[:, None, :] - o[None, :, :]).sum(-1)
            perm = d.argmin(1)
            assert (d[np.arange(len(r)), perm] < 1e-4).all()
            assert len(set(perm.tolist())) == len(r)  # bijection
            return perm

        la_ours = np.asarray(out_m["log_assignment"])
        for b in range(B):
            p0 = slot_perm(ref_m["input_feats0"]["sparse_positions"][b],
                           out_ev["sparse_positions"][b])
            p1 = slot_perm(ref_m["input_feats1"]["sparse_positions"][b],
                           out_im["sparse_positions"][b])
            ref_la = t2n(ref_m["log_assignment"][b])
            ours_la = la_ours[b][np.concatenate([p0, [K]])][:,
                                 np.concatenate([p1, [K]])]
            np.testing.assert_allclose(ours_la, ref_la, atol=5e-3)

            ref_m0 = t2n(ref_m["matches0"][b])
            our_m0 = np.asarray(out_m["matches0"][b])
            inv1 = np.empty(K, np.int64)
            inv1[p1] = np.arange(K)
            for j in range(K):
                if ref_m0[j] == -1:
                    assert our_m0[p0[j]] == -1, j
                else:
                    assert inv1[our_m0[p0[j]]] == ref_m0[j], j


class TestCheckpointFileIngestParity:
    """The whole on-disk chain: a stage-2 .pth in the reference's exact
    released-checkpoint layout (torch.save(EIM.state_dict()), what
    test_events-image_different_time.py:156 loads) -> models.port_torch
    file ingest -> full-EIM forward equality -> both RPE backends fed each
    side's own matched keypoints. Also proves the synthesized layout is
    the one the reference's OWN stage-surgery consumes (EIM.py:29-42)."""

    def test_stage2_pth_roundtrip(self, rng, tmp_path, monkeypatch):
        import torch.hub
        monkeypatch.setattr(
            torch.hub, "load_state_dict_from_url",
            lambda url, **kw: reference_oracle.random_superpoint_state_dict())
        from core.modules.EIM import EIM as RefEIM

        conf = TestEIMEndToEndParity()._ref_conf()
        torch.manual_seed(20)
        ref = RefEIM(conf, device="cpu")
        path = str(tmp_path / "MVSEC_EI_SP_LG_ft_Stage2.pth")
        torch.save(ref.state_dict(), path)

        # --- the reference's own surgery path accepts this exact file ---
        # (EIM.py:29-35 strips "event_extractor." [16 chars] for stage-1,
        # :36-42 strips "matcher." [8 chars] for stage-2)
        conf2 = TestEIMEndToEndParity()._ref_conf()
        conf2["pretrain_stage1"] = reference_oracle.DictConfig(
            {"model_path": path})
        conf2["pretrain_stage2"] = reference_oracle.DictConfig(
            {"model_path": path})
        torch.manual_seed(99)  # different init; surgery must overwrite it
        ref2 = RefEIM(conf2, device="cpu")
        sd, sd2 = ref.state_dict(), ref2.state_dict()
        for k in sd:
            if k.startswith(("event_extractor.", "matcher.")):
                assert torch.equal(sd[k], sd2[k]), k

        # --- our file-ingest path onto an init'd model ---
        from ei_nexus_tpu.models import EIM as OurEIM, EIMConfig
        from ei_nexus_tpu.models.eim import (ExtractorSpec, MatcherConfig,
                                             KeypointExtractorConfig as KCfg)
        from ei_nexus_tpu.models.lightglue import LightGlueConfig
        from ei_nexus_tpu.models.port_torch import load_eim_checkpoint_file

        B, H, W, K = 2, 128, 128, 64
        kev = KCfg(cell_size=8, nms_radius=4, detection_top_k=K,
                   detection_threshold=1.0, remove_borders=4,
                   sparse_desc_from="lowres", nms_impl="xla")
        cfg = EIMConfig(
            event_extractor=ExtractorSpec(
                type="vgg", freeze=True, in_channels=4, feat_channels=32,
                descriptor_dim=256, lat_channels=256, keypoints=kev),
            image_extractor=ExtractorSpec(
                type="superpointv1", freeze=True, descriptor_dim=256,
                keypoints=kev),
            matcher=MatcherConfig(
                type="LightGlue", freeze=False, max_points_num=K,
                lightglue=LightGlueConfig(input_dim=256,
                                          descriptor_dim=256,
                                          n_layers=3, num_heads=4)))
        events = rng.normal(size=(B, 4, H, W)).astype(np.float32)
        image = rng.uniform(0, 255, (B, 1, H, W)).astype(np.float32)
        model = OurEIM(config=cfg)
        init_vars = model.init(
            {"params": jax.random.PRNGKey(5)},
            jnp.asarray(events.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)))
        variables = load_eim_checkpoint_file(
            path, init_vars, n_lightglue_layers=3)

        with torch.no_grad():
            ref_ev, ref_im, ref_m = ref(torch.from_numpy(events),
                                        torch.from_numpy(image.copy()))
        out_ev, out_im, out_m = model.apply(
            variables, jnp.asarray(events.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)))
        _compare_eim_outputs(ref_ev, ref_im, ref_m,
                             out_ev, out_im, out_m, B, K)

        # --- RPE-eval chain on each side's OWN matched keypoints ---
        # matched-pair lists come out in different slot orders (ours is
        # score-ordered), and cv2 RANSAC's pinned hypothesis stream is
        # order-sensitive, so canonically sort both sides by kp0 before
        # estimating. The matched SETS must agree exactly first.
        from ei_nexus_tpu.train.evaluate import _matched_pairs
        from ei_nexus_tpu.metrics import RelativePoseEstimation
        b = 0
        ours0, ours1 = _matched_pairs(
            {"matches0": np.asarray(out_m["matches0"])},
            {"sparse_positions": np.asarray(out_ev["sparse_positions"])},
            {"sparse_positions": np.asarray(out_im["sparse_positions"])},
            b)
        # NOT ref_m["matched_kpts0"]: the reference returns those in
        # NORMALIZED coordinates when b > 1 (lightglue.py:675-688 gathers
        # from the normalized kpts0; only the b == 1 branch uses
        # origin_kpts) — a reference quirk its own batch-1 eval never
        # hits. Gather pixel-space pairs from matches0 + input_feats.
        rm0 = t2n(ref_m["matches0"][b]).astype(int)
        rkp0 = t2n(ref_m["input_feats0"]["sparse_positions"][b])
        rkp1 = t2n(ref_m["input_feats1"]["sparse_positions"][b])
        rsel = rm0 > -1
        ref0, ref1 = rkp0[rsel], rkp1[rm0[rsel]]

        def canon(k0, k1):
            k0, k1 = k0[:, :2], k1[:, :2]
            order = np.lexsort((k0[:, 1], k0[:, 0]))
            return k0[order], k1[order]

        o0, o1 = canon(ours0, ours1)
        r0, r1 = canon(ref0, ref1)
        assert len(o0) == len(r0)
        np.testing.assert_allclose(o0, r0, atol=1e-5)
        np.testing.assert_allclose(o1, r1, atol=1e-5)
        if len(o0) < 8:
            # random-weight LightGlue yields few mutual matches; keep the
            # RPE leg exercised by pairing the (already-proven-identical)
            # keypoint sets index-wise on both sides
            def canon_set(kp):
                kp = np.asarray(kp)[:, :2]
                return kp[np.lexsort((kp[:, 1], kp[:, 0]))]

            o0 = r0 = canon_set(out_ev["sparse_positions"][b])
            o1 = r1 = canon_set(out_im["sparse_positions"][b])
        if True:
            Kmat = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2],
                             [0, 0, 1]], np.float32)
            # nonzero GT motion: zero translation makes the angular
            # t-error undefined (ref nan vs our 90-deg clamp)
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [0.2, 0.1, 0.05]
            refm = RefRPE("RPE", [5, 10, 20], ransac_thresh=1.0,
                          ordering="yx")
            cv2.setRNGSeed(11)
            r = refm.update_one(torch.from_numpy(r0), torch.from_numpy(r1),
                                torch.from_numpy(Kmat),
                                torch.from_numpy(Kmat),
                                torch.from_numpy(T))
            ourm = RelativePoseEstimation("RPE", [5, 10, 20],
                                          ransac_thresh=1.0, ordering="yx",
                                          backend="opencv")
            cv2.setRNGSeed(11)
            o = ourm.update_one(o0, o1, Kmat, Kmat, T)
            for k in ("RPE_R_errs", "RPE_t_errs", "RPE_inliers"):
                np.testing.assert_allclose(o[k], r[k], atol=1e-4,
                                           err_msg=k)

    def _ref_conf_ec(self):
        """The EC/SiLK-family shape of the released checkpoints
        (ref configs/model/test/EI_SiLK_LG.yaml: vgg_np event extractor,
        SiLK image extractor, 128-d descriptors into LightGlue's
        input_proj) at test scale."""
        return reference_oracle.DictConfig({
            "name": "EDM",
            "pretrain_stage1": {"model_path": None},
            "pretrain_stage2": {"model_path": None},
            "event_extractor": {
                "type": "vgg_np", "freeze": True,
                "vgg_np": {"in_channels": 4, "feat_channels": 32,
                           "descriptor_dim": 128, "nms_radius": 4,
                           "detection_threshold": 1.0,
                           "detection_top_k": 48, "remove_borders": 4,
                           "ordering": "yx",
                           "descriptor_scale_factor": 1.41,
                           "learnable_descriptor_scale_factor": False,
                           "use_batchnorm": True, "padding": 1}},
            "image_extractor": {
                "type": "silk", "freeze": True,
                "silk": {"padding": 1, "nms_radius": 4,
                         "detection_threshold": 1.0,
                         "detection_top_k": 48, "remove_borders": 4,
                         "descriptor_scale_factor": 1.41}},
            "matcher": {
                "type": "LightGlue", "freeze": False,
                "max_points_num": 48, "pad_mode": "random",
                "desc_scale_factor": 1.0,
                "MNN": {"ratio_thresh": False, "distance_thresh": False},
                "LightGlue": {"input_dim": 128, "descriptor_dim": 256,
                              "n_layers": 3, "num_heads": 4,
                              "flash": False, "filter_threshold": 0.0,
                              "weights": None}},
        })

    def test_ec_silk_stage2_pth_roundtrip(self, rng, tmp_path):
        """EC-shaped released checkpoint (e.g. EC_EI_SiLK_LG_ft_Stage2.pth:
        vgg_np + SiLK + LightGlue input_dim=128) -> on-disk .pth ->
        load_eim_checkpoint_file -> full-EIM forward equality. With this,
        BOTH datasets' released-checkpoint eval parity is a one-liner the
        day real blobs are available (ref EIM.py:29-42 surgery;
        silk/config/model.py:19-80 loader semantics)."""
        # the SiLK blob is stripped from the snapshot: bypass the ckpt
        # load inside the reference's SiLKModel ctor (weights stay at
        # torch random init, which is exactly what we serialize below)
        orig = ref_silk_mod.load_model_from_checkpoint
        ref_silk_mod.load_model_from_checkpoint = \
            lambda model, **kw: model.eval()
        try:
            from core.modules.EIM import EIM as RefEIM
            torch.manual_seed(41)
            ref = RefEIM(self._ref_conf_ec(), device="cpu")
        finally:
            ref_silk_mod.load_model_from_checkpoint = orig
        path = str(tmp_path / "EC_EI_SiLK_LG_ft_Stage2.pth")
        torch.save(ref.state_dict(), path)

        from ei_nexus_tpu.models import EIM as OurEIM, EIMConfig
        from ei_nexus_tpu.models.eim import (ExtractorSpec, MatcherConfig,
                                             KeypointExtractorConfig as
                                             KCfg)
        from ei_nexus_tpu.models.lightglue import LightGlueConfig
        from ei_nexus_tpu.models.port_torch import load_eim_checkpoint_file

        # 128x160 / K=48: the torch-seeded random inits yield only ~60
        # surviving NMS maxima per side at smaller frames — keep K safely
        # below that so every slot is genuinely detected on both sides
        B, H, W, K = 2, 128, 160, 48
        kev = KCfg(cell_size=1, nms_radius=4, detection_top_k=K,
                   detection_threshold=1.0, remove_borders=4,
                   sparse_desc_from="fullres", nms_impl="xla",
                   descriptor_scale_factor=1.41)
        cfg = EIMConfig(
            event_extractor=ExtractorSpec(
                type="vgg_np", freeze=True, in_channels=4,
                feat_channels=32, descriptor_dim=128, padding=1,
                keypoints=kev),
            image_extractor=ExtractorSpec(
                type="silk", freeze=True, padding=1, keypoints=kev),
            matcher=MatcherConfig(
                type="LightGlue", freeze=False, max_points_num=K,
                lightglue=LightGlueConfig(input_dim=128,
                                          descriptor_dim=256,
                                          n_layers=3, num_heads=4)))
        events = rng.normal(size=(B, 4, H, W)).astype(np.float32)
        image = rng.uniform(0, 255, (B, 1, H, W)).astype(np.float32)
        model = OurEIM(config=cfg)
        init_vars = model.init(
            {"params": jax.random.PRNGKey(5)},
            jnp.asarray(events.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)))
        variables = load_eim_checkpoint_file(
            path, init_vars, image_extractor_type="silk",
            n_lightglue_layers=3)

        with torch.no_grad():
            ref_ev, ref_im, ref_m = ref(torch.from_numpy(events),
                                        torch.from_numpy(image.copy()))
        out_ev, out_im, out_m = model.apply(
            variables, jnp.asarray(events.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)))
        _compare_eim_outputs(ref_ev, ref_im, ref_m,
                             out_ev, out_im, out_m, B, K)

    def test_silk_lightning_ckpt_file(self, rng, tmp_path):
        """The released pvgg-4.ckpt layout ({"state_dict": {"_mods.model.
        ..."}}; silk/config/model.py:19-80 + silk_extractor.py:167-174)
        round-trips through load_silk_lightning_file to forward parity."""
        from ei_nexus_tpu.models.port_torch import load_silk_lightning_file

        ref = _ref_silk(padding=1, top_k=64, seed=31)
        ckpt = {"state_dict": {"_mods.model." + k: v for k, v in
                               ref.model.state_dict().items()},
                "epoch": 0, "global_step": 0}
        path = str(tmp_path / "pvgg-4.ckpt")
        torch.save(ckpt, path)

        variables = load_silk_lightning_file(path)
        H, W = 72, 96
        x = rng.uniform(0, 255, (1, 1, H, W)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        cfg = KeypointExtractorConfig(
            cell_size=1, nms_radius=4, detection_top_k=64,
            detection_threshold=1.0, remove_borders=4,
            descriptor_scale_factor=1.41, sparse_desc_from="fullres",
            smooth_mask=False, nms_impl="xla")
        ours = OurSiLK(config=cfg, conv_padding="SAME")
        out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            nchw(out["normalized_descriptors"]),
            t2n(ref_out["normalized_descriptors"]), atol=5e-4)
        o = fixed_to_ragged(out["sparse_positions"], out["sparse_valid"])
        r = ref_sorted(ref_out["sparse_positions"])
        for ob, rb in zip(o, r):
            _assert_keypoint_set_parity(
                ob, np.zeros((len(ob), 1)), rb, np.zeros((len(rb), 1)),
                5e-4, 1.0)


# ---------------------------------------------------------------------------
# SiLK vs the real reference image extractor (silk_extractor.py:78 wrapping
# the vendored SiLKVGG, silk/backbones/silk/silk.py:85)
# ---------------------------------------------------------------------------

import core.modules.image_extractors.silk_extractor as ref_silk_mod
from ei_nexus_tpu.models.silk import (SiLKVGG as OurSiLK,
                                      load_silk_torch_weights)


def _ref_silk(padding: int, top_k: int = 64, seed: int = 11):
    """The ACTUAL reference SiLKModel, checkpoint loading bypassed (the
    pvgg-4.ckpt blob is stripped from the snapshot) so weights stay at
    torch's random init."""
    orig = ref_silk_mod.load_model_from_checkpoint
    ref_silk_mod.load_model_from_checkpoint = \
        lambda model, **kw: model.eval()
    try:
        torch.manual_seed(seed)
        ref = ref_silk_mod.SiLKModel(
            device="cpu", padding=padding, nms_radius=4,
            detection_top_k=top_k, detection_threshold=1.0,
            remove_borders=4,
            # the config value (configs/model/SiLK_MNN.yaml silk:
            # descriptor_scale_factor: 1.41) — the ctor default is 1.0
            descriptor_scale_factor=1.41).eval()
    finally:
        ref_silk_mod.load_model_from_checkpoint = orig
    return ref


class TestSiLKForwardParity:
    """Real reference SiLK forward vs our flax port: verifies the REAL
    checkpoint key layout (backbone._backbone.layers...,
    backbone._heads._mods.{logits,raw_descriptors}...), the /255 input
    normalization (silk_extractor.py forward), the conv->relu->BN block
    order, and the full cell-1 postprocessing."""

    def test_padding1(self, rng):
        H, W = 48, 56
        ref = _ref_silk(padding=1)
        x = torch.from_numpy(
            (rng.random((2, 1, H, W)) * 255).astype(np.float32))
        with torch.no_grad():
            ref_out = ref(x)

        variables = load_silk_torch_weights(ref.model.state_dict())
        cfg = KeypointExtractorConfig(
            cell_size=1, nms_radius=4, detection_top_k=64,
            detection_threshold=1.0, remove_borders=4,
            descriptor_scale_factor=1.41, sparse_desc_from="fullres",
            smooth_mask=False, nms_impl="xla")
        model = OurSiLK(config=cfg, conv_padding="SAME")
        out = model.apply(variables,
                          jnp.asarray(t2n(x).transpose(0, 2, 3, 1)))
        _assert_extractor_parity(ref_out, out, np_variant=True)

    def test_padding0_plus9_remap(self, rng):
        """padding=0 (VALID convs): the score map shrinks by 9 px per side
        and the reference remaps positions by +9 (mapping_positions,
        silk_extractor.py:146-153). Our cfg expresses the same via
        coord_offset=9 on the VALID-conv model.

        The reference's own padding=0 path is bit-rotted: mapping_positions
        type-checks `tuple` but unpad_positions hands it a LIST, so it
        crashes indexing `list[..., 0]`. Patch it minimally to its intended
        semantics (treat lists like tuples) to obtain the oracle output."""
        H, W = 48, 56
        ref = _ref_silk(padding=0)
        orig_map = ref_silk_mod.SiLKModel.mapping_positions

        def mapping_fixed(self, positions):
            if isinstance(positions, list):
                positions = tuple(positions)
            return orig_map(self, positions)

        ref_silk_mod.SiLKModel.mapping_positions = mapping_fixed
        try:
            x = torch.from_numpy(
                (rng.random((2, 1, H, W)) * 255).astype(np.float32))
            with torch.no_grad():
                ref_out = ref(x)
        finally:
            ref_silk_mod.SiLKModel.mapping_positions = orig_map

        variables = load_silk_torch_weights(ref.model.state_dict())
        cfg = KeypointExtractorConfig(
            cell_size=1, nms_radius=4, detection_top_k=64,
            detection_threshold=1.0, remove_borders=4,
            descriptor_scale_factor=1.41, sparse_desc_from="fullres",
            smooth_mask=False, nms_impl="xla", coord_offset=9.0)
        model = OurSiLK(config=cfg, conv_padding="VALID")
        out = model.apply(variables,
                          jnp.asarray(t2n(x).transpose(0, 2, 3, 1)))
        # map-level comparisons on the SHRUNK grid
        np.testing.assert_allclose(nchw(out["logits"]),
                                   t2n(ref_out["logits"]), atol=5e-4)
        np.testing.assert_allclose(nchw(out["normalized_descriptors"]),
                                   t2n(ref_out["normalized_descriptors"]),
                                   atol=1e-3)
        # keypoint sets (remapped coordinates) must match exactly
        ours = fixed_to_ragged(out["sparse_positions"], out["sparse_valid"],
                               out["sparse_descriptors"])
        refs = ref_sorted(ref_out["sparse_positions"],
                          ref_out["sparse_descriptors"])
        for (op_, od), (rp, rd) in zip(ours, refs):
            assert op_.shape == rp.shape, (op_.shape, rp.shape)
            np.testing.assert_allclose(op_[:, :2], rp[:, :2], atol=1e-6)
            np.testing.assert_allclose(od, rd, atol=1e-3)


# ---------------------------------------------------------------------------
# MNN matcher vs the real reference (core/modules/matchers/MNN.py:35)
# ---------------------------------------------------------------------------

from core.modules.matchers.MNN import NearestNeighborMatcher as RefMNN
from ei_nexus_tpu.models.mnn import mnn_match


class TestMNNParity:
    """find_nn / mutual_check / log-assignment vs the real reference, on
    identical descriptor sets (all slots valid: the reference has no
    masking; our mask path is exercised by the fixed-K model tests)."""

    def _feats(self, rng, B, N, M, D=32):
        def side(k):
            d = rng.normal(size=(B, k, D)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            p = np.concatenate(
                [rng.uniform(0, 64, (B, k, 2)),
                 rng.random((B, k, 1))], -1).astype(np.float32)
            return d, p
        d0, p0 = side(N)
        d1, p1 = side(M)
        # plant near-identical correspondences so every sample has matches
        # under any threshold config — the REFERENCE crashes on zero-match
        # samples (MNN.py:113 stack of an empty list)
        n_plant = min(N, M) // 3
        d1[:, :n_plant] = d0[:, :n_plant] + 0.02 * rng.normal(
            size=(B, n_plant, D)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        return d0, p0, d1, p1

    @pytest.mark.parametrize("ratio,dist", [(None, None), (0.95, None),
                                            (None, 0.7), (0.9, 1.2)])
    def test_matches_and_assignment(self, rng, ratio, dist):
        B, N, M = 3, 40, 56
        d0, p0, d1, p1 = self._feats(rng, B, N, M)
        ref = RefMNN(ratio_thresh=ratio, distance_thresh=dist,
                     mutual_check=True)
        with torch.no_grad():
            ref_out = ref({"sparse_descriptors": torch.from_numpy(d0),
                           "sparse_positions": torch.from_numpy(p0)},
                          {"sparse_descriptors": torch.from_numpy(d1),
                           "sparse_positions": torch.from_numpy(p1)})
        out = mnn_match(
            {"sparse_descriptors": jnp.asarray(d0),
             "sparse_positions": jnp.asarray(p0)},
            {"sparse_descriptors": jnp.asarray(d1),
             "sparse_positions": jnp.asarray(p1)},
            ratio_thresh=ratio, distance_thresh=dist, mutual_check=True)
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      t2n(ref_out["matches0"]))
        np.testing.assert_array_equal(np.asarray(out["matches1"]),
                                      t2n(ref_out["matches1"]))
        np.testing.assert_allclose(np.asarray(out["matching_scores0"]),
                                   t2n(ref_out["matching_scores0"]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["similarity"]),
                                   t2n(ref_out["similarity"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["log_assignment"]),
                                   t2n(ref_out["log_assignment"]),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# Stage-1 distillation losses vs the real reference (core/loss/extractor_loss.py)
# ---------------------------------------------------------------------------

from core.loss.extractor_loss import (ScoreLoss as RefScoreLoss,
                                      LogitsLoss as RefLogitsLoss,
                                      DescriptorsLoss as RefDescriptorsLoss,
                                      FeatureLoss as RefFeatureLoss)
from ei_nexus_tpu.losses.extractor_loss import (
    score_loss, logits_loss, descriptors_loss, feature_loss)


class TestExtractorLossParity:
    """Every stage-1 loss mode vs the real reference classes on shared
    random inputs (NCHW for torch, NHWC for us)."""

    def _maps(self, rng, B=2, H=24, W=32, C=8):
        score = rng.random((B, 1, H, W)).astype(np.float32)
        gt_score = rng.random((B, 1, H, W)).astype(np.float32)
        desc = rng.normal(size=(B, C, H, W)).astype(np.float32)
        gt_desc = rng.normal(size=(B, C, H, W)).astype(np.float32)
        mask = (rng.random((B, 1, H, W)) > 0.4)
        return score, gt_score, desc, gt_desc, mask

    @staticmethod
    def _nhwc(a):
        return jnp.asarray(a.transpose(0, 2, 3, 1))

    @pytest.mark.parametrize("mode", ["mse", "mae", "bce", "mse-whole"])
    def test_score_loss(self, rng, mode):
        score, gt_score, _, _, mask = self._maps(rng)
        ref = RefScoreLoss(weight=2.0, mode=mode, use_mask=True)
        rl, _ = ref({"score": torch.from_numpy(score.copy())},
                    {"score": torch.from_numpy(gt_score.copy())},
                    mask=torch.from_numpy(mask.copy()))
        ol, _ = score_loss({"score": jnp.asarray(score[:, 0])},
                           {"score": jnp.asarray(gt_score[:, 0])},
                           mask=jnp.asarray(mask[:, 0]), mode=mode,
                           weight=2.0)
        np.testing.assert_allclose(float(ol), float(rl), rtol=1e-5)

    def test_logits_loss(self, rng):
        B, h, w = 2, 4, 5
        logits = rng.normal(size=(B, 65, h, w)).astype(np.float32)
        gt_logits = rng.normal(size=(B, 65, h, w)).astype(np.float32)
        mask = (rng.random((B, 1, 8 * h, 8 * w)) > 0.4)
        ref = RefLogitsLoss(weight=1.5, mode="mse", cell_size=8)
        rl, _ = ref({"logits": torch.from_numpy(logits)},
                    {"logits": torch.from_numpy(gt_logits)},
                    mask=torch.from_numpy(mask))
        ol, _ = logits_loss({"logits": self._nhwc(logits)},
                            {"logits": self._nhwc(gt_logits)},
                            mask=jnp.asarray(mask[:, 0]), cell_size=8,
                            weight=1.5)
        np.testing.assert_allclose(float(ol), float(rl), rtol=1e-5)

    @pytest.mark.parametrize("mode,use_mask", [
        ("mse", True), ("mae", True), ("triplet", True),
        # the reference's MASKED cosine/dual-softmax paths crash (forward
        # repeats the mask to C channels, then those modes view/index it as
        # (B, H*W) — extractor_loss.py:271-272 vs :315/:181); no shipped
        # config uses them, so parity is asserted unmasked
        ("cosine_similarity", False), ("dual-softmax", False)])
    def test_descriptors_loss(self, rng, mode, use_mask):
        _, _, desc, gt_desc, mask = self._maps(rng, H=12, W=14)
        ref = RefDescriptorsLoss(weight=1.0, desc_type="normalized",
                                 mode=mode, use_mask=use_mask)
        rl, _ = ref({"normalized_descriptors": torch.from_numpy(desc)},
                    {"normalized_descriptors": torch.from_numpy(gt_desc)},
                    mask=torch.from_numpy(mask.astype(np.float32))
                    if use_mask else None)
        ol, _ = descriptors_loss(
            {"normalized_descriptors": self._nhwc(desc)},
            {"normalized_descriptors": self._nhwc(gt_desc)},
            mask=jnp.asarray(mask[:, 0]) if use_mask else None,
            mode=mode, use_mask=use_mask)
        np.testing.assert_allclose(float(ol), float(rl), rtol=2e-4,
                                   atol=1e-6)

    def test_mae_plus_triplet(self, rng):
        _, _, desc, gt_desc, mask = self._maps(rng, H=12, W=14)
        raw = rng.normal(size=desc.shape).astype(np.float32)
        gt_raw = rng.normal(size=desc.shape).astype(np.float32)
        kargs = {"mae+triplet": {"mae_weight": 1.0, "triplet_weight": 100.0}}
        ref = RefDescriptorsLoss(weight=1.0, desc_type="normalized",
                                 mode="mae+triplet", use_mask=True, **kargs)
        rl, _ = ref({"normalized_descriptors": torch.from_numpy(desc),
                     "raw_descriptors": torch.from_numpy(raw)},
                    {"normalized_descriptors": torch.from_numpy(gt_desc),
                     "raw_descriptors": torch.from_numpy(gt_raw)},
                    mask=torch.from_numpy(mask.astype(np.float32)))
        ol, _ = descriptors_loss(
            {"normalized_descriptors": self._nhwc(desc),
             "raw_descriptors": self._nhwc(raw)},
            {"normalized_descriptors": self._nhwc(gt_desc),
             "raw_descriptors": self._nhwc(gt_raw)},
            mask=jnp.asarray(mask[:, 0]), mode="mae+triplet")
        np.testing.assert_allclose(float(ol), float(rl), rtol=2e-4)

    @pytest.mark.parametrize("mode", ["mse", "mae"])
    def test_feature_loss(self, rng, mode):
        _, _, feats, gt_feats, _ = self._maps(rng)
        ref = RefFeatureLoss(weight=3.0, mode=mode)
        rl, _ = ref({"backbone_feats": torch.from_numpy(feats)},
                    {"backbone_feats": torch.from_numpy(gt_feats)})
        ol, _ = feature_loss({"backbone_feats": self._nhwc(feats)},
                             {"backbone_feats": self._nhwc(gt_feats)},
                             mode=mode, weight=3.0)
        np.testing.assert_allclose(float(ol), float(rl), rtol=1e-5)


# ---------------------------------------------------------------------------
# Eval metrics vs the real reference (core/metrics/*.py) — the protocol that
# produces every headline number
# ---------------------------------------------------------------------------

import cv2

from core.metrics.keypoints_metrics import Repeatability as RefRepeatability
from core.metrics.matching_metrics import (
    MatchingRatio as RefMR, MeanMatchingAccuracy as RefMMA,
    HomographyEstimation as RefHE, RelativePoseEstimation as RefRPE)
from ei_nexus_tpu.metrics import (Repeatability, MatchingRatio,
                                  MeanMatchingAccuracy, HomographyEstimation,
                                  RelativePoseEstimation)


def _homography_scene(rng, n=120, H=120, W=160, noise=0.3):
    """Keypoints + warped keypoints under a known homography."""
    Hm = np.array([[1.02, 0.03, 4.0], [-0.02, 0.98, -3.0],
                   [1e-4, -8e-5, 1.0]], np.float64)
    p1 = np.stack([rng.uniform(5, H - 5, n), rng.uniform(5, W - 5, n)], 1)
    xy = np.stack([p1[:, 1], p1[:, 0], np.ones(n)], 1) @ Hm.T
    p2 = np.stack([xy[:, 1] / xy[:, 2], xy[:, 0] / xy[:, 2]], 1)
    p2 += rng.normal(0, noise, p2.shape)
    prob = rng.random((n, 1))
    return (np.concatenate([p1, prob], 1).astype(np.float32),
            np.concatenate([p2, prob], 1).astype(np.float32), Hm)


class TestMetricsParity:
    """update_one of each metric vs the real reference class on identical
    inputs (yx ordering, the protocol's convention). The cv2-RANSAC-based
    metrics pin cv2's global RNG before each call so both implementations
    see the same hypothesis stream."""

    def test_repeatability(self, rng):
        p1, p2, Hm = _homography_scene(rng)
        for th in (1, 3):
            ref = RefRepeatability("R", distance_thresh=th, ordering="yx")
            r = ref.update_one(torch.from_numpy(p1[:, :2]),
                               torch.from_numpy(p2[:, :2]),
                               (120, 160), (120, 160),
                               torch.from_numpy(Hm))
            ours = Repeatability("R", th, ordering="yx").update_one(
                p1[:, :2], p2[:, :2], (120, 160), (120, 160), Hm)
            np.testing.assert_allclose(ours["R"], r["R"], atol=1e-6)

    def test_matching_ratio(self, rng):
        p1, p2, _ = _homography_scene(rng)
        ref = RefMR("MR")
        r = ref.update_one(torch.from_numpy(p1[:40]),
                           torch.from_numpy(p2[:40]),
                           torch.from_numpy(p1), torch.from_numpy(p2))
        ours = MatchingRatio("MR").update_one(p1[:40], p2[:40], p1, p2)
        np.testing.assert_allclose(ours["MR"], r["MR"], atol=1e-8)

    def test_mma(self, rng):
        p1, p2, Hm = _homography_scene(rng, noise=1.5)
        for th in (1, 3):
            ref = RefMMA(f"MMA@{th}", threshold=th, ordering="yx")
            r = ref.update_one(torch.from_numpy(p1[:, :2]),
                               torch.from_numpy(p2[:, :2]),
                               torch.from_numpy(Hm))
            ours = MeanMatchingAccuracy(f"MMA@{th}", th, "yx").update_one(
                p1[:, :2], p2[:, :2], Hm)
            np.testing.assert_allclose(ours[f"MMA@{th}"], r[f"MMA@{th}"],
                                       atol=1e-6)

    def test_homography_estimation(self, rng):
        p1, p2, Hm = _homography_scene(rng, n=200, noise=0.2)
        ref = RefHE("HE", [3, 5, 10], ordering="yx")
        cv2.setRNGSeed(7)
        r = ref.update_one((120, 160), torch.from_numpy(p1),
                           torch.from_numpy(p2), torch.from_numpy(Hm))
        ours_m = HomographyEstimation("HE", [3, 5, 10], ordering="yx")
        cv2.setRNGSeed(7)
        o = ours_m.update_one((120, 160), p1, p2, Hm)
        for k in r:
            np.testing.assert_allclose(o[k], r[k], atol=1e-5, err_msg=k)

    def test_rpe(self, rng):
        from tests.test_metrics import synthetic_pose_scene
        x0, x1, K, T, _ = synthetic_pose_scene(rng, n=200, noise=0.3)
        # yx keypoint layout with prob column (protocol format)
        mk0 = np.concatenate([x0[:, ::-1], rng.random((len(x0), 1))],
                             1).astype(np.float32)
        mk1 = np.concatenate([x1[:, ::-1], rng.random((len(x1), 1))],
                             1).astype(np.float32)
        ref = RefRPE("RPE", [5, 10, 20], ransac_thresh=1.0, ordering="yx")
        cv2.setRNGSeed(3)
        r = ref.update_one(torch.from_numpy(mk0), torch.from_numpy(mk1),
                           torch.from_numpy(K.astype(np.float32)),
                           torch.from_numpy(K.astype(np.float32)),
                           torch.from_numpy(T.astype(np.float32)))
        ours_m = RelativePoseEstimation("RPE", [5, 10, 20],
                                        ransac_thresh=1.0, ordering="yx",
                                        backend="opencv")
        cv2.setRNGSeed(3)
        o = ours_m.update_one(mk0, mk1, K, K, T)
        for k in ("RPE_R_errs", "RPE_t_errs", "RPE_inliers"):
            np.testing.assert_allclose(o[k], r[k], atol=1e-4, err_msg=k)

    def test_vvd_identity_homography(self, rng):
        """ValidDescriptorsDistance under the IDENTITY homography — the only
        homography the reference protocol ever feeds it (same-time eval,
        test_events-image_same-time.py). Under a non-identity H the
        reference's yx branch treats (y, x) points as (x, y)
        (keypoints_metrics.py:193-197, the inverse of Repeatability's
        convention), which swaps the axes of BOTH the warp and the
        in-frame filter bounds; we intentionally regularize it
        (metrics/keypoints.py:131). The quirk cancels exactly at identity
        homography + square frames — asserted here; on non-square frames
        (e.g. 260x346) the reference filter compares y against the W
        bound, a documented divergence."""
        from core.metrics.keypoints_metrics import (
            ValidDescriptorsDistance as RefVVD)
        from ei_nexus_tpu.metrics import ValidDescriptorsDistance
        p1, p2, _ = _homography_scene(rng, n=80, H=120, W=120, noise=1.0)
        Hm = np.eye(3)
        d1 = rng.normal(size=(80, 16)).astype(np.float32)
        d2 = rng.normal(size=(80, 16)).astype(np.float32)
        ref = RefVVD("VVD", [1, 3], ordering="yx")
        r = ref.update_one(torch.from_numpy(p1[:, :2]),
                           torch.from_numpy(p2[:, :2]),
                           torch.from_numpy(d1), torch.from_numpy(d2),
                           (120, 120), (120, 120), torch.from_numpy(Hm))
        ours = ValidDescriptorsDistance("VVD", [1, 3], "yx").update_one(
            p1[:, :2], p2[:, :2], d1, d2, (120, 120), (120, 120), Hm)
        for k, v in r.items():
            np.testing.assert_allclose(ours[k], float(v), atol=1e-4,
                                       err_msg=k)


# ---------------------------------------------------------------------------
# Standalone matcher losses vs the real reference (core/loss/matcher_loss.py)
# ---------------------------------------------------------------------------

from core.loss.matcher_loss import (MNNLoss as RefMNNLoss,
                                    NLLLoss as RefNLLLoss)
from ei_nexus_tpu.losses.matcher_loss import mnn_loss, nll_matcher_loss


class TestMatcherLossParity:
    def test_mnn_loss(self, rng):
        B, N, M = 2, 24, 30
        d0 = rng.normal(size=(B, N, 8)).astype(np.float32)
        d1 = rng.normal(size=(B, M, 8)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        sim = np.einsum("bnd,bmd->bnm", d0, d1)
        assign = np.zeros((B, N, M), bool)
        for b in range(B):
            idx = rng.permutation(M)[:10]
            assign[b, np.arange(10), idx] = True
        ref = RefMNNLoss(weight=1.0)
        rl, rinfo = ref({"similarity": torch.from_numpy(sim)},
                        {"assignment": torch.from_numpy(assign)})
        ol, oinfo = mnn_loss({"similarity": jnp.asarray(sim)},
                             {"assignment": jnp.asarray(assign)})
        np.testing.assert_allclose(float(ol), float(rl), rtol=1e-5)
        np.testing.assert_allclose(float(oinfo["matcher_num_matchable"]),
                                   rinfo["matcher_num_matchable"], atol=1e-6)

    @pytest.mark.parametrize("balancing", [0.5, 0.8])
    def test_nll_loss(self, rng, balancing):
        # B=1: the reference's loss_info calls .item() on a (B,) tensor
        # (matcher_loss.py:111-112) and crashes for B>1 — batch-1-only code
        B, N, M = 1, 20, 26
        la = np.log(rng.random((B, N + 1, M + 1)).astype(np.float32) + 1e-3)
        gt0 = np.full((B, N), -2, np.int64)
        gt1 = np.full((B, M), -2, np.int64)
        assign = np.zeros((B, N, M), bool)
        for b in range(B):
            perm = rng.permutation(M)
            for i in range(8):           # positives
                gt0[b, i] = perm[i]
                gt1[b, perm[i]] = i
                assign[b, i, perm[i]] = True
            gt0[b, 8:12] = -1            # unmatched side 0
            gt1[b, perm[8:12]] = -1      # unmatched side 1
        ref = RefNLLLoss(weight=1.0, nll_balancing=balancing)
        rl, rinfo = ref(torch.from_numpy(la), torch.from_numpy(gt0),
                        torch.from_numpy(gt1), torch.from_numpy(assign))
        ol, oinfo = nll_matcher_loss(jnp.asarray(la), jnp.asarray(gt0),
                                     jnp.asarray(gt1), jnp.asarray(assign),
                                     nll_balancing=balancing)
        np.testing.assert_allclose(float(ol), float(rl), rtol=1e-5)
        for k in ("matcher_nll_positive", "matcher_nll_negtive"):
            np.testing.assert_allclose(float(oinfo[k]), rinfo[k], rtol=1e-5,
                                       err_msg=k)


# ---------------------------------------------------------------------------
# Data layer vs the real reference: event representations + pose interpolator
# ---------------------------------------------------------------------------

# "datasets" collides with the installed huggingface package (the reference
# dir has no __init__.py), so load the reference modules by file path
import importlib.util as _ilu


def _load_ref(name, path):
    spec = _ilu.spec_from_file_location(name, path)
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_reps = _load_ref("ref_representations",
                     "/root/reference/datasets/representations.py")
ref_interp = _load_ref("ref_interpolator",
                       "/root/reference/datasets/Interpolator.py")
RefPoseInterpolator = ref_interp.PoseInterpolator
from ei_nexus_tpu.data import representations as our_reps
from ei_nexus_tpu.data.interpolator import PoseInterpolator


class TestDataLayerParity:
    def _events(self, rng, n=6000, H=48, W=64):
        return {
            "x": rng.uniform(0, W - 1, n).astype(np.float64),
            "y": rng.uniform(0, H - 1, n).astype(np.float64),
            "t": np.sort(rng.uniform(10.0, 10.4, n)).astype(np.float64),
            "p": rng.integers(0, 2, n).astype(np.float64),
        }

    def test_voxel_grid(self, rng):
        H, W, bins = 48, 64, 8
        ev = self._events(rng, H=H, W=W)
        ref = ref_reps.events_to_voxel_grid(
            {k: v.copy() for k, v in ev.items()}, (bins, H, W),
            normalize=True)
        ours = our_reps.events_to_voxel_grid(
            jnp.asarray(ev["x"], jnp.float32), jnp.asarray(ev["y"],
                                                           jnp.float32),
            jnp.asarray(ev["t"], jnp.float32), jnp.asarray(ev["p"],
                                                           jnp.float32),
            bins=bins, height=H, width=W, normalize=True)
        np.testing.assert_allclose(np.asarray(ours), t2n(ref), atol=2e-3)

    def test_time_surface(self, rng):
        H, W, bins = 40, 52, 6
        ev = self._events(rng, H=H, W=W)
        ref = ref_reps.events_to_time_surface(
            {k: v.copy() for k, v in ev.items()}, (bins, H, W))
        ours = our_reps.events_to_time_surface(
            jnp.asarray(ev["x"], jnp.float32), jnp.asarray(ev["y"],
                                                           jnp.float32),
            jnp.asarray(ev["t"], jnp.float32), jnp.asarray(ev["p"],
                                                           jnp.float32),
            bins=bins, height=H, width=W)
        np.testing.assert_allclose(np.asarray(ours), t2n(ref), atol=1e-4)

    def test_pose_interpolator(self, rng):
        from scipy.spatial.transform import Rotation
        ts = np.linspace(0, 10, 40)
        t_xyz = rng.normal(size=(40, 3))
        quats = Rotation.random(40, random_state=3).as_quat()
        ref = RefPoseInterpolator(ts, t_xyz, quats, quat_R=True)
        ours = PoseInterpolator(ts, t_xyz,
                                Rotation.from_quat(quats).as_matrix(),
                                quat_R=False)
        for q in (0.05, 3.3, 7.77, 9.99):
            np.testing.assert_allclose(ours.interpolate(q),
                                       ref.interpolate(q), atol=1e-9)


class TestGtMatchesHomographyParity:
    def test_homography_variant(self, rng):
        """gt_matches_from_homography vs the real gt_generation.py:173 —
        assignment / matches / rewards / projections on a batch of random
        homographies (xy keypoint ordering, like the reference)."""
        from ei_nexus_tpu.geometry import gt_matches_from_homography
        B, N, M = 2, 48, 56
        kp0 = rng.uniform(5, 100, (B, N, 2)).astype(np.float32)
        kp1 = rng.uniform(5, 100, (B, M, 2)).astype(np.float32)
        Hm = np.tile(np.array([[1.01, 0.02, 3.0], [-0.015, 0.99, -2.0],
                               [5e-5, -4e-5, 1.0]], np.float32), (B, 1, 1))
        # make some true correspondences so positives exist
        xy = np.concatenate([kp0[:, :20], np.ones((B, 20, 1), np.float32)],
                            -1) @ Hm.transpose(0, 2, 1)
        kp1[:, :20] = xy[..., :2] / xy[..., 2:]

        ref_out = ref_gtgen.gt_matches_from_homography(
            torch.from_numpy(kp0), torch.from_numpy(kp1),
            torch.from_numpy(Hm), pos_th=3, neg_th=6)
        out = gt_matches_from_homography(jnp.asarray(kp0), jnp.asarray(kp1),
                                         jnp.asarray(Hm), pos_th=3.0,
                                         neg_th=6.0)
        np.testing.assert_array_equal(np.asarray(out["assignment"]),
                                      t2n(ref_out["assignment"]))
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      t2n(ref_out["matches0"]))
        np.testing.assert_array_equal(np.asarray(out["matches1"]),
                                      t2n(ref_out["matches1"]))
        np.testing.assert_allclose(np.asarray(out["reward"]),
                                   t2n(ref_out["reward"]), atol=0)
        np.testing.assert_allclose(np.asarray(out["proj_0to1"]),
                                   t2n(ref_out["proj_0to1"]), atol=1e-3)


class TestPadderParity:
    def test_pad_unpad_and_positions(self, rng):
        """ops/pad.Padder vs the reference Padder (core/modules/utils/
        util.py:5): replicate padding split top/bottom+left/right, bool
        constant padding, map unpad, position shift."""
        from core.modules.utils.util import Padder as RefPadder
        from ei_nexus_tpu.ops.pad import Padder
        B, H, W, cell = 2, 37, 51, 8
        x = rng.normal(size=(B, 1, H, W)).astype(np.float32)
        m = rng.random((B, 1, H, W)) > 0.5
        ref = RefPadder((B, 1, H, W), cell)
        rx, rm = ref.pad(torch.from_numpy(x), torch.from_numpy(m))
        ours = Padder(H, W, cell)
        ox = ours.pad(jnp.asarray(x.transpose(0, 2, 3, 1)))
        om = ours.pad(jnp.asarray(m[:, 0]), hw_axes=(-2, -1))
        np.testing.assert_allclose(nchw(ox), t2n(rx), atol=0)
        np.testing.assert_array_equal(np.asarray(om), t2n(rm.squeeze(1)))
        # unpad round trip
        np.testing.assert_allclose(
            nchw(ours.unpad(ox)), t2n(ref.unpad(rx)[0]), atol=0)
        # sparse position shift (yx)
        pos = rng.uniform(0, min(H, W), (B, 5, 3)).astype(np.float32)
        ref_pos = ref.unpad_positions([torch.from_numpy(p) for p in pos],
                                      ordering="yx")
        our_pos = ours.unpad_positions(jnp.asarray(pos), "yx")
        for b in range(B):
            np.testing.assert_allclose(np.asarray(our_pos[b])[:, :2],
                                       t2n(ref_pos[b])[:, :2], atol=1e-6)


class TestCameraWrapperParity:
    def test_project_distort_roundtrip(self, rng):
        """Camera (8-param pinhole + radial-tangential distortion) vs the
        reference TensorWrapper Camera (wrappers.py:238): project, distort,
        cam2image, image2cam, in_image on shared 3D points."""
        from ei_nexus_tpu.geometry import Camera
        B, N = 2, 64
        # [w h fx fy cx cy k1 k2]
        data = np.tile(np.array(
            [160., 120., 140., 138., 80., 60., -0.12, 0.03], np.float32),
            (B, 1))
        p3d = np.stack([rng.uniform(-0.5, 0.5, (B, N)),
                        rng.uniform(-0.4, 0.4, (B, N)),
                        rng.uniform(0.8, 3.0, (B, N))], -1).astype(np.float32)
        ref_cam = RefCamera(torch.from_numpy(data))
        cam = Camera(size=jnp.asarray(data[:, 0:2]),
                     f=jnp.asarray(data[:, 2:4]),
                     c=jnp.asarray(data[:, 4:6]),
                     dist=jnp.concatenate(
                         [jnp.asarray(data[:, 6:8]),
                          jnp.zeros((data.shape[0], 2), jnp.float32)], -1))

        rp, rvis = ref_cam.project(torch.from_numpy(p3d))
        op, ovis = cam.project(jnp.asarray(p3d))
        np.testing.assert_allclose(np.asarray(op), t2n(rp), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ovis), t2n(rvis))

        rd, rdvalid = ref_cam.distort(rp)
        od, odvalid = cam.distort(op)
        np.testing.assert_allclose(np.asarray(od), t2n(rd), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(odvalid), t2n(rdvalid))

        rimg, rv = ref_cam.cam2image(torch.from_numpy(p3d))
        oimg, ov = cam.cam2image(jnp.asarray(p3d))
        np.testing.assert_allclose(np.asarray(oimg), t2n(rimg), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ov), t2n(rv))

        rback = ref_cam.image2cam(rimg)
        oback = cam.image2cam(oimg)
        np.testing.assert_allclose(np.asarray(oback), t2n(rback), atol=1e-5)

        rin = ref_cam.in_image(rimg)
        oin = cam.in_image(oimg)
        np.testing.assert_array_equal(np.asarray(oin), t2n(rin))
