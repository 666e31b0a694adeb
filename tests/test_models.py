"""Model tests: extractors produce well-formed fixed-K outputs and find
injected corners; SuperPoint matches a torch reference implementation built
in-test from the published architecture; MNN and LightGlue behave correctly
on synthetic descriptors; EIM composes end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ei_nexus_tpu.models import (
    VGGExtractor, KeypointExtractorConfig, SuperPointV1,
    load_superpoint_torch_weights, SiLKVGG, mnn_match,
    LightGlue, LightGlueConfig, EIM, EIMConfig, build_model,
)
from ei_nexus_tpu.models.eim import ExtractorSpec, MatcherConfig
from ei_nexus_tpu.models.mnn import gather_matched_keypoints
from ei_nexus_tpu.models.lightglue import (
    normalize_keypoints, filter_matches, load_lightglue_torch_weights)


KCFG = KeypointExtractorConfig(detection_top_k=64, nms_radius=4,
                               detection_threshold=1.0, remove_borders=4)


class TestVGGExtractor:
    def _run(self, use_max_pooling=True, H=64, W=80, in_ch=16, mask=None,
             cfg=KCFG):
        if not use_max_pooling:
            import dataclasses
            cfg = dataclasses.replace(cfg, cell_size=1,
                                      sparse_desc_from="fullres")
        model = VGGExtractor(config=cfg, feat_channels=32, descriptor_dim=48,
                             lat_channels=64, use_max_pooling=use_max_pooling)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, H, W, in_ch)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, mask)
        out = model.apply(variables, x, mask)
        return out, (H, W)

    def test_output_shapes_cell8(self):
        out, (H, W) = self._run(True)
        assert out["score"].shape == (2, H, W)
        assert out["nms"].shape == (2, H, W)
        assert out["sparse_positions"].shape == (2, 64, 3)
        assert out["sparse_valid"].shape == (2, 64)
        assert out["sparse_descriptors"].shape == (2, 64, 48)
        assert out["normalized_descriptors"].shape == (2, H, W, 48)
        assert out["dense_positions"].shape == (2, H * W, 3)
        assert out["logits"].shape[-1] == 65
        # descriptors L2-normalized
        v = np.asarray(out["sparse_valid"])
        d = np.asarray(out["sparse_descriptors"])
        np.testing.assert_allclose(np.linalg.norm(d[v], axis=-1), 1.0,
                                   rtol=1e-4)

    def test_output_shapes_cell1(self):
        out, (H, W) = self._run(False)
        assert out["score"].shape == (2, H, W)
        assert out["logits"].shape[-1] == 1
        assert out["sparse_positions"].shape == (2, 64, 3)

    def test_positions_inside_image_and_sorted(self):
        out, (H, W) = self._run(True)
        pos = np.asarray(out["sparse_positions"])
        val = np.asarray(out["sparse_valid"])
        assert (pos[val][:, 0] >= 0).all() and (pos[val][:, 0] < H).all()
        assert (pos[val][:, 1] >= 0).all() and (pos[val][:, 1] < W).all()
        # sorted descending by prob
        probs = pos[0, :, 2]
        assert (np.diff(probs) <= 1e-6).all()

    def test_keypoints_separated_by_nms(self):
        out, _ = self._run(True)
        pos = np.asarray(out["sparse_positions"])[0]
        val = np.asarray(out["sparse_valid"])[0]
        pts = pos[val][:, :2]
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                assert np.abs(pts[i] - pts[j]).max() > 4

    def test_event_mask_zeroes_scores(self):
        H, W = 64, 80
        mask = np.zeros((2, H, W), bool)
        mask[:, :, :40] = True  # events only on the left half
        out, _ = self._run(True, mask=jnp.asarray(mask))
        pos = np.asarray(out["sparse_positions"])
        val = np.asarray(out["sparse_valid"])
        # all valid keypoints in the left half (+1 px dilation slack)
        assert (pos[val][:, 1] <= 41.5).all()
        score = np.asarray(out["score"])
        assert (score[:, :, 42:] == 0).all()


class TorchSuperPoint(torch.nn.Module):
    """Reference SuperPoint conv trunk (published MagicLeap architecture),
    built independently for weight-port equivalence testing."""

    def __init__(self):
        super().__init__()
        self.relu = torch.nn.ReLU()
        self.pool = torch.nn.MaxPool2d(2, 2)
        c = [64, 64, 128, 128, 256]
        conv = lambda i, o, k, p: torch.nn.Conv2d(i, o, k, 1, p)
        self.conv1a, self.conv1b = conv(1, 64, 3, 1), conv(64, 64, 3, 1)
        self.conv2a, self.conv2b = conv(64, 64, 3, 1), conv(64, 64, 3, 1)
        self.conv3a, self.conv3b = conv(64, 128, 3, 1), conv(128, 128, 3, 1)
        self.conv4a, self.conv4b = conv(128, 128, 3, 1), conv(128, 128, 3, 1)
        self.convPa, self.convPb = conv(128, 256, 3, 1), conv(256, 65, 1, 0)
        self.convDa, self.convDb = conv(128, 256, 3, 1), conv(256, 256, 1, 0)

    def forward(self, x):
        x = self.relu(self.conv1a(x))
        x = self.pool(self.relu(self.conv1b(x)))
        x = self.relu(self.conv2a(x))
        x = self.pool(self.relu(self.conv2b(x)))
        x = self.relu(self.conv3a(x))
        x = self.pool(self.relu(self.conv3b(x)))
        x = self.relu(self.conv4a(x))
        feats = self.relu(self.conv4b(x))
        logits = self.convPb(self.relu(self.convPa(feats)))
        desc = self.convDb(self.relu(self.convDa(feats)))
        return logits, desc


class TestSuperPoint:
    def test_weight_port_equivalence(self, rng):
        """Flax SuperPoint with ported torch weights reproduces the torch
        trunk's logits/descriptors on the same input."""
        tm = TorchSuperPoint().eval()
        sd = tm.state_dict()
        H, W = 64, 64  # multiple of 8: no padding effects
        img = rng.uniform(0, 255, (1, H, W, 1)).astype(np.float32)
        with torch.no_grad():
            tl, td = tm(torch.from_numpy(img[..., 0][None] / 255.0))
        model = SuperPointV1(config=KCFG)
        variables = load_superpoint_torch_weights(sd)
        out = model.apply(variables, jnp.asarray(img))
        got_logits = np.asarray(out["logits"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_logits, tl.numpy(), atol=2e-4)
        got_desc = np.asarray(out["raw_descriptors"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_desc, td.numpy(), atol=2e-4)

    def test_random_init_runs(self, rng):
        model = SuperPointV1(config=KCFG)
        img = jnp.asarray(rng.uniform(0, 255, (1, 60, 76, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(variables, img)
        assert out["sparse_positions"].shape == (1, 64, 3)
        assert out["score"].shape == (1, 60, 76)


class TestSiLK:
    def test_forward_shapes(self, rng):
        model = SiLKVGG()
        img = jnp.asarray(rng.uniform(0, 255, (1, 40, 48, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(variables, img)
        assert out["sparse_positions"].shape == (1, 512, 3)
        assert out["sparse_descriptors"].shape == (1, 512, 128)
        assert out["logits"].shape == (1, 40, 48, 1)
        # cell=1: returned probability aliases the border-zeroed score map
        # (reference in-place mutation semantics, EventExtractors.py:374-385)
        p = np.asarray(out["probability"])[..., 0]
        assert (p >= 0).all() and (p < 1).all()
        assert (p[:, :4, :] == 0).all() and (p[:, :, :4] == 0).all()
        assert (p[:, 4:-4, 4:-4] > 0).all()


class TestMNN:
    def _feats(self, desc, pos=None, valid=None):
        B, K, D = desc.shape
        f = {"sparse_descriptors": jnp.asarray(desc),
             "sparse_positions": jnp.asarray(
                 pos if pos is not None else np.zeros((B, K, 3), np.float32)),
             "image_size": jnp.full((B, 2), 100.0)}
        if valid is not None:
            f["sparse_valid"] = jnp.asarray(valid)
        return f

    def test_identity_match(self, rng):
        d = rng.normal(size=(1, 16, 32)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        out = mnn_match(self._feats(d), self._feats(d))
        np.testing.assert_array_equal(np.asarray(out["matches0"])[0],
                                      np.arange(16))
        np.testing.assert_array_equal(np.asarray(out["matches1"])[0],
                                      np.arange(16))

    def test_permutation_recovered(self, rng):
        d = rng.normal(size=(1, 16, 32)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        perm = rng.permutation(16)
        out = mnn_match(self._feats(d), self._feats(d[:, perm]))
        m0 = np.asarray(out["matches0"])[0]
        np.testing.assert_array_equal(perm[m0], np.arange(16))

    def test_invalid_slots_excluded(self, rng):
        d = rng.normal(size=(1, 8, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        valid = np.ones((1, 8), bool)
        valid[0, 3] = False
        out = mnn_match(self._feats(d, valid=valid),
                        self._feats(d, valid=valid))
        m0 = np.asarray(out["matches0"])[0]
        assert m0[3] == -1
        assert (m0[np.arange(8) != 3] == np.arange(8)[np.arange(8) != 3]).all()

    def test_mutual_check_and_scores(self, rng):
        d0 = rng.normal(size=(1, 6, 8)).astype(np.float32)
        d1 = rng.normal(size=(1, 9, 8)).astype(np.float32)
        out = mnn_match(self._feats(d0), self._feats(d1))
        m0 = np.asarray(out["matches0"])[0]
        m1 = np.asarray(out["matches1"])[0]
        assert (m0 > -1).sum() == (m1 > -1).sum()  # mutual
        for i, j in enumerate(m0):
            if j > -1:
                assert m1[j] == i
        assert out["log_assignment"].shape == (1, 7, 10)

    def test_gather_matched(self, rng):
        kp0 = rng.normal(size=(1, 6, 3)).astype(np.float32)
        kp1 = rng.normal(size=(1, 6, 3)).astype(np.float32)
        matches0 = np.array([[2, -1, 0, -1, 5, 1]], np.int32)
        k0, k1, m = gather_matched_keypoints(
            jnp.asarray(kp0), jnp.asarray(kp1), jnp.asarray(matches0))
        m = np.asarray(m)
        assert m.sum() == 4
        np.testing.assert_allclose(np.asarray(k1)[0, 0], kp1[0, 2])


class TestLightGlue:
    def _feats(self, rng, K=32, D=64, B=1):
        d = rng.normal(size=(B, K, D)).astype(np.float32)
        pos = np.concatenate([
            rng.uniform(0, 60, (B, K, 2)), rng.uniform(0, 1, (B, K, 1))],
            -1).astype(np.float32)
        return {"sparse_descriptors": jnp.asarray(d),
                "sparse_positions": jnp.asarray(pos),
                "image_size": jnp.full((B, 2), 64.0)}

    def test_forward_shapes_and_training_outputs(self, rng):
        cfg = LightGlueConfig(input_dim=64, descriptor_dim=64, n_layers=3,
                              num_heads=4)
        model = LightGlue(config=cfg)
        f0, f1 = self._feats(rng), self._feats(rng)
        variables = model.init(jax.random.PRNGKey(0), f0, f1, training=True)
        out = model.apply(variables, f0, f1, training=True)
        assert out["matches0"].shape == (1, 32)
        assert out["log_assignment"].shape == (1, 33, 33)
        assert out["all_log_assignments"].shape == (1, 3, 33, 33)
        assert out["confidence_logits0"].shape == (1, 2, 32)
        # log assignment rows are (log-)subnormalized
        la = np.asarray(out["log_assignment"])[0]
        rowsum = np.exp(la[:-1]).sum(-1)
        assert (rowsum < 1.5).all()
        # eval mode: no deep-supervision outputs
        out_e = model.apply(variables, f0, f1, training=False)
        assert "all_log_assignments" not in out_e

    def test_identical_descriptors_match_diagonally(self, rng):
        """With identical tokens on both sides the strongest assignment
        should be near-diagonal after training-free forward (sanity, not
        exactness)."""
        cfg = LightGlueConfig(input_dim=64, descriptor_dim=64, n_layers=2,
                              num_heads=4, filter_threshold=0.0)
        model = LightGlue(config=cfg)
        f0 = self._feats(rng)
        variables = model.init(jax.random.PRNGKey(1), f0, f0)
        out = model.apply(variables, f0, f0)
        m0 = np.asarray(out["matches0"])[0]
        agree = (m0 == np.arange(32)).mean()
        assert agree > 0.8

    def test_bf16_scores_preserve_matches(self, rng):
        """score_dtype=bfloat16 materializes attention/assignment scores in
        half precision (HBM-traffic optimization); matches must agree with
        the f32 path for the overwhelming majority of keypoints."""
        f0, f1 = self._feats(rng, K=64), self._feats(rng, K=64)
        outs = {}
        for sd in ("float32", "bfloat16"):
            cfg = LightGlueConfig(input_dim=64, descriptor_dim=64,
                                  n_layers=3, num_heads=4, score_dtype=sd)
            model = LightGlue(config=cfg)
            variables = model.init(jax.random.PRNGKey(0), f0, f1)
            outs[sd] = model.apply(variables, f0, f1)
        m_f32 = np.asarray(outs["float32"]["matches0"])[0]
        m_bf16 = np.asarray(outs["bfloat16"]["matches0"])[0]
        assert (m_f32 == m_bf16).mean() > 0.9
        # log-probs of unlikely pairs wobble ~0.1-0.2 in log space under
        # half-precision scores; matches themselves are unaffected above
        np.testing.assert_allclose(
            np.asarray(outs["bfloat16"]["log_assignment"]),
            np.asarray(outs["float32"]["log_assignment"]), atol=0.3)

    def test_normalize_keypoints(self):
        kpts = jnp.asarray([[[0.0, 0.0], [100.0, 200.0]]])
        size = jnp.asarray([[100.0, 200.0]])
        nk = np.asarray(normalize_keypoints(kpts, size))
        np.testing.assert_allclose(nk[0, 0], [-0.5, -1.0])
        np.testing.assert_allclose(nk[0, 1], [0.5, 1.0])

    def test_filter_matches_threshold(self):
        scores = np.full((1, 3, 3), -10.0, np.float32)
        scores[0, 0, 0] = -0.1  # strong
        scores[0, 1, 1] = -8.0  # weak
        m0, m1, ms0, ms1 = filter_matches(jnp.asarray(scores), 0.5)
        m0 = np.asarray(m0)[0]
        assert m0[0] == 0 and m0[1] == -1

    def test_mask_blocks_matches(self, rng):
        cfg = LightGlueConfig(input_dim=64, descriptor_dim=64, n_layers=2,
                              num_heads=4)
        model = LightGlue(config=cfg)
        f0 = self._feats(rng)
        f1 = dict(f0)
        valid = np.ones((1, 32), bool)
        valid[0, :5] = False
        f0m = dict(f0, sparse_valid=jnp.asarray(valid))
        variables = model.init(jax.random.PRNGKey(0), f0m, f1)
        out = model.apply(variables, f0m, f1)
        assert (np.asarray(out["matches0"])[0, :5] == -1).all()

    def test_no_match_targets_invalid_slots(self, rng):
        """A valid query must never match an INVALID key slot: the
        assignment head sees unmasked padded descriptors, so its argmax
        can land on one without the post-filter target-validity mask.
        Property-tested over several inits/masks in both directions."""
        cfg = LightGlueConfig(input_dim=64, descriptor_dim=64, n_layers=2,
                              num_heads=4)
        model = LightGlue(config=cfg)
        for seed in range(3):
            f0 = self._feats(rng)
            f1 = self._feats(rng)
            v0 = rng.uniform(size=(1, 32)) > 0.4
            v1 = rng.uniform(size=(1, 32)) > 0.4
            f0m = dict(f0, sparse_valid=jnp.asarray(v0))
            f1m = dict(f1, sparse_valid=jnp.asarray(v1))
            variables = model.init(jax.random.PRNGKey(seed), f0m, f1m)
            out = model.apply(variables, f0m, f1m)
            m0 = np.asarray(out["matches0"])[0]
            m1 = np.asarray(out["matches1"])[0]
            assert all(m == -1 or v1[0, m] for m in m0)
            assert all(m == -1 or v0[0, m] for m in m1)
            # scores of invalidated matches are zeroed
            ms0 = np.asarray(out["matching_scores0"])[0]
            assert (ms0[m0 == -1] == 0).all()

    def test_torch_weight_port_shapes(self, rng):
        """Round-trip: build torch-like state dict with correct shapes and
        port; forward must run."""
        d, L = 64, 2
        sd = {}
        sd["posenc.Wr.weight"] = np.random.randn(d // 4 // 2, 2).astype(
            np.float32)
        for i in range(L):
            t = f"transformers.{i}"
            for k, shp in (("self_attn.Wqkv", (3 * d, d)),
                           ("self_attn.out_proj", (d, d)),
                           ("self_attn.ffn.0", (2 * d, 2 * d)),
                           ("self_attn.ffn.3", (d, 2 * d)),
                           ("cross_attn.to_qk", (d, d)),
                           ("cross_attn.to_v", (d, d)),
                           ("cross_attn.to_out", (d, d)),
                           ("cross_attn.ffn.0", (2 * d, 2 * d)),
                           ("cross_attn.ffn.3", (d, 2 * d))):
                sd[f"{t}.{k}.weight"] = np.random.randn(*shp).astype(np.float32)
                sd[f"{t}.{k}.bias"] = np.random.randn(shp[0]).astype(np.float32)
            for k, n in (("self_attn.ffn.1", 2 * d),
                         ("cross_attn.ffn.1", 2 * d)):
                sd[f"{t}.{k}.weight"] = np.ones(n, np.float32)
                sd[f"{t}.{k}.bias"] = np.zeros(n, np.float32)
            sd[f"log_assignment.{i}.final_proj.weight"] = \
                np.random.randn(d, d).astype(np.float32)
            sd[f"log_assignment.{i}.final_proj.bias"] = \
                np.zeros(d, np.float32)
            sd[f"log_assignment.{i}.matchability.weight"] = \
                np.random.randn(1, d).astype(np.float32)
            sd[f"log_assignment.{i}.matchability.bias"] = \
                np.zeros(1, np.float32)
            if i < L - 1:
                sd[f"token_confidence.{i}.token.0.weight"] = \
                    np.random.randn(1, d).astype(np.float32)
                sd[f"token_confidence.{i}.token.0.bias"] = \
                    np.zeros(1, np.float32)
        variables = load_lightglue_torch_weights(sd, n_layers=L)
        cfg = LightGlueConfig(input_dim=d, descriptor_dim=d, n_layers=L,
                              num_heads=4)
        out = LightGlue(config=cfg).apply(variables, self._feats(rng),
                                          self._feats(rng), training=True)
        assert out["matches0"].shape == (1, 32)


class TestEIM:
    def _config(self, matcher_type="MNN"):
        kev = KeypointExtractorConfig(detection_top_k=64)
        kim = KeypointExtractorConfig(detection_top_k=64)
        return EIMConfig(
            event_extractor=ExtractorSpec(
                type="vgg", in_channels=4, feat_channels=16,
                descriptor_dim=32, lat_channels=32, keypoints=kev),
            image_extractor=ExtractorSpec(
                type="superpointv1", freeze=True, descriptor_dim=32,
                keypoints=kim),
            matcher=MatcherConfig(type=matcher_type, max_points_num=64,
                                  freeze=(matcher_type != "LightGlue"),
                                  lightglue=LightGlueConfig(
                                      input_dim=32, descriptor_dim=32,
                                      n_layers=2, num_heads=4)),
        )

    def test_end_to_end_mnn(self, rng):
        model = EIM(config=self._config("MNN"))
        events = jnp.asarray(rng.normal(size=(1, 48, 64, 4)).astype(np.float32))
        image = jnp.asarray(rng.uniform(0, 255, (1, 48, 64, 1)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=(1, 48, 64)) > 0.3)
        variables = model.init(jax.random.PRNGKey(0), events, image, mask)
        ev, im, matches = model.apply(variables, events, image, mask)
        assert ev["sparse_positions"].shape == (1, 64, 3)
        assert im["sparse_positions"].shape == (1, 64, 3)
        assert matches["matches0"].shape == (1, 64)

    def test_end_to_end_lightglue_training(self, rng):
        model = EIM(config=self._config("LightGlue"))
        events = jnp.asarray(rng.normal(size=(1, 48, 64, 4)).astype(np.float32))
        image = jnp.asarray(rng.uniform(0, 255, (1, 48, 64, 1)).astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "pad": jax.random.PRNGKey(1)},
            events, image, None, None, True)
        ev, im, matches = model.apply(
            variables, events, image, None, None, True,
            rngs={"pad": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])[0]
        # random-fill: all slots valid for the matcher
        assert bool(matches["input_feats0"]["sparse_valid"].all())
        assert "all_log_assignments" in matches

    def test_build_model_dispatch(self):
        m = build_model("EIM", self._config())
        assert isinstance(m, EIM)
        with pytest.raises(ValueError):
            build_model("nope", self._config())
