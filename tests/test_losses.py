"""Loss tests vs manual/torch reference computations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ei_nexus_tpu.losses import (
    score_loss, logits_loss, descriptors_loss, feature_loss,
    mnn_loss, nll_matcher_loss, nll_weights_from_gt, lightglue_loss,
    build_losses,
)


def feats(score=None, logits=None, nd=None, rd=None, cd=None, bf=None):
    out = {}
    if score is not None:
        out["score"] = jnp.asarray(score)
    if logits is not None:
        out["logits"] = jnp.asarray(logits)
    if nd is not None:
        out["normalized_descriptors"] = jnp.asarray(nd)
    if rd is not None:
        out["raw_descriptors"] = jnp.asarray(rd)
    if cd is not None:
        out["coarse_descriptors"] = jnp.asarray(cd)
    if bf is not None:
        out["backbone_feats"] = jnp.asarray(bf)
    return out


class TestScoreLoss:
    def test_mse_masked(self, rng):
        p = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
        g = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
        m = rng.uniform(size=(2, 8, 8)) > 0.5
        loss, info = score_loss(feats(score=p), feats(score=g),
                                jnp.asarray(m), mode="mse")
        want = ((p - g) ** 2)[m].mean()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_mae_masked(self, rng):
        p = rng.uniform(0, 1, (1, 6, 6)).astype(np.float32)
        g = rng.uniform(0, 1, (1, 6, 6)).astype(np.float32)
        m = rng.uniform(size=(1, 6, 6)) > 0.5
        loss, _ = score_loss(feats(score=p), feats(score=g), jnp.asarray(m),
                             mode="mae")
        want = (np.abs(p - g) * m).sum() / m.sum()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_no_mask(self, rng):
        p = rng.uniform(0, 1, (1, 4, 4)).astype(np.float32)
        g = rng.uniform(0, 1, (1, 4, 4)).astype(np.float32)
        loss, _ = score_loss(feats(score=p), feats(score=g), None, mode="mse")
        np.testing.assert_allclose(float(loss), ((p - g) ** 2).mean(),
                                   rtol=1e-5)


class TestLogitsLoss:
    def test_pixelshuffle_mse(self, rng):
        p = rng.normal(size=(1, 2, 2, 65)).astype(np.float32)
        g = rng.normal(size=(1, 2, 2, 65)).astype(np.float32)
        loss, _ = logits_loss(feats(logits=p), feats(logits=g), None,
                              cell_size=8)
        pt = F.pixel_shuffle(torch.from_numpy(
            p.transpose(0, 3, 1, 2)[:, :64]), 8)
        gt = F.pixel_shuffle(torch.from_numpy(
            g.transpose(0, 3, 1, 2)[:, :64]), 8)
        want = F.mse_loss(pt, gt).item()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)


class TestDescriptorsLoss:
    def test_mae(self, rng):
        p = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        g = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        m = rng.uniform(size=(1, 4, 4)) > 0.4
        loss, _ = descriptors_loss(feats(nd=p), feats(nd=g), jnp.asarray(m),
                                   mode="mae")
        mm = np.repeat(m[..., None], 8, -1)
        want = (np.abs(p - g) * mm).sum() / mm.sum()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_cosine(self, rng):
        p = rng.normal(size=(1, 3, 3, 8)).astype(np.float32)
        g = rng.normal(size=(1, 3, 3, 8)).astype(np.float32)
        loss, _ = descriptors_loss(feats(nd=p), feats(nd=g), None,
                                   mode="cosine_similarity")
        cos = (p * g).sum(-1) / (np.linalg.norm(p, axis=-1)
                                 * np.linalg.norm(g, axis=-1))
        np.testing.assert_allclose(float(loss), 1 - cos.mean(), rtol=1e-5)

    def test_identity_zero(self, rng):
        p = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        for mode in ("mse", "mae", "cosine_similarity"):
            loss, _ = descriptors_loss(feats(nd=p), feats(nd=p), None,
                                       mode=mode)
            assert abs(float(loss)) < 1e-5

    def test_dual_softmax_and_triplet_run(self, rng):
        p = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        g = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        m = rng.uniform(size=(1, 4, 4)) > 0.3
        for mode in ("dual-softmax", "triplet", "mae+triplet"):
            loss, _ = descriptors_loss(feats(nd=p, rd=p), feats(nd=g, rd=g),
                                       jnp.asarray(m), mode=mode)
            assert np.isfinite(float(loss))


class TestFeatureLoss:
    def test_mse(self, rng):
        p = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        g = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        loss, _ = feature_loss(feats(bf=p), feats(bf=g), mode="mse")
        np.testing.assert_allclose(float(loss), ((p - g) ** 2).mean(),
                                   rtol=1e-5)


class TestMNNLoss:
    def test_perfect_similarity_low_loss(self, rng):
        # GT pairs have sim=1, others ~0: loss should be small
        N = 8
        sim = np.full((1, N, N), 0.0, np.float32)
        np.fill_diagonal(sim[0], 1.0)
        assignment = np.eye(N, dtype=bool)[None]
        loss_good, _ = mnn_loss({"similarity": jnp.asarray(sim)},
                                {"assignment": jnp.asarray(assignment)})
        sim_bad = np.roll(sim, 1, axis=2)  # misaligned
        loss_bad, _ = mnn_loss({"similarity": jnp.asarray(sim_bad)},
                               {"assignment": jnp.asarray(assignment)})
        assert float(loss_good) < float(loss_bad)

    def test_matches_manual(self, rng):
        sim = rng.uniform(-1, 1, (2, 5, 6)).astype(np.float32)
        assignment = np.zeros((2, 5, 6), bool)
        assignment[0, 0, 1] = assignment[1, 2, 3] = True
        loss, info = mnn_loss({"similarity": jnp.asarray(sim)},
                              {"assignment": jnp.asarray(assignment)})
        scores = 2 - np.sqrt(np.clip(2 * (1 - sim), 1e-6, None))
        t = torch.from_numpy(scores)
        p0 = F.log_softmax(t, 2).numpy()
        p1 = F.log_softmax(t, 1).numpy()
        a = assignment.astype(np.float32)
        num = np.maximum(a.sum((1, 2)), 1)
        nll = -((p0 * a).sum((1, 2)) / num + (p1 * a).sum((1, 2)) / num) / 2
        np.testing.assert_allclose(float(loss), nll.mean(), rtol=1e-5)


class TestNLLMatcherLoss:
    def _gt(self, rng, N=6, M=7):
        m0 = np.full((1, N), -1, np.int64)
        m1 = np.full((1, M), -1, np.int64)
        assignment = np.zeros((1, N, M), bool)
        m0[0, 0], m1[0, 2] = 2, 0
        assignment[0, 0, 2] = True
        m0[0, 3] = -2  # ignored
        return m0, m1, assignment

    def test_weights_layout(self, rng):
        m0, m1, a = self._gt(rng)
        w = np.asarray(nll_weights_from_gt((1, 7, 8), jnp.asarray(m0),
                                           jnp.asarray(m1), jnp.asarray(a)))
        assert w[0, 0, 2] == 1.0        # positive
        assert w[0, 1, -1] == 1.0       # unmatched row -> dustbin col
        assert w[0, 3, -1] == 0.0       # ignored -> nowhere
        assert w[0, -1, 1] == 1.0       # unmatched col -> dustbin row
        assert w[0, -1, 2] == 0.0       # matched col -> not dustbin

    def test_perfect_assignment_lower_loss(self, rng):
        m0, m1, a = self._gt(rng)
        good = np.full((1, 7, 8), -20.0, np.float32)
        good[0, 0, 2] = -0.01
        good[0, 1:7, 7] = -0.01  # unmatched rows to dustbin
        good[0, 6, 0:7] = -0.01
        bad = np.full((1, 7, 8), np.log(1 / 56.0), np.float32)
        lg, _ = nll_matcher_loss(jnp.asarray(good), jnp.asarray(m0),
                                 jnp.asarray(m1), jnp.asarray(a))
        lb, _ = nll_matcher_loss(jnp.asarray(bad), jnp.asarray(m0),
                                 jnp.asarray(m1), jnp.asarray(a))
        assert float(lg) < float(lb)


class TestLightGlueLoss:
    def test_deep_supervision(self, rng):
        B, L, N, M = 2, 3, 6, 6
        la = rng.normal(size=(B, L, N + 1, M + 1)).astype(np.float32)
        la = np.log(np.exp(la) / np.exp(la).sum((-1), keepdims=True))
        conf0 = rng.normal(size=(B, L - 1, N)).astype(np.float32)
        conf1 = rng.normal(size=(B, L - 1, M)).astype(np.float32)
        m0 = rng.integers(-1, M, (B, N))
        m1 = rng.integers(-1, N, (B, M))
        a = np.zeros((B, N, M), bool)
        pred = {"all_log_assignments": jnp.asarray(la),
                "confidence_logits0": jnp.asarray(conf0),
                "confidence_logits1": jnp.asarray(conf1)}
        gt = {"matches0": jnp.asarray(m0), "matches1": jnp.asarray(m1),
              "assignment": jnp.asarray(a)}
        loss, info = lightglue_loss(pred, gt, gamma=1.0)
        assert np.isfinite(float(loss))
        assert "matcher_row_norm" in info
        # gradient flows
        g = jax.grad(lambda la_: lightglue_loss(
            {**pred, "all_log_assignments": la_}, gt)[0])(
                jnp.asarray(la))
        assert np.isfinite(np.asarray(g)).all()

    def test_gamma_weighting(self, rng):
        """With gamma=0 layer weights become i+1 — check totals differ."""
        B, L, N = 1, 3, 4
        la = np.log(np.random.default_rng(0).uniform(
            0.01, 1, (B, L, N + 1, N + 1))).astype(np.float32)
        pred = {"all_log_assignments": jnp.asarray(la),
                "confidence_logits0": jnp.zeros((B, L - 1, N)),
                "confidence_logits1": jnp.zeros((B, L - 1, N))}
        m0 = np.zeros((B, N), np.int64)
        a = np.eye(N, dtype=bool)[None]
        gt = {"matches0": jnp.asarray(m0), "matches1": jnp.asarray(m0),
              "assignment": jnp.asarray(a)}
        l1, _ = lightglue_loss(pred, gt, gamma=1.0, training=False)
        l2, _ = lightglue_loss(pred, gt, gamma=0.5, training=False)
        assert abs(float(l1) - float(l2)) > 1e-7


class TestFactory:
    def test_build_and_defaults(self):
        cfg = {
            "keypoints_loss": {"type": "ScoreLoss",
                               "ScoreLoss": {"weight": 2.0, "mode": "mse",
                                             "use_mask": False}},
            "descriptors_loss": {"type": "DescriptorsLoss",
                                 "DescriptorsLoss": {"mode": "mae",
                                                     "weight": 1.0}},
            "feature_loss": {"type": "FeatureLoss",
                             "FeatureLoss": {"mode": "mse", "weight": 1.0}},
            "matcher_loss": {"type": "NLLLoss",
                             "NLLLoss": {"weight": 1.0,
                                         "nll_balancing": 1.0}},
        }
        losses = build_losses(cfg)
        p = np.random.default_rng(0).uniform(0, 1, (1, 4, 4)).astype(np.float32)
        loss, _ = losses["keypoints_loss"](feats(score=p), feats(score=p))
        assert float(loss) == 0.0
        # pass-through default
        losses2 = build_losses({})
        loss2, info2 = losses2["matcher_loss"]()
        assert float(loss2) == 0.0 and info2 == {}
