"""Torch checkpoint porting: a torch VGG extractor trunk built to the
reference layout must produce identical logits/descriptors through the
ported flax model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from ei_nexus_tpu.models import VGGExtractor, KeypointExtractorConfig
from ei_nexus_tpu.models.port_torch import (
    load_vgg_extractor_torch_weights, load_eim_torch_checkpoint)


def vgg_block_t(cin, cout, bn=True):
    layers = [nn.Conv2d(cin, cout, 3, padding=1), nn.ReLU()]
    if bn:
        layers.append(nn.BatchNorm2d(cout))
    return nn.Sequential(*layers)


class TorchVGGTrunk(nn.Module):
    """Reference-layout VGG extractor trunk (backbone.l1..l4, _detH, _desH)
    built independently for port testing."""

    def __init__(self, in_ch=4, feat=32, desc=24, lat=48, cell8=True):
        super().__init__()
        backbone = nn.Module()
        backbone.l1 = nn.Sequential(vgg_block_t(in_ch, 64),
                                    vgg_block_t(64, 64))
        backbone.l2 = nn.Sequential(vgg_block_t(64, 64), vgg_block_t(64, 64))
        backbone.l3 = nn.Sequential(vgg_block_t(64, 128),
                                    vgg_block_t(128, 128))
        backbone.l4 = nn.Sequential(vgg_block_t(128, feat),
                                    vgg_block_t(feat, feat))
        self.backbone = backbone
        self.mp = nn.MaxPool2d(2, 2) if cell8 else nn.Identity()
        det_out = 65 if cell8 else 1
        dh = nn.Module()
        dh._detH1 = vgg_block_t(feat, lat)
        dh._detH2 = nn.Sequential(nn.Conv2d(lat, det_out, 1),
                                  nn.BatchNorm2d(det_out))
        self.detector_head = dh
        eh = nn.Module()
        eh._desH1 = vgg_block_t(feat, desc)
        eh._desH2 = nn.Sequential(nn.Conv2d(desc, desc, 1),
                                  nn.BatchNorm2d(desc))
        self.descriptor_head = eh

    def forward(self, x):
        b = self.backbone
        o = self.mp(b.l1(x))
        o = self.mp(b.l2(o))
        o = self.mp(b.l3(o))
        feats = b.l4(o)
        logits = self.detector_head._detH2(self.detector_head._detH1(feats))
        desc = self.descriptor_head._desH2(self.descriptor_head._desH1(feats))
        return feats, logits, desc


class TestVGGPort:
    def test_forward_equivalence(self, rng):
        tm = TorchVGGTrunk().eval()
        sd = {k: v for k, v in tm.state_dict().items()}
        H, W = 64, 64
        x = rng.normal(size=(1, H, W, 4)).astype(np.float32)
        with torch.no_grad():
            tf, tl, td = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

        model = VGGExtractor(
            config=KeypointExtractorConfig(detection_top_k=64),
            feat_channels=32, descriptor_dim=24, lat_channels=48)
        variables = load_vgg_extractor_torch_weights(sd)
        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out["logits"]).transpose(0, 3, 1, 2), tl.numpy(),
            atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(out["raw_descriptors"]).transpose(0, 3, 1, 2),
            td.numpy(), atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(out["backbone_feats"]).transpose(0, 3, 1, 2),
            tf.numpy(), atol=3e-4)

    def test_eim_checkpoint_surgery(self, rng):
        """Full EIM-style state dict with reference nesting ports into the
        composite variables."""
        tm = TorchVGGTrunk().eval()
        full_sd = {}
        for k, v in tm.state_dict().items():
            full_sd[f"event_extractor.extractor.{k}"] = v.numpy()
        # minimal SuperPoint image extractor weights
        from tests.test_models import TorchSuperPoint
        sp = TorchSuperPoint().eval()
        for k, v in sp.state_dict().items():
            full_sd[f"image_extractor.extractor.{k}"] = v.numpy()
        variables = load_eim_torch_checkpoint(full_sd,
                                              matcher_type="MNN")
        assert "event_extractor" in variables["params"]
        assert "image_extractor" in variables["params"]
        assert "backbone" in variables["params"]["event_extractor"]
        assert "conv1a" in variables["params"]["image_extractor"]
