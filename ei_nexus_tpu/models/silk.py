"""SiLK-VGG image keypoint extractor (frozen teacher, cell=1).

Capability parity with the live surface of the vendored SiLK sublibrary:
`silk_extractor.py:78` (SiLKModel) wrapping `silk/backbones/silk/silk.py:85`
(SiLKVGG) with a `ParametricVGG` backbone (per-stage widths (64,64,128,128),
one BatchNorm per block, no max pooling) + 1-channel detector head
(lat=128) + 128-d descriptor head; descriptor scale factor 1.41; sigmoid
probabilities; full-resolution integer descriptor gather.

This is architecturally the no-pooling member of the same VGG family, so it
reuses `VGGBackbone`/heads with SiLK's stage widths. Padding=0 (VALID) is
supported with the +9 px coordinate remap (silk coords.py linear mappings).

`load_silk_torch_weights` ports the pytorch-lightning pvgg-4.ckpt layout
(`_mods.model.backbone...`, renamed in silk/config/model.py:19).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import Padder
from .vgg import VGGBackbone, VGGDetectorHead, VGGDescriptorHead
from .extractor import KeypointExtractorConfig, extract_keypoints


class SiLKVGG(nn.Module):
    config: KeypointExtractorConfig = KeypointExtractorConfig(
        cell_size=1, descriptor_scale_factor=1.41, sparse_desc_from="fullres",
        detection_top_k=512, smooth_mask=False)
    feat_channels: int = 128
    lat_channels: int = 128
    descriptor_dim: int = 128
    conv_padding: str = "SAME"   # "VALID" for padding=0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array,
                 score_mask: Optional[jax.Array] = None,
                 train: bool = False) -> Dict[str, Any]:
        """image: (B, H, W, 1) grayscale in [0, 255], divided by 255 inside
        (reference silk_extractor.py:180 `image = image / 255.0`)."""
        assert image.ndim == 4
        H, W = image.shape[1], image.shape[2]
        x = image.astype(self.dtype) / 255.0

        feats = VGGBackbone(
            feat_channels=self.feat_channels,
            use_batchnorm=True,
            use_max_pooling=False,
            padding=self.conv_padding,
            stage_channels=((64, 64), (64, 64), (128, 128),
                            (self.feat_channels, self.feat_channels)),
            dtype=self.dtype, name="backbone")(x, train=train)
        logits = VGGDetectorHead(
            lat_channels=self.lat_channels, out_channels=1,
            use_batchnorm=True, padding=self.conv_padding,
            dtype=self.dtype, name="detector_head")(feats, train=train)
        raw_desc = VGGDescriptorHead(
            out_channels=self.descriptor_dim, use_batchnorm=True,
            padding=self.conv_padding,
            dtype=self.dtype, name="descriptor_head")(feats, train=train)

        return extract_keypoints(
            feats, logits.astype(jnp.float32), raw_desc.astype(jnp.float32),
            (H, W), None, self.config, score_mask)


def _port_conv(params: Dict, w, b):
    params["kernel"] = jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))
    params["bias"] = jnp.asarray(np.asarray(b))


def _port_bn(sd, prefix):
    return (
        {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
         "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))},
        {"mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"])),
         "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"]))},
    )


def load_silk_torch_weights(state_dict) -> Dict[str, Any]:
    """Port a SiLK pvgg checkpoint (after lightning `_mods.model.` prefix
    stripping) to this module's flax params/batch_stats.

    Expected torch keys (ParametricVGG):
      backbone.layers.{s}.{c}.0.weight/bias        (conv)
      backbone.layers.{s}.{c}.2.weight/bias/running_mean/running_var  (bn)
      detector_head._detH1.0/.2..., ._detH2.0/.1...
      descriptor_head._desH1.0/.2..., ._desH2.0/.1...
    """
    sd = {re.sub(r"^(_mods\.model\.|model\.)", "", k): v
          for k, v in state_dict.items()}
    # the REAL module layout (verified against the reference SiLKModel's
    # state dict, silk/silk.py SiLKVGG -> SharedBackboneMultipleHeads):
    #   backbone._backbone.layers.{s}.{c}.{0 conv | 2 bn}
    #   backbone._heads._mods.logits._detH{1,2}...
    #   backbone._heads._mods.raw_descriptors._desH{1,2}...
    # normalize it to the flat names the mapping below consumes
    sd = {k.replace("backbone._backbone.", "backbone.")
           .replace("backbone._heads._mods.logits.", "detector_head.")
           .replace("backbone._heads._mods.raw_descriptors.",
                    "descriptor_head."): v
          for k, v in sd.items()}
    params: Dict[str, Any] = {"backbone": {}, "detector_head": {},
                              "descriptor_head": {}}
    stats: Dict[str, Any] = {"backbone": {}, "detector_head": {},
                             "descriptor_head": {}}

    for s in range(4):
        for c in range(2):
            name = f"l{s + 1}_{c}"
            conv: Dict[str, Any] = {}
            _port_conv(conv, sd[f"backbone.layers.{s}.{c}.0.weight"],
                       sd[f"backbone.layers.{s}.{c}.0.bias"])
            bn_p, bn_s = _port_bn(sd, f"backbone.layers.{s}.{c}.2")
            params["backbone"][name] = {"conv": conv, "bn": bn_p}
            stats["backbone"][name] = {"bn": bn_s}

    for head, tpre in (("detector_head", "_det"), ("descriptor_head", "_des")):
        conv1: Dict[str, Any] = {}
        _port_conv(conv1, sd[f"{head}.{tpre}H1.0.weight"],
                   sd[f"{head}.{tpre}H1.0.bias"])
        bn1_p, bn1_s = _port_bn(sd, f"{head}.{tpre}H1.2")
        conv2: Dict[str, Any] = {}
        _port_conv(conv2, sd[f"{head}.{tpre}H2.0.weight"],
                   sd[f"{head}.{tpre}H2.0.bias"])
        bn2_p, bn2_s = _port_bn(sd, f"{head}.{tpre}H2.1")
        params[head] = {"h1": {"conv": conv1, "bn": bn1_p}, "h2_conv": conv2,
                        "h2_bn": bn2_p}
        stats[head] = {"h1": {"bn": bn1_s}, "h2_bn": bn2_s}

    return {"params": params, "batch_stats": stats}
