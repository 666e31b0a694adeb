"""SuperPoint v1 image keypoint extractor (frozen teacher).

Capability parity with reference `core/modules/image_extractors/
superpoint_extractor.py:271` (the Magic-Leap SuperPoint architecture +
shared SiLK-style postprocessing), as a flax module in NHWC:

 - conv encoder (64,64)-pool-(64,64)-pool-(128,128)-pool-(128,128), ReLU,
   no batchnorm; detector head convPa(256,3x3)->convPb(65,1x1); descriptor
   head convDa(256,3x3)->convDb(256,1x1);
 - input is a 0-255 grayscale image, divided by 255 inside (reference
   superpoint_extractor.py:373);
 - postprocessing shared with the event extractors (fixed-K keypoints).

Pretrained weights are ported from the torch checkpoint
(superpoint_v1.pth, LightGlue release) via `load_superpoint_torch_weights`
— OIHW -> HWIO transpose per conv. The reference downloads them at
construction time (superpoint_extractor.py:316); this build loads from a
local file (zero-egress environment) and falls back to random init.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import Padder
from .extractor import KeypointExtractorConfig, extract_keypoints


class SuperPointV1(nn.Module):
    config: KeypointExtractorConfig = KeypointExtractorConfig()
    descriptor_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array,
                 score_mask: Optional[jax.Array] = None,
                 train: bool = False) -> Dict[str, Any]:
        """image: (B, H, W, 1) grayscale in [0, 255]."""
        assert image.ndim == 4
        H, W = image.shape[1], image.shape[2]
        x = image.astype(self.dtype) / 255.0
        if x.shape[-1] == 3:
            # ITU-R 601 luma, matching kornia rgb_to_grayscale
            x = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2]
                 + 0.114 * x[..., 2:3])

        padder = Padder(H, W, 8)
        x = padder.pad(x)

        def conv(name, feats, kernel=3):
            return nn.Conv(feats, (kernel, kernel),
                           padding="SAME" if kernel == 3 else "VALID",
                           dtype=self.dtype, name=name)

        x = nn.relu(conv("conv1a", 64)(x))
        x = nn.relu(conv("conv1b", 64)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv("conv2a", 64)(x))
        x = nn.relu(conv("conv2b", 64)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv("conv3a", 128)(x))
        x = nn.relu(conv("conv3b", 128)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv("conv4a", 128)(x))
        feats = nn.relu(conv("conv4b", 128)(x))

        cPa = nn.relu(conv("convPa", 256)(feats))
        logits = conv("convPb", 65, kernel=1)(cPa)
        cDa = nn.relu(conv("convDa", 256)(feats))
        raw_desc = conv("convDb", self.descriptor_dim, kernel=1)(cDa)

        # SuperPoint applies the (unsmoothed) mask directly
        import dataclasses
        cfg = self.config
        if cfg.smooth_mask:
            cfg = dataclasses.replace(cfg, smooth_mask=False)
        return extract_keypoints(
            feats, logits.astype(jnp.float32), raw_desc.astype(jnp.float32),
            (H, W), padder, cfg, score_mask)


def load_superpoint_torch_weights(state_dict) -> Dict[str, Any]:
    """Convert a torch SuperPoint state dict to flax params.

    Accepts a dict of numpy/torch tensors keyed `conv1a.weight` etc.
    Conv weights OIHW -> HWIO.
    """
    params = {}
    for name in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"):
        w = np.asarray(state_dict[f"{name}.weight"])
        b = np.asarray(state_dict[f"{name}.bias"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return {"params": params}
