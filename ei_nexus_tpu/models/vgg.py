"""VGG building blocks: conv-relu(-BN) block, 4-stage backbone, detector and
descriptor heads.

Capability parity with reference `core/modules/net/` (vgg.py:5 vgg_block,
backbone.py:7 VGGBackBone, detector_head.py:6, descriptor_head.py:7) and the
vendored SiLK `ParametricVGG` (silk/backbones/superpoint/vgg.py:221 — same
block family with per-stage widths), as flax.linen modules:

 - NHWC layout, channels-last convs (TPU's native conv layout for the MXU);
 - block order conv -> ReLU -> BatchNorm exactly as the reference;
 - `padding=0` (VALID) supported for the SiLK-style no-padding variant;
 - configurable compute dtype (params stay f32; activations bf16 on TPU).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class VGGBlock(nn.Module):
    """Conv3x3 -> ReLU -> (BatchNorm)."""

    features: int
    use_batchnorm: bool = True
    padding: str = "SAME"  # "SAME" (=1) or "VALID" (=0)
    kernel: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, self.kernel, padding=self.padding,
                    dtype=self.dtype, name="conv")(x)
        x = nn.relu(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x


class VGGBackbone(nn.Module):
    """4-stage VGG encoder; stage widths (64,64)(64,64)(128,128)(C,C).

    With `use_max_pooling` the first three stages are followed by a 2x2
    max-pool (overall stride 8); without, full resolution (SiLK / NP
    variants). `stage_channels` generalizes to SiLK's ParametricVGG widths.
    """

    feat_channels: int = 128
    use_batchnorm: bool = True
    use_max_pooling: bool = True
    padding: str = "SAME"
    stage_channels: Sequence[Tuple[int, int]] = None  # default derived
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        stages = self.stage_channels or (
            (64, 64), (64, 64), (128, 128),
            (self.feat_channels, self.feat_channels))
        for si, widths in enumerate(stages):
            for ci, width in enumerate(widths):
                x = VGGBlock(width, self.use_batchnorm, self.padding,
                             dtype=self.dtype, name=f"l{si + 1}_{ci}")(
                                 x, train=train)
            if self.use_max_pooling and si < len(stages) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGGDetectorHead(nn.Module):
    """VGGBlock(lat) -> Conv1x1(out) -> (BatchNorm), no final activation."""

    lat_channels: int = 256
    out_channels: int = 1
    use_batchnorm: bool = True
    padding: str = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = VGGBlock(self.lat_channels, self.use_batchnorm, self.padding,
                     dtype=self.dtype, name="h1")(x, train=train)
        x = nn.Conv(self.out_channels, (1, 1), padding="VALID",
                    dtype=self.dtype, name="h2_conv")(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="h2_bn")(x)
        return x


class VGGDescriptorHead(nn.Module):
    """VGGBlock(out) -> Conv1x1(out) -> (BatchNorm)."""

    out_channels: int = 256
    use_batchnorm: bool = True
    padding: str = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = VGGBlock(self.out_channels, self.use_batchnorm, self.padding,
                     dtype=self.dtype, name="h1")(x, train=train)
        x = nn.Conv(self.out_channels, (1, 1), padding="VALID",
                    dtype=self.dtype, name="h2_conv")(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="h2_bn")(x)
        return x
