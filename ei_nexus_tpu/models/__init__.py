"""Model zoo: VGG building blocks, event/image keypoint extractors, matchers
(MNN, LightGlue) and the composite EIM pipeline. Flax linen modules in NHWC
layout with configurable compute dtype (bf16 on TPU)."""

from .vgg import VGGBlock, VGGBackbone, VGGDetectorHead, VGGDescriptorHead
from .extractor import (
    KeypointExtractorConfig,
    VGGExtractor,
    extract_keypoints,
)
from .superpoint import SuperPointV1, load_superpoint_torch_weights
from .silk import SiLKVGG, load_silk_torch_weights
from .mnn import mnn_match
from .lightglue import LightGlue, LightGlueConfig
from .eim import EIM, EIMConfig, build_model

__all__ = [
    "VGGBlock", "VGGBackbone", "VGGDetectorHead", "VGGDescriptorHead",
    "KeypointExtractorConfig", "VGGExtractor", "extract_keypoints",
    "SuperPointV1", "load_superpoint_torch_weights",
    "SiLKVGG", "load_silk_torch_weights",
    "mnn_match", "LightGlue", "LightGlueConfig",
    "EIM", "EIMConfig", "build_model",
]

from .config_adapter import eim_config_from_dict  # noqa: E402

__all__.append("eim_config_from_dict")
