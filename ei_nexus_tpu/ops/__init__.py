"""Shared compute kernels: padding, NMS, keypoint selection, descriptor
sampling/upsampling. All jit/vmap-compatible; the NMS hot path has a Pallas
TPU kernel with an XLA fallback."""

from .pad import Padder
from .detector import (
    logits_to_prob,
    depth_to_space,
    space_to_depth,
    remove_border_scores,
    nms,
    select_topk_keypoints,
    smooth_score_mask,
)
from .descriptor import (
    normalize_descriptors,
    sample_descriptors_lowres,
    sample_descriptors_fullres,
    upsample_descriptors,
    dense_descriptors,
)

__all__ = [
    "Padder",
    "logits_to_prob", "depth_to_space", "space_to_depth",
    "remove_border_scores", "nms", "select_topk_keypoints",
    "smooth_score_mask",
    "normalize_descriptors", "sample_descriptors_lowres",
    "sample_descriptors_fullres", "upsample_descriptors", "dense_descriptors",
]
