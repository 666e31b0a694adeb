"""Keypoint extractor: VGG backbone + heads + fixed-K postprocessing.

Capability parity with reference `core/modules/event_extractors/
EventExtractors.py:437` (VGGExtractor, cell=8) and `:238` (VGGExtractorNP,
cell=1, optional padding=0 with the +9px coordinate remap), unified into one
flax module + a pure postprocessing function.

TPU-first output contract (replaces the reference's ragged tuples):
  sparse_positions  (B, K, 3)  (y+0.5, x+0.5, prob), score-sorted
  sparse_valid      (B, K)     slot validity (threshold rule + in-image)
  sparse_descriptors(B, K, D)
plus the dense maps (score, nms, probability, descriptors) the losses and
metrics consume. K is static (`detection_top_k`), so the whole extractor jits
into a single XLA program with no host sync.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    Padder, logits_to_prob, depth_to_space, remove_border_scores, nms,
    select_topk_keypoints, smooth_score_mask, normalize_descriptors,
    sample_descriptors_lowres, sample_descriptors_fullres,
    upsample_descriptors, dense_descriptors,
)
from ..ops.detector import dense_positions as _dense_positions
from .vgg import VGGBackbone, VGGDetectorHead, VGGDescriptorHead


@dataclasses.dataclass(frozen=True)
class KeypointExtractorConfig:
    """Static postprocessing configuration (hashable; safe as nn.Module
    attribute / jit static arg)."""

    cell_size: int = 8
    nms_radius: int = 4
    detection_top_k: int = 1024
    detection_threshold: float = 1.0
    remove_borders: int = 4
    ordering: str = "yx"
    descriptor_scale_factor: float = 1.0
    smooth_mask: bool = True          # 3x3-dilate the event mask before use
    coord_offset: float = 0.0         # +9.0 for the padding=0 NP variant
    sparse_desc_from: str = "lowres"  # "lowres" (cell 8) | "fullres" (cell 1)
    nms_impl: str = "auto"            # "auto" | "xla" | "pallas"


def extract_keypoints(
    feats: jax.Array,
    logits: jax.Array,
    raw_desc: jax.Array,
    image_size: Tuple[int, int],
    padder: Optional[Padder],
    cfg: KeypointExtractorConfig,
    score_mask: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Turn head outputs into the full feature dict (all shapes static).

    feats/logits/raw_desc are NHWC maps on the *padded* grid; `image_size`
    is the original (H, W). Reference pipeline order reproduced: probability
    -> pixel-shuffle score -> event-mask -> border removal -> NMS -> top-k
    threshold -> descriptor sampling -> unpad & in-image filtering.
    """
    H, W = image_size
    cell = cfg.cell_size
    B = logits.shape[0]
    hp, wp = logits.shape[1], logits.shape[2]
    padded_size = (hp * cell, wp * cell)

    probability = logits_to_prob(logits)          # (B, hp, wp, cell^2+1|1)
    score = depth_to_space(probability, cell)     # (B, Hp, Wp)

    if score_mask is not None:
        mask = score_mask
        if mask.ndim == 4:
            mask = mask[..., 0]
        if padder is not None:
            mask = padder.pad(mask, hw_axes=(-2, -1))
        if cfg.smooth_mask:
            mask = smooth_score_mask(mask)
        score = jnp.where(mask, score, 0.0)

    masked_score = score
    bordered = remove_border_scores(masked_score, cfg.remove_borders)
    # keypoint selection is non-differentiable (reference uses nonzero);
    # gradients flow through the score/descriptor maps, not the NMS loop
    nms_map = jax.lax.stop_gradient(
        nms(jax.lax.stop_gradient(bordered), cfg.nms_radius,
            impl=cfg.nms_impl))
    # after `nms(radius=r)` surviving scores are > r apart (Chebyshev), so
    # top-k can exactly reduce to per-(r+1)-block maxima first (16x less
    # sort volume — the dominant selection cost on TPU)
    positions, valid = select_topk_keypoints(
        nms_map, cfg.detection_top_k, cfg.detection_threshold, cfg.ordering,
        min_distance=cfg.nms_radius + 1)

    # sparse descriptors at padded-grid positions
    if cfg.sparse_desc_from == "lowres":
        sparse_desc = sample_descriptors_lowres(
            raw_desc, positions, padded_size,
            cfg.descriptor_scale_factor, True, cfg.ordering)
    else:
        sparse_desc = sample_descriptors_fullres(
            raw_desc, positions,
            cfg.descriptor_scale_factor, True, cfg.ordering)

    # dense descriptor maps
    if cell > 1:
        coarse = normalize_descriptors(raw_desc, cfg.descriptor_scale_factor)
        normalized = upsample_descriptors(
            raw_desc, padded_size, cfg.descriptor_scale_factor)
    else:
        coarse = normalize_descriptors(raw_desc, cfg.descriptor_scale_factor)
        normalized = coarse

    # The reference's remove_border_points mutates the score tensor IN PLACE
    # (detector_util.py:153-163), so the `score` it returns — and therefore
    # the stage-1 ScoreLoss target/prediction and dense_positions — has
    # zeroed borders. Reproduce that exactly.
    masked_score = bordered
    if cell == 1:
        # cell=1: depth_to_space/squeeze return VIEWS in torch, so the
        # reference's in-place mask/border zeroing also mutates the returned
        # `probability` (it aliases `score`). Mirror that.
        probability = masked_score[..., None]

    # unpad maps + shift positions back to image coordinates
    if padder is not None:
        score_u = padder.unpad(masked_score, hw_axes=(-2, -1))
        nms_u = padder.unpad(nms_map, hw_axes=(-2, -1))
        normalized_u = padder.unpad(normalized)
        positions = padder.unpad_positions(positions, cfg.ordering)
    else:
        score_u, nms_u, normalized_u = masked_score, nms_map, normalized

    # in-image filter (reference filter_sparse_feats) -> validity, not drop
    if cfg.ordering == "yx":
        py, px = positions[..., 0], positions[..., 1]
    else:
        px, py = positions[..., 0], positions[..., 1]
    valid = valid & (py >= 0) & (py < H) & (px >= 0) & (px < W)

    # padding=0 coordinate remap (reference mapping_positions, +9 px)
    if cfg.coord_offset:
        positions = jnp.concatenate(
            [positions[..., :2] + cfg.coord_offset, positions[..., 2:]],
            axis=-1)

    # thresholded dense NMS map (reference `nms` output): keep only the
    # selected keypoints' scores (in score-map coordinates, pre-offset)
    Hs, Ws = score_u.shape[1], score_u.shape[2]
    if cfg.ordering == "yx":
        iy = jnp.floor(positions[..., 0] - cfg.coord_offset).astype(jnp.int32)
        ix = jnp.floor(positions[..., 1] - cfg.coord_offset).astype(jnp.int32)
    else:
        ix = jnp.floor(positions[..., 0] - cfg.coord_offset).astype(jnp.int32)
        iy = jnp.floor(positions[..., 1] - cfg.coord_offset).astype(jnp.int32)
    flat_idx = jnp.clip(iy, 0, Hs - 1) * Ws + jnp.clip(ix, 0, Ws - 1)
    kept = jax.vmap(lambda k, i, v: k.at[i].add(v))(
        jnp.zeros((B, Hs * Ws), nms_u.dtype), flat_idx,
        jnp.where(valid, positions[..., 2], 0.0))
    nms_thresholded = kept.reshape(B, Hs, Ws)

    dense_pos = _dense_positions(score_u, cfg.ordering)
    if cfg.coord_offset:
        dense_pos = jnp.concatenate(
            [dense_pos[..., :2] + cfg.coord_offset, dense_pos[..., 2:]],
            axis=-1)

    return {
        "image_size": jnp.broadcast_to(
            jnp.asarray([H, W], jnp.float32), (B, 2)),
        "backbone_feats": feats,
        "logits": logits,
        "raw_descriptors": raw_desc,
        "probability": probability,
        "score": score_u,
        "nms": nms_thresholded,
        "coarse_descriptors": coarse,
        "normalized_descriptors": normalized_u,
        "dense_descriptors": dense_descriptors(normalized_u),
        "dense_positions": dense_pos,
        "sparse_positions": positions,
        "sparse_valid": valid,
        "sparse_descriptors": sparse_desc,
    }


class VGGExtractor(nn.Module):
    """Event/image keypoint extractor (VGG backbone + detector/descriptor
    heads + postprocessing). `use_max_pooling=True` => cell 8 (reference
    VGGExtractor); False => cell 1 (VGGExtractorNP / SiLK family)."""

    config: KeypointExtractorConfig = KeypointExtractorConfig()
    feat_channels: int = 128
    descriptor_dim: int = 256
    lat_channels: int = 256
    use_batchnorm: bool = True
    use_max_pooling: bool = True
    conv_padding: str = "SAME"  # "VALID" for the padding=0 NP variant
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, score_mask: Optional[jax.Array] = None,
                 train: bool = False) -> Dict[str, Any]:
        assert x.ndim == 4, "expected NHWC input"
        H, W = x.shape[1], x.shape[2]
        cell = 8 if self.use_max_pooling else 1
        det_channels = cell * cell + 1 if cell > 1 else 1

        padder = Padder(H, W, cell) if cell > 1 else None
        if padder is not None:
            x = padder.pad(x)

        feats = VGGBackbone(
            feat_channels=self.feat_channels,
            use_batchnorm=self.use_batchnorm,
            use_max_pooling=self.use_max_pooling,
            padding=self.conv_padding,
            dtype=self.dtype, name="backbone")(x, train=train)
        logits = VGGDetectorHead(
            lat_channels=self.lat_channels, out_channels=det_channels,
            use_batchnorm=self.use_batchnorm, padding=self.conv_padding,
            dtype=self.dtype, name="detector_head")(feats, train=train)
        raw_desc = VGGDescriptorHead(
            out_channels=self.descriptor_dim,
            use_batchnorm=self.use_batchnorm, padding=self.conv_padding,
            dtype=self.dtype, name="descriptor_head")(feats, train=train)

        if self.conv_padding == "VALID":
            assert score_mask is None, \
                "score_mask unsupported with VALID conv padding"

        return extract_keypoints(
            feats, logits.astype(jnp.float32), raw_desc.astype(jnp.float32),
            (H, W), padder, self.config, score_mask)
