"""Stage-1 distillation losses: student (event extractor) vs frozen teacher
(image extractor) on score maps, logits, descriptors and backbone features.

Functional parity with reference `core/loss/extractor_loss.py` (ScoreLoss:6,
LogitsLoss:72, DescriptorsLoss:146, FeatureLoss:357). Masked reductions are
`sum(x*m)/sum(m)` with a zero-guard; maps are NHWC.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.detector import depth_to_space


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    m = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(x * m) / denom


def score_loss(pred_feats: Dict, gt_feats: Dict,
               mask: Optional[jax.Array] = None,
               mode: str = "mse", weight: float = 1.0,
               use_mask: bool = True) -> Tuple[jax.Array, Dict]:
    """Full-resolution keypoint-score distillation (reference ScoreLoss)."""
    pred = pred_feats["score"]
    gt = gt_feats["score"]
    if not use_mask:
        mask = None
    if mask is not None and mask.ndim == 4:
        mask = mask[..., 0]
    if mode == "bce":
        gt_bin = (gt > 0).astype(pred.dtype)
        eps = 1e-7
        p = jnp.clip(pred, eps, 1 - eps)
        loss = jnp.mean(-(gt_bin * jnp.log(p) + (1 - gt_bin) * jnp.log(1 - p)))
    elif mode == "mse-whole":
        g = jnp.where(mask, 0.0, gt) if mask is not None else gt
        loss = jnp.mean((pred - g) ** 2)
    elif mode == "mse":
        loss = _masked_mean((pred - gt) ** 2, mask)
    elif mode == "mae":
        loss = _masked_mean(jnp.abs(pred - gt), mask)
    else:
        raise NotImplementedError(f"score loss mode {mode!r}")
    loss = loss * weight
    return loss, {"extractor_keypoints_loss": loss}


def logits_loss(pred_feats: Dict, gt_feats: Dict,
                mask: Optional[jax.Array] = None,
                cell_size: int = 8, weight: float = 1.0) -> Tuple[jax.Array, Dict]:
    """MSE on pixel-shuffled logits (reference LogitsLoss)."""
    pred = depth_to_space(pred_feats["logits"], cell_size)
    gt = depth_to_space(gt_feats["logits"], cell_size)
    if mask is not None and mask.ndim == 4:
        mask = mask[..., 0]
    err = (pred - gt) ** 2
    if mask is not None:
        err = err * mask.astype(err.dtype)
    loss = jnp.mean(err) * weight
    return loss, {"extractor_keypoints_loss": loss}


def descriptors_loss(pred_feats: Dict, gt_feats: Dict,
                     mask: Optional[jax.Array] = None,
                     mode: str = "mae", desc_type: str = "normalized",
                     weight: float = 1.0, use_mask: bool = True,
                     triplet_margin: float = 0.2,
                     mae_weight: float = 1.0,
                     triplet_weight: float = 100.0) -> Tuple[jax.Array, Dict]:
    """Dense descriptor distillation (reference DescriptorsLoss).

    Maps are (B, H, W, D); mask is (B, H, W) event occupancy.
    """
    key = {"normalized": "normalized_descriptors",
           "raw": "raw_descriptors",
           "coarse": "coarse_descriptors"}[desc_type]
    pred = pred_feats[key]
    gt = gt_feats[key]
    if not use_mask:
        mask = None
    if mask is not None and mask.ndim == 4:
        mask = mask[..., 0]
    chan_mask = None if mask is None else mask[..., None]

    if mode == "mse":
        loss = _masked_mean((pred - gt) ** 2, chan_mask)
    elif mode == "mae":
        loss = _masked_mean(jnp.abs(pred - gt), chan_mask)
    elif mode == "cosine_similarity":
        cos = jnp.sum(pred * gt, -1) / jnp.maximum(
            jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1),
            1e-12)
        loss = 1.0 - (_masked_mean(cos, mask) if mask is not None
                      else jnp.mean(cos))
    elif mode == "dual-softmax":
        loss = _dual_softmax_loss(pred, gt, mask)
    elif mode == "triplet":
        loss = _triplet_loss(pred, gt, mask, triplet_margin)
    elif mode == "mae+triplet":
        mae = _masked_mean(jnp.abs(pred_feats["normalized_descriptors"]
                                   - gt_feats["normalized_descriptors"]),
                           chan_mask)
        # reference quirk reproduced verbatim: the triplet leg takes BOTH
        # sides from pred_feats (extractor_loss.py:344-346), i.e. the
        # student's raw descriptors against themselves — a spatial
        # self-repulsion term (positives are the same pixel), not a
        # teacher comparison
        tri = _triplet_loss(pred_feats["raw_descriptors"],
                            pred_feats["raw_descriptors"], mask,
                            triplet_margin)
        loss = mae_weight * mae + triplet_weight * tri
    else:
        raise NotImplementedError(f"descriptor loss mode {mode!r}")
    loss = loss * weight
    return loss, {"extractor_descriptor_loss": loss}


def _dual_softmax_loss(pred: jax.Array, gt: jax.Array,
                       mask: Optional[jax.Array]) -> jax.Array:
    """-log of dual-softmax confidence at corresponding pixels
    (reference DescriptorsLoss.dual_softmax_loss; note the reference divides
    the mean by B a second time, reproduced here)."""
    B, H, W, D = pred.shape
    p = pred.reshape(B, H * W, D)
    g = gt.reshape(B, H * W, D)
    if mask is None:
        m = jnp.ones((B, H * W), p.dtype)
    else:
        m = mask.reshape(B, H * W).astype(p.dtype)
    sim = jnp.einsum("bnd,bmd->bnm", p, g)
    conf = jax.nn.softmax(sim, -1) * jax.nn.softmax(sim, -2)
    conf_gt = m[..., :, None] * m[..., None, :]
    ll = -jnp.log(conf + 1e-8)
    loss = jnp.sum(ll * (conf_gt > 0)) / jnp.maximum(
        jnp.sum(conf_gt > 0), 1)
    return loss / B


def _triplet_loss(pred: jax.Array, gt: jax.Array,
                  mask: Optional[jax.Array], margin: float) -> jax.Array:
    """In-batch triplet on teacher/student descriptor distances
    (reference DescriptorsLoss.triplet_loss)."""
    B, H, W, D = pred.shape
    p = pred.reshape(B, H * W, D)
    g = gt.reshape(B, H * W, D)
    if mask is None:
        m = jnp.ones((B, H * W), p.dtype)
    else:
        m = mask.reshape(B, H * W).astype(p.dtype)
    pair_mask = m[..., :, None] * m[..., None, :]
    # pairwise L2 distances
    d2 = (jnp.sum(p**2, -1)[..., :, None] + jnp.sum(g**2, -1)[..., None, :]
          - 2 * jnp.einsum("bnd,bmd->bnm", p, g))
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    n = H * W
    diag = jnp.eye(n, dtype=bool)[None]
    d_pos = jnp.sum(jnp.where(diag, dist, 0.0), -1)[..., :, None]
    loss_map = jnp.maximum(d_pos - dist + margin, 0.0)
    loss_map = jnp.where(diag, 0.0, loss_map)
    loss_map = jnp.where(pair_mask > 0, loss_map, 0.0)
    return jnp.mean(loss_map)


def feature_loss(pred_feats: Dict, gt_feats: Dict, mode: str = "mse",
                 weight: float = 1.0) -> Tuple[jax.Array, Dict]:
    """Backbone feature distillation (reference FeatureLoss)."""
    pred = pred_feats["backbone_feats"]
    gt = gt_feats["backbone_feats"]
    if mode == "mse":
        loss = jnp.mean((pred - gt) ** 2)
    elif mode == "mae":
        loss = jnp.mean(jnp.abs(pred - gt))
    else:
        raise NotImplementedError(f"feature loss mode {mode!r}")
    loss = loss * weight
    return loss, {"feature_loss": loss}
