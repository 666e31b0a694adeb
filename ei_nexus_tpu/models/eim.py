"""Composite models: EIM (event-image matching) and ImageImageMatcher.

Capability parity with reference `core/modules/EIM.py:13`,
`core/modules/ImageImageMatcher.py:13`, `core/modules/Matchers.py:14`
(Matcher wrapper) and `core/modules/Extractors.py` (type dispatch +
freeze flags), re-designed for flax's functional model:

 - extractors/matchers are submodules; `build_model` dispatches on config
   (event: vgg | vgg_np; image: superpointv1 | silk; matcher: MNN |
   LightGlue | None);
 - the Matcher wrapper's pad-to-max_points with random positions/descriptors
   (Matchers.py:396-470, pad_mode=random) becomes a fill of the *invalid*
   fixed-K slots, driven by a flax RNG stream ('pad') when training; at eval
   the validity masks flow into the matchers instead of the reference's
   per-sample ragged loop (Matchers.py:521-532) — same matches, one program;
 - freezing (Extractors.py freeze flags) is enforced in the train step by
   zeroing gradients of frozen subtrees (`train/partition.py`), not by
   module state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .extractor import KeypointExtractorConfig, VGGExtractor
from .superpoint import SuperPointV1
from .silk import SiLKVGG
from .mnn import mnn_match
from .lightglue import LightGlue, LightGlueConfig


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    type: Optional[str] = "MNN"          # "MNN" | "LightGlue" | None
    freeze: bool = True
    max_points_num: int = 1024
    pad_mode: str = "random"             # "random" | "zeros" | "mask"
    desc_scale_factor: float = 1.0
    ratio_thresh: Optional[float] = None
    distance_thresh: Optional[float] = None
    lightglue: LightGlueConfig = LightGlueConfig()


@dataclasses.dataclass(frozen=True)
class ExtractorSpec:
    """One extractor's type + hyperparameters (configs/model/EIM_*.yaml)."""

    type: str = "vgg"                    # vgg | vgg_np | superpointv1 | silk
    freeze: bool = False
    dtype: str = "float32"               # conv compute dtype (bf16 on TPU)
    in_channels: int = 16
    feat_channels: int = 128
    descriptor_dim: int = 256
    lat_channels: int = 256
    use_batchnorm: bool = True
    padding: int = 1
    keypoints: KeypointExtractorConfig = KeypointExtractorConfig()


@dataclasses.dataclass(frozen=True)
class EIMConfig:
    event_extractor: ExtractorSpec = ExtractorSpec(type="vgg")
    image_extractor: ExtractorSpec = ExtractorSpec(
        type="superpointv1", freeze=True)
    matcher: MatcherConfig = MatcherConfig()


def _build_extractor(spec: ExtractorSpec, name: str) -> nn.Module:
    kcfg = spec.keypoints
    dtype = jnp.dtype(spec.dtype)
    if spec.type == "vgg":
        return VGGExtractor(
            config=kcfg, feat_channels=spec.feat_channels,
            descriptor_dim=spec.descriptor_dim,
            lat_channels=spec.lat_channels,
            use_batchnorm=spec.use_batchnorm, use_max_pooling=True,
            dtype=dtype, name=name)
    if spec.type == "vgg_np":
        kcfg = dataclasses.replace(
            kcfg, cell_size=1, sparse_desc_from="fullres",
            coord_offset=9.0 if spec.padding == 0 else 0.0)
        return VGGExtractor(
            config=kcfg, feat_channels=spec.feat_channels,
            descriptor_dim=spec.descriptor_dim,
            lat_channels=spec.lat_channels,
            use_batchnorm=spec.use_batchnorm, use_max_pooling=False,
            conv_padding="VALID" if spec.padding == 0 else "SAME",
            dtype=dtype, name=name)
    if spec.type == "superpointv1":
        return SuperPointV1(config=kcfg, descriptor_dim=spec.descriptor_dim,
                            dtype=dtype, name=name)
    if spec.type == "silk":
        kcfg = dataclasses.replace(
            kcfg, cell_size=1, sparse_desc_from="fullres",
            descriptor_scale_factor=1.41,
            coord_offset=9.0 if spec.padding == 0 else 0.0)
        return SiLKVGG(config=kcfg,
                       conv_padding="VALID" if spec.padding == 0 else "SAME",
                       dtype=dtype, name=name)
    raise ValueError(f"unknown extractor type {spec.type!r}")


class Matcher(nn.Module):
    """Matcher wrapper: slot-filling + type dispatch (reference Matcher)."""

    config: MatcherConfig = MatcherConfig()

    def _fit_slots(self, feats: Dict[str, jax.Array], fill_random: bool,
                   rng: Optional[jax.Array]) -> Dict[str, jax.Array]:
        """Truncate/pad the fixed-K slots to max_points_num; optionally fill
        invalid slots with random positions + normalized random descriptors
        (reference pad_sparse_*_to_length, Matchers.py:396-470)."""
        L = self.config.max_points_num
        pos = feats["sparse_positions"]
        desc = feats["sparse_descriptors"]
        valid = feats.get(
            "sparse_valid", jnp.ones(pos.shape[:2], bool))
        B, K, _ = pos.shape
        if K >= L:
            pos, desc, valid = pos[:, :L], desc[:, :L], valid[:, :L]
        else:
            pad = L - K
            pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)))
            desc = jnp.pad(desc, ((0, 0), (0, pad), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        if fill_random:
            kp_rng, d_rng = jax.random.split(rng)
            size = feats["image_size"][:, None, :]  # (B, 1, 2) = (H, W)
            rand_yx = jax.random.uniform(
                kp_rng, (B, L, 2), pos.dtype) * size
            rand_pos = jnp.concatenate(
                [rand_yx, jnp.zeros((B, L, 1), pos.dtype)], axis=-1)
            rand_desc = jax.random.normal(d_rng, desc.shape, desc.dtype)
            rand_desc = rand_desc / jnp.maximum(
                jnp.linalg.norm(rand_desc, axis=-1, keepdims=True), 1e-12)
            rand_desc = rand_desc * self.config.desc_scale_factor
            m = valid[..., None]
            pos = jnp.where(m, pos, rand_pos)
            desc = jnp.where(m, desc, rand_desc)
            valid = jnp.ones_like(valid)
        out = dict(feats)
        out["sparse_positions"] = pos
        out["sparse_descriptors"] = desc
        out["sparse_valid"] = valid
        return out

    @nn.compact
    def __call__(self, feats0: Dict[str, jax.Array],
                 feats1: Dict[str, jax.Array],
                 training: bool = False) -> Optional[Dict[str, jax.Array]]:
        cfg = self.config
        if cfg.type is None:
            return None
        fill = training and cfg.pad_mode == "random"
        rng0 = rng1 = None
        if fill:
            rng0, rng1 = jax.random.split(self.make_rng("pad"))
        f0 = self._fit_slots(feats0, fill, rng0)
        f1 = self._fit_slots(feats1, fill, rng1)
        if cfg.type == "MNN":
            out = mnn_match(f0, f1, cfg.ratio_thresh, cfg.distance_thresh,
                            mutual_check=True)
        elif cfg.type == "LightGlue":
            out = LightGlue(config=cfg.lightglue, name="lightglue")(
                f0, f1, training=training)
        else:
            raise ValueError(f"unknown matcher type {cfg.type!r}")
        out["input_feats0"] = {k: f0[k] for k in
                               ("sparse_positions", "sparse_descriptors",
                                "sparse_valid", "image_size")}
        out["input_feats1"] = {k: f1[k] for k in
                               ("sparse_positions", "sparse_descriptors",
                                "sparse_valid", "image_size")}
        return out


class EIM(nn.Module):
    """Event extractor + (frozen) image extractor + matcher
    (reference EIM.py:13)."""

    config: EIMConfig = EIMConfig()

    @nn.compact
    def __call__(self, events: jax.Array, image: jax.Array,
                 events_mask: Optional[jax.Array] = None,
                 image_mask: Optional[jax.Array] = None,
                 training: bool = False) -> Tuple[Dict, Dict, Optional[Dict]]:
        """events: (B, H, W, bins) NHWC; image: (B, H, W, 1) in [0, 255];
        events_mask: (B, H, W) bool occupancy."""
        ev_ex = _build_extractor(self.config.event_extractor,
                                 "event_extractor")
        im_ex = _build_extractor(self.config.image_extractor,
                                 "image_extractor")
        ev_train = training and not self.config.event_extractor.freeze
        im_train = training and not self.config.image_extractor.freeze
        events_feats = ev_ex(events, events_mask, train=ev_train)
        image_feats = im_ex(image, image_mask, train=im_train)
        matcher_training = training and not self.config.matcher.freeze
        matches = Matcher(config=self.config.matcher, name="matcher")(
            events_feats, image_feats, training=matcher_training)
        return events_feats, image_feats, matches


class ImageImageMatcher(nn.Module):
    """Two-image variant with a single shared extractor (reference
    ImageImageMatcher.py:13 — SuperPoint/SiLK baseline experiments)."""

    config: EIMConfig = EIMConfig()

    @nn.compact
    def __call__(self, image0: jax.Array, image1: jax.Array,
                 mask0: Optional[jax.Array] = None,
                 mask1: Optional[jax.Array] = None,
                 training: bool = False) -> Tuple[Dict, Dict, Optional[Dict]]:
        extractor = _build_extractor(self.config.image_extractor,
                                     "image_extractor")
        im_train = training and not self.config.image_extractor.freeze
        feats0 = extractor(image0, mask0, train=im_train)
        feats1 = extractor(image1, mask1, train=im_train)
        matcher_training = training and not self.config.matcher.freeze
        matches = Matcher(config=self.config.matcher, name="matcher")(
            feats0, feats1, training=matcher_training)
        return feats0, feats1, matches


def build_model(model_type: str, config: EIMConfig) -> nn.Module:
    """Name -> module dispatch (reference core/modules/__init__.py:5).

    "EDM" is accepted as EIM: the reference's own stage-2 model config is
    named EDM (configs/model/EIM_stage2.yaml:1) yet its factory rejects it
    — its trainers construct EIM directly and never consult the name. Here
    every entry point dispatches through this factory, so the stage-2 name
    must resolve."""
    if model_type in ("EIM", "EDM"):
        return EIM(config=config)
    if model_type == "ImageImageMatcher":
        return ImageImageMatcher(config=config)
    raise ValueError(f"unknown model type {model_type!r}")
