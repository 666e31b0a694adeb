"""Torch checkpoint porting for the composite EIM model.

The reference ships trained checkpoints (e.g.
ckpts/MVSEC_EI_SP_LG_ft_Stage2.pth, loaded at
test_events-image_different_time.py:156) whose state dict nests
`event_extractor.extractor.*`, `image_extractor.extractor.*` and
`matcher.matcher.*`. This module maps them onto this framework's flax
variables so reference-trained weights evaluate here directly (the
correctness gate of SURVEY.md §7.6): conv kernels OIHW -> HWIO, BN params +
running stats split into params/batch_stats, LightGlue dense transposes.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from .superpoint import load_superpoint_torch_weights
from .lightglue import load_lightglue_torch_weights
from .silk import load_silk_torch_weights


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}


def _bn(sd, key):
    params = {"scale": jnp.asarray(np.asarray(sd[f"{key}.weight"])),
              "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}
    stats = {"mean": jnp.asarray(np.asarray(sd[f"{key}.running_mean"])),
             "var": jnp.asarray(np.asarray(sd[f"{key}.running_var"]))}
    return params, stats


def load_vgg_extractor_torch_weights(state_dict: Mapping[str, Any],
                                     use_batchnorm: bool = True
                                     ) -> Dict[str, Any]:
    """Reference VGGExtractor/VGGExtractorNP state dict (keys backbone.l{s}.
    {i}.*, detector_head._detH1/2.*, descriptor_head._desH1/2.*) -> flax
    {params, batch_stats} for models.extractor.VGGExtractor."""
    sd = dict(state_dict)
    params: Dict[str, Any] = {"backbone": {}, "detector_head": {},
                              "descriptor_head": {}}
    stats: Dict[str, Any] = {"backbone": {}, "detector_head": {},
                             "descriptor_head": {}}

    for s in range(1, 5):
        for i in range(2):
            name = f"l{s}_{i}"
            block = {"conv": _conv(sd, f"backbone.l{s}.{i}.0")}
            st = {}
            if use_batchnorm:
                block["bn"], st["bn"] = _bn(sd, f"backbone.l{s}.{i}.2")
            params["backbone"][name] = block
            if st:
                stats["backbone"][name] = st

    for head, pre in (("detector_head", "_det"), ("descriptor_head", "_des")):
        h1 = {"conv": _conv(sd, f"{head}.{pre}H1.0")}
        hst: Dict[str, Any] = {}
        if use_batchnorm:
            h1["bn"], bn1_s = _bn(sd, f"{head}.{pre}H1.2")
            hst["h1"] = {"bn": bn1_s}
        params[head] = {"h1": h1, "h2_conv": _conv(sd, f"{head}.{pre}H2.0")}
        if use_batchnorm:
            params[head]["h2_bn"], h2_s = _bn(sd, f"{head}.{pre}H2.1")
            hst["h2_bn"] = h2_s
        stats[head] = hst

    out = {"params": params}
    if use_batchnorm:
        out["batch_stats"] = stats
    return out


def _strip(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def load_eim_torch_checkpoint(state_dict: Mapping[str, Any],
                              image_extractor_type: str = "superpointv1",
                              matcher_type: str = "LightGlue",
                              n_lightglue_layers: int = 9,
                              use_batchnorm: bool = True) -> Dict[str, Any]:
    """Full reference EIM state dict -> flax variables for models.eim.EIM.

    Handles the reference's nesting (EIM.py: event_extractor.extractor.*,
    image_extractor.extractor.*, matcher.matcher.*) and the stage-surgery
    prefixes. Returns {params, batch_stats} with the same subtree names the
    flax model uses (event_extractor / image_extractor / matcher.lightglue).
    """
    ev_sd = _strip(state_dict, "event_extractor.extractor.")
    im_sd = _strip(state_dict, "image_extractor.extractor.")
    ma_sd = _strip(state_dict, "matcher.matcher.")

    variables: Dict[str, Any] = {"params": {}, "batch_stats": {}}

    ev = load_vgg_extractor_torch_weights(ev_sd, use_batchnorm)
    variables["params"]["event_extractor"] = ev["params"]
    if "batch_stats" in ev:
        variables["batch_stats"]["event_extractor"] = ev["batch_stats"]

    if image_extractor_type == "superpointv1":
        sp = load_superpoint_torch_weights(im_sd)
        variables["params"]["image_extractor"] = sp["params"]
    elif image_extractor_type == "silk":
        # reference SiLKModel nests the torch model at .model.*
        silk_sd = {k[len("model."):] if k.startswith("model.") else k: v
                   for k, v in im_sd.items()}
        silk = load_silk_torch_weights(silk_sd)
        variables["params"]["image_extractor"] = silk["params"]
        variables["batch_stats"]["image_extractor"] = silk["batch_stats"]
    else:
        raise ValueError(image_extractor_type)

    if matcher_type == "LightGlue" and ma_sd:
        lg = load_lightglue_torch_weights(ma_sd, n_layers=n_lightglue_layers)
        variables["params"]["matcher"] = {"lightglue": lg["params"]}
    return variables


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load a .pth file into a numpy state dict (torch CPU)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in obj.items()}


def load_silk_lightning_file(path: str) -> Dict[str, Any]:
    """Load a SiLK pytorch-lightning checkpoint (the released pvgg-4.ckpt
    layout) into flax variables for models.silk.SiLKVGG.

    The reference loads these with state_dict_key="state_dict" and strips
    the "_mods.model." prefix (silk_extractor.py:167-174 via
    silk/config/model.py:19-80); replicate both steps here so the released
    blob ports with one call the day it is available."""
    sd = load_torch_file(path)  # pops the lightning "state_dict" wrapper
    pre = "_mods.model."
    sd = {k[len(pre):] if k.startswith(pre) else k: v for k, v in sd.items()}
    return load_silk_torch_weights(sd)


def load_eim_checkpoint_file(path: str, variables: Dict[str, Any],
                             image_extractor_type: str = "superpointv1",
                             matcher_type: str = "LightGlue",
                             n_lightglue_layers: int = 9,
                             use_batchnorm: bool = True) -> Dict[str, Any]:
    """Port a reference on-disk EIM checkpoint (.pth) onto init variables.

    This is the eval-CLI ingest path for reference-released checkpoints
    (e.g. ckpts/MVSEC_EI_SP_LG_ft_Stage2.pth, loaded by the reference at
    test_events-image_different_time.py:156 with plain
    `model.load_state_dict(torch.load(path), strict=False)`). Ported
    subtrees replace the matching roots of `variables` (an init'd flax
    variables dict); roots the checkpoint does not carry (e.g. an MNN
    matcher with no parameters) keep their init values, mirroring the
    reference's strict=False semantics."""
    sd = load_torch_file(path)
    ported = load_eim_torch_checkpoint(
        sd, image_extractor_type=image_extractor_type,
        matcher_type=matcher_type,
        n_lightglue_layers=n_lightglue_layers,
        use_batchnorm=use_batchnorm)
    out = {col: dict(tree) for col, tree in variables.items()}
    for col, tree in ported.items():
        for root, sub in tree.items():
            if col not in out:
                out[col] = {}
            out[col][root] = sub
    return out
