#!/usr/bin/env python
"""Extractor validation entry point: same-time keypoint/descriptor metrics
(R@1/3, VVD, MMA@1/3, MR, HE-AUC) + validation losses.

Parity with reference `val_extractor.py:62-233` (val_model_by_loss).

Usage:
  python val_extractor.py --config configs/train_EIM_stage1_MVSEC_SP_MNN.yaml \
      --ckpt runs/.../checkpoints/final [key=value ...]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/train_EIM_stage1_MVSEC_SP_MNN.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from ei_nexus_tpu.utils import load_config
    from ei_nexus_tpu.models import (EIM, build_model,
                                     eim_config_from_dict)
    from ei_nexus_tpu.losses import build_losses
    from ei_nexus_tpu.train import (build_optimizer, create_train_state,
                                    restore_any_checkpoint)
    from ei_nexus_tpu.train.evaluate import val_extractor
    from ei_nexus_tpu.train.steps import batch_representation
    from ei_nexus_tpu.data import DataLoader
    from ei_nexus_tpu.data.mvsec import fetch_mvsec_dataset
    from ei_nexus_tpu.data.ec import fetch_ec_dataset

    cfg = load_config(args.config, args.overrides)
    from ei_nexus_tpu.utils.platform import apply_platform
    apply_platform(cfg.get("device"))
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ds_cfg = cfg.dataset.to_dict()
    H, W = ds_cfg["resolution"]
    bins, rep = ds_cfg["channel"], ds_cfg["representation_type"]
    fetch = fetch_mvsec_dataset if ds_cfg["name"] == "mvsec" \
        else fetch_ec_dataset
    val_ds = fetch(ds_cfg, "val")
    loader = DataLoader(val_ds,
                        batch_size=ds_cfg.get("val", {}).get("batch_size", 1),
                        shuffle=False, drop_last=False)

    model = build_model(cfg.model.to_dict().get("name", "EIM"),
                        eim_config_from_dict(cfg.model.to_dict()))
    sample = val_ds[0]
    ev_rep, ev_mask = batch_representation(
        {k: np.asarray(v)[None] for k, v in sample[0].items()
         if k.startswith("events")}, rep, bins, H, W)
    variables = model.init({"params": jax.random.PRNGKey(0)}, ev_rep,
                           np.asarray(sample[0]["image"])[None], ev_mask)
    import optax
    state = create_train_state(model, variables, optax.sgd(0.0))
    if args.ckpt:
        state, _ = restore_any_checkpoint(args.ckpt, state, model.config)

    losses = build_losses(cfg.get_path("train.loss", {}) or {})
    metrics = val_extractor(state, model, loader, rep, bins, H, W,
                            losses=losses, max_batches=args.max_batches)
    print(json.dumps(metrics, indent=2, sort_keys=True))
    return metrics


if __name__ == "__main__":
    main()
