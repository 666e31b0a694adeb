#!/usr/bin/env python
"""Keypoint/descriptor benchmark on synchronized event-image pairs
(identity homography).

Parity with reference `test_events-image_same-time.py:79-288`. Computes
R@1/3, VVD@1/3, MMA@1/3, MR and homography-estimation AUC on the val split's
same-time views.
"""

from __future__ import annotations

import argparse
import json

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
    from ei_nexus_tpu.train import create_train_state, restore_any_checkpoint
    from ei_nexus_tpu.train.evaluate import val_extractor
    from ei_nexus_tpu.train.steps import batch_representation
    from ei_nexus_tpu.data import DataLoader
    from ei_nexus_tpu.data.mvsec import MVSECPairDataset, VAL_SEQUENCES
    from ei_nexus_tpu.data.ec import ECPairDataset, \
        VAL_SEQUENCES as EC_VAL_SEQUENCES

    cfg = load_config(args.config, args.overrides)
    from ei_nexus_tpu.utils.platform import apply_platform
    apply_platform(cfg.get("device"))
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ds_cfg = cfg.dataset.to_dict()
    H, W = ds_cfg["resolution"]
    bins, rep = ds_cfg["channel"], ds_cfg["representation_type"]
    # same-time protocol: single-view pairs over the val sequences
    # (dataset.val_sequences overrides the stock list, as in fetch_*)
    if ds_cfg["name"] == "mvsec":
        val_ds = MVSECPairDataset(ds_cfg["data_path"],
                                  ds_cfg.get("val_sequences")
                                  or VAL_SEQUENCES,
                                  ds_cfg["event_dt"],
                                  ds_cfg.get("max_events", 1 << 18),
                                  mode="single")
    else:
        val_ds = ECPairDataset(ds_cfg["data_path"],
                               ds_cfg.get("val_sequences")
                               or EC_VAL_SEQUENCES,
                               ds_cfg["event_dt"],
                               ds_cfg.get("max_events", 1 << 17),
                               mode="single")
    loader = DataLoader(val_ds, batch_size=1, shuffle=False, drop_last=False)

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

    metrics = val_extractor(state, model, loader, rep, bins, H, W,
                            max_batches=args.max_batches)
    print(json.dumps(metrics, indent=2, sort_keys=True))
    return metrics


if __name__ == "__main__":
    main()
