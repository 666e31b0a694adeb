#!/usr/bin/env python
"""Matcher validation entry point: GT matches from pose+depth -> LightGlue
loss/metrics (deep-supervision NLL, match recall/precision/accuracy) +
RPE AUC on the val pair protocol.

Parity with reference `val_matcher.py:39-125`: per val pair the GT
assignment is generated from pose+depth exactly as in training
(train_matcher.py:181-190), the stage-2 loss is evaluated without a
gradient, assignment-level metrics come from `matcher_metrics`
(lightglue.py:17), and the RPE protocol runs on top.
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/train_EIM_stage2.yaml")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from ei_nexus_tpu.utils import load_config
    from ei_nexus_tpu.models import (EIM, build_model,
                                     eim_config_from_dict)
    from ei_nexus_tpu.train import create_train_state, restore_any_checkpoint
    from ei_nexus_tpu.train.evaluate import rpe_eval
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
    loader = DataLoader(val_ds, batch_size=1, shuffle=False, drop_last=False)

    model = build_model(cfg.model.to_dict().get("name", "EIM"),
                        eim_config_from_dict(cfg.model.to_dict()))
    sample = val_ds[0]
    ev_rep, ev_mask = batch_representation(
        {k: np.asarray(v)[None] for k, v in sample[0].items()
         if k.startswith("events")}, rep, bins, H, W)
    variables = model.init({"params": jax.random.PRNGKey(0)}, ev_rep,
                           np.asarray(sample[1]["image"])[None], ev_mask)
    import optax
    state = create_train_state(model, variables, optax.sgd(0.0))
    if args.ckpt:
        state, _ = restore_any_checkpoint(args.ckpt, state, model.config)

    # --- GT-match loss + assignment metrics (reference val_matcher.py:70-
    # 108): the stage-2 training loss evaluated without gradients. The
    # forward runs in training mode (deep-supervision outputs + the same
    # random-slot padding as training, fixed rng); BN batch-stat mutations
    # are computed and discarded.
    import jax.numpy as jnp
    from ei_nexus_tpu.geometry import (Camera, Pose,
                                       gt_matches_from_pose_depth)
    from ei_nexus_tpu.losses.matcher_loss import lightglue_loss
    from ei_nexus_tpu.metrics.matching import matcher_metrics

    # the same hyperparameters the trainer reads (train_matcher.py:137-141)
    cfg_d = cfg.to_dict()
    gtc = cfg_d.get("train", {}).get("gt_matches", {})
    pos_th = float(gtc.get("pos_th", 3.0))
    neg_th = float(gtc.get("neg_th", 5.0))
    lg_cfg = cfg_d.get("model", {}).get("matcher", {}).get("lightglue", {})
    gamma = float(lg_cfg.get("gamma", 1.0))
    nll_balancing = float(lg_cfg.get("nll_balancing", 0.5))

    @jax.jit
    def loss_step(state, batch):
        data0, data1, T01, T10 = batch[:4]
        ev_rep, ev_mask = batch_representation(data0, rep, bins, H, W)
        K = data0["K"]
        cam = Camera.from_calibration_matrix(
            K, size=jnp.broadcast_to(jnp.asarray([W, H], jnp.float32),
                                     K.shape[:-2] + (2,)))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        (ev_feats, im_feats, matches), _ = state.apply_fn(
            variables, ev_rep, data1["image"], ev_mask, None, True,
            mutable=["batch_stats"], rngs={"pad": jax.random.PRNGKey(0)})
        kp0 = matches["input_feats0"]["sparse_positions"][..., :2]
        kp1 = matches["input_feats1"]["sparse_positions"][..., :2]
        gt = gt_matches_from_pose_depth(
            kp0, kp1, cam, cam, data0["depth"], data1["depth"],
            Pose.from_4x4mat(T01), Pose.from_4x4mat(T10),
            pos_th=pos_th, neg_th=neg_th, ordering="yx")
        loss, info = lightglue_loss(matches, gt, gamma=gamma,
                                    nll_balancing=nll_balancing,
                                    training=True)
        out = {"matcher_loss": loss, **info}
        return ({k: jnp.mean(v) for k, v in out.items()},
                matches["matches0"], gt["matches0"],
                matches["matching_scores0"])

    sums: dict = {}
    n = 0
    for bi, batch in enumerate(loader):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        if "depth" not in batch[0]:
            break  # EC has no depth: loss/metrics are MVSEC-only
        vals, m0, gt0, sc0 = loss_step(state, batch)
        mm = matcher_metrics(m0, gt0, sc0)  # host-side numpy
        for k, v in {**{k: float(v) for k, v in vals.items()},
                     **{k: float(np.mean(v)) for k, v in mm.items()}}.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
    metrics = {k: v / max(n, 1) for k, v in sums.items()}

    metrics.update(rpe_eval(state, model, loader, rep, bins, H, W,
                            max_batches=args.max_batches))
    print(json.dumps(metrics, indent=2, sort_keys=True))
    return metrics


if __name__ == "__main__":
    main()
