#!/usr/bin/env python
"""Validate adaptive LightGlue inference on a TRAINED matcher + real data.

VERDICT r3 #5 / r4: `tools/bench_adaptive.py` only measures the mechanism
with PINNED confidence biases. This tool answers the real questions at the
reference's shipping defaults (depth_confidence=0.95, width_confidence=0.99
— ref:core/modules/matchers/lightglue.py:431-432):

  1. what is the actual exit-layer histogram on the stock val pairs?
  2. is accuracy neutral (RPE inlier ratio / AUC within noise of the
     full 9-layer forward)?
  3. what is the real device-time speedup at production batch shape?

Runs the stock two-sequence RPE protocol twice (adaptive off / on) with
the same trained checkpoint, then times both variants at B=8 with the
repo's chained-scan methodology (naive timing over-reports through the
remote tunnel — see bench.py).

Usage:
  python tools/eval_adaptive.py --config runs/<stage2>/config.yaml \
      --ckpt runs/<stage2>/checkpoints/final \
      dataset.data_path=data/mini_mvsec dataset.indices_dir=data/mini_mvsec
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--depth", type=float, default=0.95)
    p.add_argument("--width", type=float, default=0.99)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--skip-timing", action="store_true")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax
    from ei_nexus_tpu.utils import load_config
    from ei_nexus_tpu.utils.platform import apply_platform
    from ei_nexus_tpu.models import EIM, build_model, eim_config_from_dict
    from ei_nexus_tpu.train import create_train_state, restore_any_checkpoint
    from ei_nexus_tpu.train.steps import batch_representation, make_eval_step
    from ei_nexus_tpu.data import DataLoader
    from ei_nexus_tpu.data.mvsec import fetch_mvsec_dataset
    from ei_nexus_tpu.data.ec import fetch_ec_dataset
    from ei_nexus_tpu.metrics.matching import RelativePoseEstimation
    from ei_nexus_tpu.utils.cache import enable_compilation_cache

    cfg = load_config(args.config, args.overrides)
    apply_platform(cfg.get("device"))
    enable_compilation_cache()
    ad_cfg = load_config(args.config, list(args.overrides) + [
        f"model.matcher.LightGlue.depth_confidence={args.depth}",
        f"model.matcher.LightGlue.width_confidence={args.width}"])

    ds_cfg = cfg.dataset.to_dict()
    H, W = ds_cfg["resolution"]
    bins, rep = ds_cfg["channel"], ds_cfg["representation_type"]
    fetch = fetch_mvsec_dataset if ds_cfg["name"] == "mvsec" \
        else fetch_ec_dataset
    val_ds = fetch(ds_cfg, "val")
    loader = DataLoader(val_ds, batch_size=1, shuffle=False, drop_last=False)

    model = build_model(cfg.model.to_dict().get("name", "EIM"),
                        eim_config_from_dict(cfg.model.to_dict()))
    model_ad = build_model(ad_cfg.model.to_dict().get("name", "EIM"),
                           eim_config_from_dict(ad_cfg.model.to_dict()))
    sample = val_ds[0]
    ev_rep, ev_mask = batch_representation(
        {k: np.asarray(v)[None] for k, v in sample[0].items()
         if k.startswith("events")}, rep, bins, H, W)
    # init through the ADAPTIVE variant: adaptive_init creates every
    # per-layer head + token-confidence param (superset tree); restore
    # then swaps in the full trained tree, which both variants share
    variables = model_ad.init({"params": jax.random.PRNGKey(0)}, ev_rep,
                              np.asarray(sample[1]["image"])[None], ev_mask)
    import optax
    state = create_train_state(model_ad, variables, optax.sgd(0.0))
    state, _ = restore_any_checkpoint(args.ckpt, state, model_ad.config)

    step_base = make_eval_step(model, rep, bins, H, W)
    step_ad = make_eval_step(model_ad, rep, bins, H, W)

    def run_protocol(step, collect_exit):
        rpe = RelativePoseEstimation("RPE", [5, 10, 20], ransac_thresh=1.0,
                                     ordering="yx", backend="opencv")
        from ei_nexus_tpu.train.evaluate import _matched_pairs
        acc, exits, nmatches = {}, [], []
        for bi, batch in enumerate(loader):
            if args.max_batches and bi >= args.max_batches:
                break
            data0, data1, T01, _ = batch[:4]
            ev, im, matches = step(state, batch)
            if collect_exit and "exit_layer" in matches:
                exits.append(int(np.asarray(matches["exit_layer"])))
            nmatches.append(
                int((np.asarray(matches["matches0"][0]) >= 0).sum()))
            mk0, mk1 = _matched_pairs(matches, ev, im, 0)
            out = rpe.update_one(mk0, mk1, data0["K"][0], data1["K"][0],
                                 T01[0])
            for k, v in out.items():
                acc.setdefault(k, []).append(v)
        summary = {}
        for k, v in acc.items():
            arr = np.asarray(v, np.float64)
            arr = arr[np.isfinite(arr)]
            summary[k] = round(float(arr.mean()), 4) if arr.size else None
        auc = rpe.compute_all_auc()
        for t in (5, 10, 20):
            summary[f"auc@{t}"] = round(auc[f"{t}"], 4)
        summary["n_matches_mean"] = round(float(np.mean(nmatches)), 1)
        return summary, exits

    base_metrics, _ = run_protocol(step_base, False)
    ad_metrics, exits = run_protocol(step_ad, True)
    hist = np.bincount(exits, minlength=9).tolist() if exits else []

    result = {
        "depth_confidence": args.depth, "width_confidence": args.width,
        "exit_layer_hist": hist,
        "exit_layer_mean": round(float(np.mean(exits)), 2) if exits else None,
        "base": base_metrics, "adaptive": ad_metrics,
    }

    if not args.skip_timing:
        import jax.numpy as jnp
        # B=8 production-shape timing on REAL val batches, chained scan
        loader8 = DataLoader(val_ds, batch_size=8, shuffle=False,
                             drop_last=True)
        b8 = next(iter(loader8))
        data0, data1 = b8[0], b8[1]
        ev_j = {k: jax.device_put(np.asarray(v)) for k, v in data0.items()
                if k.startswith("events")}
        im_j = jax.device_put(np.asarray(data1["image"]))
        var_j = jax.device_put({"params": state.params,
                                "batch_stats": state.batch_stats})
        N = args.iters

        def timed(mdl):
            def body(carry, _):
                e = dict(ev_j)
                e["events_x"] = e["events_x"] + carry * 1e-6
                r, m = batch_representation(e, rep, bins, H, W)
                _, _, mt = mdl.apply(var_j, r, im_j, m)
                return jnp.sum(mt["matching_scores0"]) * 1e-9, None

            @jax.jit
            def run(v):
                c, _ = jax.lax.scan(body, v, None, length=N)
                return c

            float(run(jnp.float32(0)))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            return best / N * 1e3  # ms per batch-of-8

        ms_base = timed(model)
        ms_ad = timed(model_ad)
        result["ms_per_batch8_base"] = round(ms_base, 2)
        result["ms_per_batch8_adaptive"] = round(ms_ad, 2)
        result["speedup"] = round(ms_base / ms_ad, 3)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
