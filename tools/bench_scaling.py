#!/usr/bin/env python
"""Weak-scaling measurement of the stage-1 train step over a virtual CPU
device mesh (1 -> 2 -> 4 -> 8 data-parallel devices, fixed per-device
batch), exercising the same mesh/shard_batch/GSPMD path the TPU pod run
would use (the reference's analogue is DDP scaling, train_extractor.py:
86-91; it has no measurement either).

Caveat recorded in the output: virtual devices share this host's physical
cores (4 here), so efficiency beyond the core count measures XLA partition
overhead, not hardware scaling. Run on a real multi-chip mesh for the
north-star number.

Usage: python tools/bench_scaling.py [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(n_dev: int, per_device_batch: int = 2, H: int = 128,
            W: int = 128, steps: int = 6) -> float:
    from ei_nexus_tpu.parallel import make_mesh, shard_batch, replicate
    from ei_nexus_tpu.models import EIM, eim_config_from_dict
    from ei_nexus_tpu.utils import load_config
    from ei_nexus_tpu.losses import build_losses
    from ei_nexus_tpu.train import (build_optimizer, build_schedule,
                                    create_train_state, freeze_mask)
    from ei_nexus_tpu.train.steps import make_stage1_train_step
    from ei_nexus_tpu.train.partition import frozen_roots_from_config

    cfg = load_config("configs/train_EIM_stage1_MVSEC_SP_MNN.yaml", [])
    model_cfg = eim_config_from_dict(cfg.model.to_dict())
    model = EIM(config=model_cfg)
    B = per_device_batch * n_dev
    bins, max_ev = 16, 1 << 14
    rng = np.random.default_rng(0)
    batch = ({
        "events_x": rng.uniform(0, W - 1, (B, max_ev)).astype(np.float32),
        "events_y": rng.uniform(0, H - 1, (B, max_ev)).astype(np.float32),
        "events_t": np.sort(rng.uniform(0, .4, (B, max_ev)), 1).astype(
            np.float32),
        "events_p": rng.integers(0, 2, (B, max_ev)).astype(np.float32),
        "events_valid": np.ones((B, max_ev), bool),
        "image": rng.uniform(0, 255, (B, H, W, 1)).astype(np.float32),
    },)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, np.zeros((1, H, W, bins),
                                                     np.float32),
                           batch[0]["image"][:1],
                           np.ones((1, H, W), np.float32))
    tcfg = cfg.train.to_dict()
    schedule = build_schedule(tcfg["scheduler"], tcfg["optimizer"]["lr"])
    tx = build_optimizer(tcfg["optimizer"], schedule)
    state = create_train_state(model, variables, tx)
    losses = build_losses(tcfg["loss"])
    freeze = freeze_mask(state.params, frozen_roots_from_config(model_cfg))
    step_fn = make_stage1_train_step(model, losses, freeze, "VoxelGrid",
                                     bins, H, W)
    mesh = make_mesh(devices=jax.devices()[:n_dev])
    state = replicate(state, mesh)
    with jax.set_mesh(mesh):
        gb = shard_batch(batch, mesh)
        state, info = step_fn(state, gb, key)           # compile
        jax.block_until_ready(info["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, info = step_fn(state, gb, key)
        jax.block_until_ready(info["loss"])
        dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()
    results = {}
    t1 = None
    for n in (1, 2, 4, 8):
        dt = measure(n)
        t1 = t1 or dt
        eff = t1 / dt  # weak scaling: ideal = same step time at any width
        results[str(n)] = {"step_s": round(dt, 4),
                           "samples_per_s": round(2 * n / dt, 3),
                           "weak_efficiency": round(eff, 3)}
        print(f"devices={n}: {dt*1e3:.1f} ms/step, "
              f"{2 * n / dt:.2f} samples/s, weak eff {eff:.2f}")
    payload = {
        "kind": "weak_scaling_stage1_train_step",
        "host_physical_cores": os.cpu_count(),
        "note": ("virtual CPU devices share physical cores; efficiency at "
                 "n > cores is bounded by the host, not the partitioning. "
                 "TPU pod hardware unavailable in this environment."),
        "per_device_batch": 2, "resolution": [128, 128],
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["results"]))


if __name__ == "__main__":
    main()
