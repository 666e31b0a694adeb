#!/usr/bin/env python
"""Training-step throughput benchmark (stage 1 and stage 2).

Complements bench.py (inference pairs/s): measures sustained train steps/s
of the flagship configuration on the current backend, with the same
chained-dispatch timing methodology. Manual tool; prints one JSON line per
stage.

Usage: python tools/bench_train.py [--tiny] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--stages", default="stage1,stage2",
                   help="comma list: which stages to measure")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from ei_nexus_tpu.train import (build_optimizer, create_train_state,
                                    freeze_mask)
    from ei_nexus_tpu.train.steps import (make_stage1_train_step,
                                          make_stage2_train_step,
                                          batch_representation)
    from ei_nexus_tpu.train.partition import frozen_roots_from_config
    from ei_nexus_tpu.losses import build_losses
    import dataclasses

    model, (H, W, bins) = _flagship(tiny=args.tiny, dtype="bfloat16")
    # stage-1 variant: trainable event extractor + MNN
    from ei_nexus_tpu.models.eim import EIM, MatcherConfig
    cfg1 = dataclasses.replace(
        model.config,
        event_extractor=dataclasses.replace(model.config.event_extractor,
                                            freeze=False),
        matcher=MatcherConfig(type="MNN", freeze=True,
                              max_points_num=model.config.matcher
                              .max_points_num))
    model1 = EIM(config=cfg1)
    cfg2 = dataclasses.replace(
        model.config,
        event_extractor=dataclasses.replace(model.config.event_extractor,
                                            freeze=True))
    model2 = EIM(config=cfg2)

    rng = np.random.default_rng(0)
    B = 8
    mx = 1 << 17 if not args.tiny else 1 << 10

    def view():
        return {
            "events_x": rng.uniform(0, W - 1, (B, mx)).astype(np.float32),
            "events_y": rng.uniform(0, H - 1, (B, mx)).astype(np.float32),
            "events_t": np.sort(rng.uniform(0, 0.4, (B, mx)),
                                axis=1).astype(np.float32),
            "events_p": rng.integers(0, 2, (B, mx)).astype(np.float32),
            "events_valid": np.ones((B, mx), bool),
            "image": rng.uniform(0, 255, (B, H, W, 1)).astype(np.float32),
            "K": np.tile(np.array([[199.0, 0, W / 2], [0, 199.0, H / 2],
                                   [0, 0, 1]], np.float32), (B, 1, 1)),
            "depth": np.full((B, H, W), 2.0, np.float32),
        }

    T01 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T01[:, 0, 3] = 0.05
    batch = (view(), view(), T01, np.linalg.inv(T01).astype(np.float32))

    ev_rep, ev_mask = batch_representation(
        {k: batch[0][k] for k in batch[0] if k.startswith("events")},
        "VoxelGrid", bins, H, W)

    losses = build_losses({
        "keypoints_loss": {"type": "ScoreLoss",
                           "ScoreLoss": {"weight": 1.0, "mode": "mse",
                                         "use_mask": True}},
        "descriptors_loss": {"type": "DescriptorsLoss",
                             "DescriptorsLoss": {"mode": "mae",
                                                 "weight": 1.0,
                                                 "use_mask": True}},
        # FeatureLoss needs matching backbone widths (128 both sides in
        # the full config; the tiny config uses 16 vs SuperPoint's 128)
        **({} if args.tiny else {
            "feature_loss": {"type": "FeatureLoss",
                             "FeatureLoss": {"mode": "mse",
                                             "weight": 1.0}}}),
    })

    def measure(name, model, make_step, init_kwargs):
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "pad": jax.random.PRNGKey(1)},
            ev_rep, batch[0]["image"], ev_mask, None, True)
        tx = build_optimizer({"type": "AdamW", "AdamW": {}}, lambda s: 1e-4)
        state = create_train_state(model, variables, tx)
        freeze = freeze_mask(state.params,
                             frozen_roots_from_config(model.config))
        step = make_step(model, freeze=freeze, **init_kwargs)
        key = jax.random.PRNGKey(2)
        state, info = step(state, batch, key)   # compile
        float(info["loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, info = step(state, batch, jax.random.fold_in(key, i))
        loss = float(info["loss"])              # fetch forces completion
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"{name}_steps_per_s", "value": round(args.steps / dt, 3),
            "unit": "steps/s", "batch": B, "loss": round(loss, 4)}))

    def mk1(model, freeze):
        return make_stage1_train_step(model, losses, freeze, "VoxelGrid",
                                      bins, H, W)

    def mk2(model, freeze):
        return make_stage2_train_step(model, freeze, "VoxelGrid", bins, H, W)

    stages = set(args.stages.split(","))
    if "stage1" in stages:
        measure("stage1_train", model1,
                lambda model, freeze: mk1(model, freeze), {})
    if "stage2" in stages:
        measure("stage2_train", model2,
                lambda model, freeze: mk2(model, freeze), {})


if __name__ == "__main__":
    main()
