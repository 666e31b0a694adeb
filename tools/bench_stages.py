#!/usr/bin/env python
"""Per-stage breakdown of the flagship inference pipeline.

Times three nested prefixes of the pipeline with the chained-scan
methodology (see bench.py): voxelization only, voxelization+extraction,
full pipeline incl. LightGlue. Differences give per-stage cost. Manual
tool; prints one JSON line per stage.

Usage: python tools/bench_stages.py [--batch 8] [--iters 10]
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
    p.add_argument("--batch", type=int, default=8)
    # >= 30 chained iterations amortize the tunnel's fixed ~15 ms
    # dispatch+fetch overhead (at 10 it inflates stages by ~1.5 ms each)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from ei_nexus_tpu.train.steps import batch_representation

    model, (H, W, bins) = _flagship(dtype="bfloat16")
    rng = np.random.default_rng(0)
    B, N = args.batch, args.iters
    mx = 1 << 17

    ev = {
        "events_x": rng.uniform(0, W - 1, (B, mx)).astype(np.float32),
        "events_y": rng.uniform(0, H - 1, (B, mx)).astype(np.float32),
        "events_t": np.sort(rng.uniform(0, 0.4, (B, mx)),
                            axis=1).astype(np.float32),
        "events_p": rng.integers(0, 2, (B, mx)).astype(np.float32),
        "events_valid": np.ones((B, mx), bool),
    }
    image = rng.uniform(0, 255, (B, H, W, 1)).astype(np.float32)
    rep0, mask0 = batch_representation(ev, "VoxelGrid", bins, H, W)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           rep0[:1], image[:1], mask0[:1])

    def timed(fn, *inputs):
        jfn = jax.jit(fn)
        float(jfn(*inputs))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(*inputs))
            best = min(best, time.perf_counter() - t0)
        return best / N  # seconds per iteration (per batch of B)

    ev_j = {k: jax.device_put(v) for k, v in ev.items()}
    image_j = jax.device_put(image)
    variables = jax.device_put(variables)

    def chain(body):
        def run(*inputs):
            def step(carry, _):
                return body(carry, *inputs), None
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c
        return run

    def voxel_body(carry, ev, image):
        e = dict(ev)
        e["events_x"] = ev["events_x"] + carry * 1e-6
        rep, mask = batch_representation(e, "VoxelGrid", bins, H, W)
        return jnp.sum(rep) * 1e-9 + jnp.sum(mask) * 0.0, None

    from ei_nexus_tpu.models.eim import _build_extractor
    ev_mod = _build_extractor(model.config.event_extractor,
                              "event_extractor")
    im_mod = _build_extractor(model.config.image_extractor,
                              "image_extractor")

    def sub_vars(name):
        return {c: v[name] for c, v in variables.items() if name in v}

    def extract_body(carry, ev, image):
        e = dict(ev)
        e["events_x"] = ev["events_x"] + carry * 1e-6
        rep, mask = batch_representation(e, "VoxelGrid", bins, H, W)
        ev_out = ev_mod.apply(sub_vars("event_extractor"), rep, mask)
        im_out = im_mod.apply(sub_vars("image_extractor"), image)
        return (jnp.sum(ev_out["sparse_positions"]) * 1e-9
                + jnp.sum(im_out["sparse_positions"]) * 1e-9), None

    def full_body(carry, ev, image):
        e = dict(ev)
        e["events_x"] = ev["events_x"] + carry * 1e-6
        rep, mask = batch_representation(e, "VoxelGrid", bins, H, W)
        _, _, m = model.apply(variables, rep, image, mask)
        return jnp.sum(m["matching_scores0"]) * 1e-6, None

    stages = [("voxelize", voxel_body), ("voxelize+extract", extract_body),
              ("full_pipeline", full_body)]
    prev = 0.0
    for name, body in stages:
        def fn(ev, image, body=body):
            def step(carry, _):
                out, _ = body(carry, ev, image)
                return out, None
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c
        dt = timed(fn, ev_j, image_j)
        print(json.dumps({"stage": name, "ms_per_batch": round(dt * 1e3, 2),
                          "ms_delta": round((dt - prev) * 1e3, 2),
                          "batch": B}))
        prev = dt


if __name__ == "__main__":
    main()
