#!/usr/bin/env python
"""Op-level device-time attribution of the flagship pipeline (or the
isolated matcher) via a jax.profiler trace through the tunnel.

The roofline (tools/roofline.py) says the lightglue stage runs at 63% of
HBM bandwidth with ~4 ms/batch of headroom spread across dense/LN/GELU/
head ops; stage-level timing cannot see which HBM round-trips to fuse.
This tool captures an XPlane trace of N chained pipeline iterations,
parses the chrome-trace export, and aggregates per-op device durations
(grouped by fusion name) so the top round-trips are rankable.

Usage:
  python tools/profile_pipeline.py [--what matcher|pipeline] [--iters 10]
      [--top 40] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_traces(log_dir: str, min_us: float = 1.0):
    """Aggregate complete ('X') events per device lane from every
    *.trace.json.gz under log_dir."""
    files = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no trace.json.gz under {log_dir}")
    agg = collections.Counter()
    counts = collections.Counter()
    device_pids = set()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        # device lanes: process names containing TPU/device (the host
        # python lanes double-count dispatch)
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                name = e.get("args", {}).get("name", "")
                if any(s in name.lower() for s in ("tpu", "device",
                                                   "/device", "xla")):
                    device_pids.add(e.get("pid"))
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in device_pids:
                continue
            dur = float(e.get("dur", 0.0))
            if dur < min_us:
                continue
            agg[e.get("name", "?")] += dur
            counts[e.get("name", "?")] += 1
    return agg, counts


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="matcher",
                   choices=["matcher", "pipeline"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="/tmp/prof")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ei_nexus_tpu.utils.profiling import trace
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
    variables = jax.device_put(variables)

    if args.what == "pipeline":
        ev_j = {k: jax.device_put(v) for k, v in ev.items()}
        image_j = jax.device_put(image)

        @jax.jit
        def run(variables, ev, image):
            def body(carry, _):
                e = dict(ev)
                e["events_x"] = ev["events_x"] + carry * 1e-6
                rep, mask = batch_representation(e, "VoxelGrid", bins,
                                                 H, W)
                _, _, m = model.apply(variables, rep, image, mask)
                return jnp.sum(m["matching_scores0"]) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        fn, inputs = run, (variables, ev_j, image_j)
    else:
        # isolated matcher at production shapes: run the extractors once
        # on device, then chain the matcher on their (perturbed) outputs
        rep, mask = batch_representation(
            {k: jax.device_put(v) for k, v in ev.items()},
            "VoxelGrid", bins, H, W)
        from ei_nexus_tpu.models.eim import _build_extractor
        ev_mod = _build_extractor(model.config.event_extractor,
                                  "event_extractor")
        im_mod = _build_extractor(model.config.image_extractor,
                                  "image_extractor")

        def sub_vars(name):
            return {c: v[name] for c, v in variables.items() if name in v}

        ev_out = jax.jit(lambda: ev_mod.apply(
            sub_vars("event_extractor"), rep, mask))()
        im_out = jax.jit(lambda: im_mod.apply(
            sub_vars("image_extractor"), jax.device_put(image)))()
        from ei_nexus_tpu.models.eim import Matcher
        matcher = Matcher(config=model.config.matcher)

        @jax.jit
        def run(mvars, ev_out, im_out):
            def body(carry, _):
                e = dict(ev_out)
                e["sparse_descriptors"] = \
                    ev_out["sparse_descriptors"] + carry * 1e-6
                m = matcher.apply(mvars, e, im_out)
                return jnp.sum(m["matching_scores0"]) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        mvars = {"params": variables["params"]["matcher"]}
        fn, inputs = run, (mvars, ev_out, im_out)

    float(fn(*inputs))  # compile + warm
    os.makedirs(args.out, exist_ok=True)
    with trace(args.out):
        float(fn(*inputs))

    agg, counts = _parse_traces(args.out)
    total = sum(agg.values())
    print(f"what={args.what} B={B} iters={N} "
          f"total_device_us={total:.0f} (={total/N/1e3:.3f} ms/iter)")
    for name, us in agg.most_common(args.top):
        print(f"  {us/N:9.1f} us/iter  x{counts[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
