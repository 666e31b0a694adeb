#!/usr/bin/env python
"""Voxel-splat kernel tuning microbench: chunk size sweep on the current
backend with the chained-scan timing methodology. Manual tool; one JSON
line per configuration.

Usage: python tools/bench_splat.py [--chunks 2048,4096,8192] [--iters 20]
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
    p.add_argument("--chunks", default="2048,4096,8192")
    p.add_argument("--slots", default="4")
    p.add_argument("--align", default="0,1")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-events", type=int, default=1 << 17)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ei_nexus_tpu.data import representations as reps

    H, W, bins = 260, 346, 16
    B, N = args.batch, args.iters
    mx = args.max_events
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(0, W - 1, (B, mx)).astype(np.float32))
    y = jax.device_put(rng.uniform(0, H - 1, (B, mx)).astype(np.float32))
    t = jax.device_put(np.sort(rng.uniform(0, 0.4, (B, mx)),
                               axis=1).astype(np.float32))
    pol = jax.device_put(rng.integers(0, 2, (B, mx)).astype(np.float32))

    import itertools
    for chunk, slots, align in itertools.product(
            [int(c) for c in args.chunks.split(",")],
            [int(s) for s in args.slots.split(",")],
            [bool(int(a)) for a in args.align.split(",")]):
            def batched(x, y, t, p, chunk=chunk, slots=slots,
                        align=align):
                def one(x, y, t, p):
                    g, acc = reps.events_to_voxel_grid_splat(
                        x, y, t, p, bins=bins, height=H, width=W,
                        chunk=chunk, slots=slots, align_bins=align)
                    return jnp.sum(g) * 1e-9 + jnp.sum(acc) * 1e-9
                return jnp.sum(jax.vmap(one)(x, y, t, p))

            @jax.jit
            def chained(x, y, t, p):
                def body(carry, _):
                    out = batched(x + carry * 1e-6, y, t, p)
                    return jnp.sum(out), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
                return c

            float(chained(x, y, t, pol))  # compile+warmup
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(x, y, t, pol))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"chunk": chunk,
                              "slots": slots, "align": align,
                              "ms_per_batch": round(best / N * 1e3, 2),
                              "batch": B}), flush=True)


if __name__ == "__main__":
    main()
