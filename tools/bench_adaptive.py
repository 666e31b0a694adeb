#!/usr/bin/env python
"""Measure the static-shape adaptive LightGlue inference mechanism on TPU.

The reference's early-exit/point-pruning (lightglue.py:606-672, commented
out there) is reformulated for TPU static shapes in
ei_nexus_tpu/models/lightglue.py:_adaptive_layers: layers after the exit
point are skipped at runtime via `lax.cond` on a batch-global stop check;
pruning folds into the validity masks.

The exit decision is data/weights-dependent, so this bench pins it by
overriding every token-confidence bias:

  off    — adaptive disabled (the plain 9-layer forward, baseline)
  never  — adaptive on, biases -20: all confidences ~0, no exit — the
           OVERHEAD of the cond machinery + per-layer confidence heads
  exit@1 — adaptive on, biases +20: exit after layer 0 — the best-case
           SPEEDUP ceiling (8 of 9 layers skipped at runtime)

Timing: N iterations chained through a lax.scan carry, one scalar fetch
(the repo methodology; naive block_until_ready over-reports through the
remote tunnel). Prints ms/batch per mode.
"""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--device", default=None, choices=[None, "tpu", "cpu"])
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ei_nexus_tpu.models.lightglue import LightGlue, LightGlueConfig
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    B, N, D = args.B, args.N, 256
    rng = np.random.default_rng(0)

    def feats(n):
        pos = np.concatenate([
            rng.uniform(0, 256, (B, n, 2)).astype(np.float32),
            rng.uniform(0, 1, (B, n, 1)).astype(np.float32)], -1)
        return {
            "sparse_positions": jnp.asarray(pos),
            "sparse_descriptors": jnp.asarray(
                rng.normal(size=(B, n, D)).astype(np.float32)),
            "sparse_valid": jnp.asarray(np.ones((B, n), bool)),
            "image_size": jnp.asarray([[260.0, 346.0]] * B),
        }

    f0, f1 = feats(N), feats(N)

    def build(adaptive: bool):
        cfg = LightGlueConfig(dtype="bfloat16", score_dtype="bfloat16",
                              depth_confidence=0.95 if adaptive else -1.0,
                              width_confidence=0.99 if adaptive else -1.0)
        model = LightGlue(cfg)
        var = model.init(jax.random.PRNGKey(0), f0, f1)
        return model, var

    def pin_confidence(var, bias):
        params = jax.tree_util.tree_map(lambda x: x, var["params"])  # copy
        for k in list(params):
            if k.startswith("token_confidence_"):
                p = dict(params[k])
                p["bias"] = jnp.full_like(p["bias"], bias)
                # kill the weight so the bias decides alone
                p["kernel"] = jnp.zeros_like(p["kernel"])
                params[k] = p
        return {"params": params}

    def timed(model, var):
        @jax.jit
        def chained(var, f0, f1):
            def body(carry, _):
                g0 = dict(f0)
                g0["sparse_descriptors"] = (f0["sparse_descriptors"]
                                            + carry * 1e-6)
                out = model.apply(var, g0, f1)
                return jnp.sum(out["matching_scores0"]) * 1e-6, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)
            return c
        float(chained(var, f0, f1))  # compile+warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(var, f0, f1))
            best = min(best, time.perf_counter() - t0)
        return best / args.iters * 1e3

    model_off, var_off = build(False)
    model_ad, var_ad = build(True)

    results = {}
    results["off"] = timed(model_off, var_off)
    print(f"off     : {results['off']:8.2f} ms/batch", flush=True)
    results["never"] = timed(model_ad, pin_confidence(var_ad, -20.0))
    print(f"never   : {results['never']:8.2f} ms/batch "
          f"(adaptive overhead {results['never'] - results['off']:+.2f})",
          flush=True)
    results["exit@1"] = timed(model_ad, pin_confidence(var_ad, 20.0))
    print(f"exit@1  : {results['exit@1']:8.2f} ms/batch "
          f"(speedup {results['off'] / results['exit@1']:.2f}x vs off)",
          flush=True)


if __name__ == "__main__":
    main()
