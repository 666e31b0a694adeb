#!/usr/bin/env python
"""Per-stage MFU / roofline accounting for the flagship pipeline.

SURVEY.md §6 demands speed-of-light analysis; this joins
 - XLA's own cost model (compiled.cost_analysis(): flops + bytes accessed)
   per pipeline PREFIX, differenced into per-stage flops/bytes, with
 - chained-scan wall times per prefix (the only timing methodology that
   survives the remote tunnel, see bench.py), differenced the same way,
into per-stage achieved TFLOP/s, MFU vs peak, achieved GB/s, bandwidth
utilization, the roofline-implied floor time, and gap-to-floor — so kernel
targets are picked from the largest measured gap, not intuition
(VERDICT r3 #4).

Stage prefixes (each contains the previous — in-situ deltas, because
isolated per-call timings mislead through the tunnel):
  voxelize -> +event VGG -> +SuperPoint -> full pipeline (LightGlue).

Peaks default to TPU v5e: 197 bf16 TFLOP/s, 819 GB/s HBM.

Usage:
  python tools/roofline.py [--device tpu|cpu] [--batch 8] [--iters 30]
         [--peak-tflops 197] [--peak-gbs 819] [--pose]
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
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e: 197)")
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="HBM bandwidth of the chip (v5e: 819)")
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from ei_nexus_tpu.train.steps import batch_representation
    from ei_nexus_tpu.models.eim import _build_extractor

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

    ev_j = {k: jax.device_put(v) for k, v in ev.items()}
    image_j = jax.device_put(image)
    variables = jax.device_put(variables)

    ev_mod = _build_extractor(model.config.event_extractor,
                              "event_extractor")
    im_mod = _build_extractor(model.config.image_extractor,
                              "image_extractor")

    def sub_vars(name):
        return {c: v[name] for c, v in variables.items() if name in v}

    # ---- pipeline prefixes (each body returns a scalar carry) ----------
    def voxel_body(carry, ev, image):
        e = dict(ev)
        e["events_x"] = ev["events_x"] + carry * 1e-6
        rep, mask = batch_representation(e, "VoxelGrid", bins, H, W)
        return jnp.sum(rep) * 1e-9 + jnp.sum(mask) * 0.0

    def event_vgg_body(carry, ev, image):
        c = voxel_body(carry, ev, image)
        e = dict(ev)
        e["events_x"] = ev["events_x"] + carry * 1e-6
        rep, mask = batch_representation(e, "VoxelGrid", bins, H, W)
        out = ev_mod.apply(sub_vars("event_extractor"), rep, mask)
        return c + jnp.sum(out["sparse_positions"]) * 1e-9

    def superpoint_body(carry, ev, image):
        c = event_vgg_body(carry, ev, image)
        # the carry MUST flow into every stage input: a loop-invariant
        # image lets XLA hoist the whole extractor out of the timing
        # scan (measured: 0.5 ms "superpoint" = 117% MFU, i.e. hoisted)
        out = im_mod.apply(sub_vars("image_extractor"),
                           image + carry * 1e-6)
        return c + jnp.sum(out["sparse_positions"]) * 1e-9

    def full_body(carry, ev, image):
        # voxelize + model.apply == voxelize + both extractors + matcher:
        # exactly the superpoint prefix plus LightGlue, so the delta vs
        # that prefix isolates the matcher for BOTH time and cost
        e = dict(ev)
        e["events_x"] = ev["events_x"] + carry * 1e-6
        rep, mask = batch_representation(e, "VoxelGrid", bins, H, W)
        _, _, m = model.apply(variables, rep, image + carry * 1e-6, mask)
        return jnp.sum(m["matching_scores0"]) * 1e-6

    prefixes = [("voxelize", voxel_body),
                ("event_vgg", event_vgg_body),
                ("superpoint", superpoint_body),
                ("lightglue", full_body)]

    def chained(body):
        def run(ev, image):
            def step(carry, _):
                return body(carry, ev, image), None
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c
        return run

    def once(body):
        def run(ev, image):
            return body(jnp.float32(0), ev, image)
        return run

    peak_flops = args.peak_tflops * 1e12
    peak_bw = args.peak_gbs * 1e9

    rows = []
    prev_t = 0.0
    prev_f = 0.0
    prev_b = 0.0
    for name, body in prefixes:
        jfn = jax.jit(chained(body))
        lowered = jax.jit(once(body)).lower(ev_j, image_j)
        compiled = lowered.compile()
        ca = compiled.cost_analysis() or {}
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))

        float(jfn(ev_j, image_j))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(ev_j, image_j))
            best = min(best, time.perf_counter() - t0)
        t = best / N

        dt, df, db = t - prev_t, flops - prev_f, byts - prev_b
        prev_t, prev_f, prev_b = t, flops, byts
        floor_t = max(df / peak_flops, db / peak_bw) if df or db else 0.0
        rows.append({
            "stage": name,
            "ms": round(dt * 1e3, 3),
            "gflops": round(df / 1e9, 2),
            "gbytes": round(db / 1e9, 3),
            "tflops_per_s": round(df / dt / 1e12, 2) if dt > 0 else 0.0,
            "mfu_pct": round(100 * df / dt / peak_flops, 1)
            if dt > 0 else 0.0,
            "gb_per_s": round(db / dt / 1e9, 1) if dt > 0 else 0.0,
            "bw_pct": round(100 * db / dt / peak_bw, 1) if dt > 0 else 0.0,
            "floor_ms": round(floor_t * 1e3, 3),
            "gap_x": round(dt / floor_t, 1) if floor_t > 0 else None,
            "bound": ("compute" if df / peak_flops > db / peak_bw
                      else "bandwidth"),
        })
        print(json.dumps(rows[-1]), flush=True)

    total_t = sum(r["ms"] for r in rows)
    total_f = sum(r["gflops"] for r in rows)
    total_b = sum(r["gbytes"] for r in rows)
    summary = {
        "stage": "TOTAL",
        "ms": round(total_t, 2),
        "gflops": round(total_f, 1),
        "gbytes": round(total_b, 2),
        "pipeline_mfu_pct": round(
            100 * total_f * 1e9 / (total_t * 1e-3) / peak_flops, 1),
        "pipeline_bw_pct": round(
            100 * total_b * 1e9 / (total_t * 1e-3) / peak_bw, 1),
        "pairs_per_s": round(B / (total_t * 1e-3), 1),
        "batch": B,
        "device": args.device,
    }
    print(json.dumps(summary), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"stages": rows, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    main()
