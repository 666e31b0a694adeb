"""Event-stream -> dense tensor representations, as vectorized scatter kernels.

Capability parity with reference `datasets/representations.py` (time surface,
voxel grid, event stack, distance map), re-designed TPU-first:

 - every converter is pure jnp, shape-static and jittable: events arrive as
   fixed-length padded arrays (x, y, t, p) + a validity mask, so the same
   compiled program handles any event count (the reference's per-event python
   loops, `np.add.at`/`put_` host scatters and searchsorted slicing disappear);
 - scatters are `.at[].add/max` ops that XLA lowers to efficient on-device
   scatter; bin membership is computed as per-bin masks at trace time;
 - batched use is `jax.vmap(events_to_voxel_grid, ...)`.

There is deliberately NO host-side rasterizer: the input pipeline ships
padded raw events (compact wire format, train/steps.py compact_event_view
with its fused C++ encoder in `ei_nexus_tpu/native`) and every
representation is built on device inside the jitted step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_time(t: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Normalize event timestamps to [0, 1] over the valid window.

    Matches reference representations.py:time_normalization (t -= t0;
    t /= t_last + 1e-8) generalized to masked padding: t0/t_last are the
    first/last *valid* timestamps (events are time-sorted; padding sits at
    the tail).
    """
    if mask is None:
        t0 = t[0]
        t_last = t[-1] - t0
    else:
        big = jnp.asarray(jnp.inf, t.dtype)
        t0 = jnp.min(jnp.where(mask, t, big))
        t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
        t_last = jnp.max(jnp.where(mask, t - t0, 0.0))
    return (t - t0) / (t_last + 1e-8)


def _masked_scatter_add(grid_flat: jax.Array, idx: jax.Array, w: jax.Array,
                        mask: jax.Array) -> jax.Array:
    idx = jnp.where(mask, idx, 0)
    w = jnp.where(mask, w, 0.0)
    return grid_flat.at[idx].add(w)


def _nonzero_normalize(grid: jax.Array) -> jax.Array:
    """Standardize the nonzero entries (mean 0, unbiased std 1), like the
    reference voxel-grid normalization (representations.py:114-122)."""
    nz = grid != 0
    cnt = jnp.sum(nz)
    safe_cnt = jnp.maximum(cnt, 1)
    mean = jnp.sum(jnp.where(nz, grid, 0.0)) / safe_cnt
    var = jnp.sum(jnp.where(nz, (grid - mean) ** 2, 0.0)) / jnp.maximum(
        safe_cnt - 1, 1)
    std = jnp.sqrt(var)
    centered = jnp.where(nz, grid - mean, grid)
    standardized = jnp.where(std > 0, centered / jnp.where(std > 0, std, 1.0),
                             centered)
    return jnp.where(cnt > 0, standardized, grid)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "normalize"))
def events_to_voxel_grid(
    x: jax.Array,
    y: jax.Array,
    t: jax.Array,
    p: jax.Array,
    *,
    bins: int,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
    normalize: bool = True,
) -> jax.Array:
    """Trilinear event splatting into a (bins, H, W) voxel grid.

    Polarity is mapped to {-1, +1} (any p < 1 becomes -1, reference
    representations.py:88-89); each event deposits value * trilinear weights
    onto its 8 surrounding (t, y, x) corners. Default MVSEC/EC representation
    (configs/dataset/mvsec.yaml: VoxelGrid, 16 channels).

    Args:
      x, y, t, p: (N,) event coordinates (may be float), timestamps and
        polarities; time-sorted with padding at the tail.
      mask: optional (N,) validity of each slot.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    p = p.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(x, dtype=bool)

    tn = normalize_time(t.astype(jnp.float32), mask)
    # reference rescales the *already normalized* time again over its span —
    # for the masked case the span of valid tn is [0, 1] so this is tn itself
    t_scaled = (bins - 1) * tn

    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    t0 = t_scaled.astype(jnp.int32)
    value = jnp.where(p < 1, -1.0, 1.0)

    grid = jnp.zeros((bins * height * width,), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dt in (0, 1):
                xl, yl, tl = x0 + dx, y0 + dy, t0 + dt
                inb = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                       & (tl >= 0) & (tl < bins) & mask)
                w = (value
                     * (1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                     * (1.0 - jnp.abs(yl.astype(jnp.float32) - y))
                     * (1.0 - jnp.abs(tl.astype(jnp.float32) - t_scaled)))
                idx = (tl * height + yl) * width + xl
                grid = _masked_scatter_add(grid, idx, w, inb)

    grid = grid.reshape(bins, height, width)
    if normalize:
        grid = _nonzero_normalize(grid)
    return grid


@functools.partial(jax.jit, static_argnames=("bins", "height", "width"))
def events_to_time_surface(
    x: jax.Array,
    y: jax.Array,
    t: jax.Array,
    p: jax.Array,
    *,
    bins: int,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-polarity time surfaces: channel 2*b + p holds the latest
    normalized timestamp of each pixel within time-bin b.

    Reference representations.py:26 writes events in time order so the last
    (max) timestamp wins — reproduced here with a scatter-max. Bin membership
    uses closed intervals [b*dt, (b+1)*dt] on both sides like the reference's
    searchsorted(left)/searchsorted(right) slicing (boundary events land in
    both adjacent bins).
    """
    n_bins = bins // 2
    if mask is None:
        mask = jnp.ones_like(x, dtype=bool)
    tn = normalize_time(t.astype(jnp.float32), mask)
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    pi = p.astype(jnp.int32)
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & mask

    dt_bin = 1.0 / n_bins
    surface = jnp.zeros((bins * height * width,), jnp.float32)
    for b in range(n_bins):
        in_bin = inb & (tn >= b * dt_bin) & (tn <= (b + 1) * dt_bin)
        ch = 2 * b + pi
        idx = jnp.where(in_bin, (ch * height + yi) * width + xi, 0)
        val = jnp.where(in_bin, tn, -jnp.inf)
        surface = surface.at[idx].max(val)
    surface = jnp.maximum(surface, 0.0)  # untouched pixels stay 0
    return surface.reshape(bins, height, width)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width"))
def events_to_event_stack(
    x: jax.Array,
    y: jax.Array,
    t: jax.Array,
    p: jax.Array,
    *,
    bins: int,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Signed event counts per time bin: stack[b, y, x] += (2p - 1).

    Reference representations.py:178 (polarity {0,1} -> ±1; same closed-
    interval bin membership as the time surface).
    """
    if mask is None:
        mask = jnp.ones_like(x, dtype=bool)
    tn = normalize_time(t.astype(jnp.float32), mask)
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    val = 2.0 * p.astype(jnp.float32) - 1.0
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & mask

    dt_bin = 1.0 / bins
    stack = jnp.zeros((bins * height * width,), jnp.float32)
    for b in range(bins):
        in_bin = inb & (tn >= b * dt_bin) & (tn <= (b + 1) * dt_bin)
        idx = (b * height + yi) * width + xi
        stack = _masked_scatter_add(stack, idx, val, in_bin)
    return stack.reshape(bins, height, width)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def events_to_accumulation_image(
    x: jax.Array,
    y: jax.Array,
    *,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Event-count image (the event-occupancy mask source).

    Replaces the reference's per-event python loop
    (datasets/visualize.py:draw_events_accumulation_image — its data-loading
    hot spot) with one scatter-add.
    """
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    if mask is not None:
        inb = inb & mask
    img = jnp.zeros((height * width,), jnp.float32)
    img = _masked_scatter_add(img, yi * width + xi, jnp.ones_like(xi, jnp.float32),
                              inb)
    return img.reshape(height, width)


@functools.partial(jax.jit, static_argnames=("bins", "height", "width",
                                             "n_iter"))
def events_to_distance_map(
    x: jax.Array,
    y: jax.Array,
    t: jax.Array,
    p: jax.Array,
    *,
    bins: int,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
    n_iter: Optional[int] = None,
) -> jax.Array:
    """Per-bin L2 distance transform of the event occupancy map.

    Reference representations.py:216 uses cv2.distanceTransform(DIST_L2, 3),
    a 3x3 chamfer approximation (weights a=0.955, b=1.3693). We reproduce the
    same chamfer metric with an iterated 3x3 min-plus relaxation — a chain of
    `lax.reduce_window`-style ops that XLA fuses on the VPU. `n_iter` bounds
    the propagation radius (default: enough to cover the image diagonal).
    """
    n_bins = bins
    if mask is None:
        mask = jnp.ones_like(x, dtype=bool)
    tn = normalize_time(t.astype(jnp.float32), mask)
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & mask

    a, b = 0.955, 1.3693  # OpenCV's DIST_L2 3x3 chamfer weights
    if n_iter is None:
        n_iter = max(height, width)

    dt_bin = 1.0 / n_bins
    out = []
    for bi in range(n_bins):
        in_bin = inb & (tn >= bi * dt_bin) & (tn <= (bi + 1) * dt_bin)
        occ = jnp.zeros((height * width,), jnp.float32)
        occ = occ.at[jnp.where(in_bin, yi * width + xi, 0)].max(
            jnp.where(in_bin, 1.0, 0.0))
        occ = occ.reshape(height, width)
        big = jnp.float32(1e9)
        dist = jnp.where(occ > 0, 0.0, big)

        def relax(d):
            dp = jnp.pad(d, 1, constant_values=big)
            c = jnp.stack([
                d,
                dp[:-2, 1:-1] + a, dp[2:, 1:-1] + a,
                dp[1:-1, :-2] + a, dp[1:-1, 2:] + a,
                dp[:-2, :-2] + b, dp[:-2, 2:] + b,
                dp[2:, :-2] + b, dp[2:, 2:] + b,
            ])
            return jnp.min(c, axis=0)

        dist = jax.lax.fori_loop(0, n_iter, lambda _, d: relax(d), dist)
        out.append(jnp.where(dist >= 1e8, 0.0, dist))
    return jnp.stack(out)


def _accumulation_representation(x, y, t, p, *, bins, height, width,
                                 mask=None):
    """Event-count image as a 1-channel representation (the reference's
    `events_image`, datasets/MVSEC.py:850-855 — raw counts, no
    normalization). Lets the ImageImageMatcher baselines (SuperPoint/SiLK
    on the accumulation frame vs the grayscale frame,
    configs/model/SuperpointMatcher.yaml) run through the same pipeline;
    `bins` is ignored (always 1 channel)."""
    del t, p, bins
    return events_to_accumulation_image(x, y, height=height, width=width,
                                        mask=mask)[None]


_CONVERTERS = {
    "VoxelGrid": events_to_voxel_grid,
    "TimeSurface": events_to_time_surface,
    "EventStack": events_to_event_stack,
    "DistanceMap": events_to_distance_map,
    "AccumulationImage": _accumulation_representation,
}


def build_representation(
    kind: str,
    x: jax.Array, y: jax.Array, t: jax.Array, p: jax.Array,
    *,
    bins: int,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch by representation name (config `representation_type`)."""
    if kind not in _CONVERTERS:
        raise ValueError(f"unknown representation {kind!r}; "
                         f"choose from {sorted(_CONVERTERS)}")
    return _CONVERTERS[kind](x, y, t, p, bins=bins, height=height, width=width,
                             mask=mask)


# ---------------------------------------------------------------------------
# Host-side helpers for the input pipeline
# ---------------------------------------------------------------------------


def pad_events(x: np.ndarray, y: np.ndarray, t: np.ndarray, p: np.ndarray,
               length: int) -> Tuple[np.ndarray, ...]:
    """Pad/truncate an event window to a fixed length + validity mask.

    Truncation keeps the most recent events (the reference's window is
    anchored at the frame timestamp; the tail is the informative part).
    """
    n = len(x)
    if n > length:
        sl = slice(n - length, n)
        x, y, t, p = x[sl], y[sl], t[sl], p[sl]
        n = length
    out = []
    for arr in (x, y, t, p):
        buf = np.zeros(length, dtype=np.asarray(arr).dtype)
        buf[:n] = arr
        out.append(buf)
    valid = np.zeros(length, dtype=bool)
    valid[:n] = True
    return (*out, valid)


# ---------------------------------------------------------------------------
# MXU matmul-splat voxelization (TPU fast path)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "bins", "height", "width", "normalize", "chunk", "slots",
    "matmul_dtype", "with_accumulation", "with_drop_stat", "align_bins"))
def events_to_voxel_grid_splat(
    x: jax.Array,
    y: jax.Array,
    t: jax.Array,
    p: jax.Array,
    *,
    bins: int,
    height: int,
    width: int,
    mask: Optional[jax.Array] = None,
    normalize: bool = True,
    chunk: int = 4096,
    slots: int = 4,
    matmul_dtype=jnp.bfloat16,
    with_accumulation: bool = True,
    with_drop_stat: bool = False,
    align_bins: bool = True,
):
    """Trilinear voxel splat via MXU matmuls instead of XLA scatter.

    XLA's scatter-add is the TPU bottleneck of on-device voxelization
    (~95 ms for 8x131k events vs ~8 ms for the whole conv extractor). This
    kernel exploits that events are TIME-SORTED: a fixed `chunk` of
    consecutive events touches only a few adjacent time bins, so each
    chunk's contribution to one time bin is a dense rank-decomposed 2D
    splat  I = (E_y * w)^T @ E_x  with E_y (C, H) / E_x (C, W) holding the
    bilinear row/column weights (two nonzeros per row) — a pair of one-hot
    matmuls the MXU eats. Per chunk, `slots` adjacent time bins starting at
    the chunk's first event's bin are accumulated via dynamic_update_slice.

    `align_bins=True` (default) first re-chunks the stream ON DEVICE so
    every chunk holds events of exactly ONE time bin: a gather-only
    reorganization (per-bin counts -> chunk-aligned destinations; no
    scatter) that is cheap because sortedness makes each bin's events a
    contiguous run. Aligned chunks span one bin by construction, so
    slots=2 (the event's two corner bins) captures ALL weight — the splat
    is exact on ANY stream, including bursty ones whose burst-gap chunks
    would span many bins (the failure mode of count-chunking, caught by
    round-1's bursty tests). Costs `bins` extra (mostly-empty) chunks but
    saves 2 slot matmuls per chunk.

    With `align_bins=False` (the raw count-chunked path), events whose
    time bin falls outside the chunk's `slots`-window are dropped —
    impossible for <=`slots`-1 bins per chunk.

    `matmul_dtype=bfloat16` keeps the one-hot weight matrices in bf16 with
    f32 accumulation (~1e-2 relative error on voxel values); pass
    jnp.float32 for exact parity with `events_to_voxel_grid`.

    Returns (grid (bins, H, W), accumulation (H, W)) when
    `with_accumulation` (the event-count image from the same matmuls),
    else just the grid. `with_drop_stat` appends a scalar: the total
    trilinear weight dropped by the slot-window guard (0.0 on any stream
    whose 4096-event chunks span <= slots-1 time bins; trainers log it so
    a pathological burst can never silently corrupt the representation).
    """
    xq = x.astype(jnp.float32)
    yq = y.astype(jnp.float32)
    pq = p.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(xq, dtype=bool)
    N = xq.shape[0]
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        xq = jnp.pad(xq, (0, pad))
        yq = jnp.pad(yq, (0, pad))
        pq = jnp.pad(pq, (0, pad))
        mask = jnp.pad(mask, (0, pad))

    tn = normalize_time(t.astype(jnp.float32), mask[:N] if pad else mask)
    tn = jnp.pad(tn, (0, pad)) if pad else tn
    ts = (bins - 1) * tn

    value = jnp.where(pq < 1, -1.0, 1.0)
    valid = mask & (xq >= 0) & (xq < width) & (yq >= 0) & (yq < height)

    cols = jnp.arange(width, dtype=jnp.float32)
    rows = jnp.arange(height, dtype=jnp.float32)

    def bilinear_factors(cx, cy):
        # bilinear row/col weight matrices (2 nonzeros per row)
        dy = 1.0 - jnp.abs(cy[:, None] - rows[None, :])      # (C, H)
        Ey = jnp.maximum(dy, 0.0)
        dx = 1.0 - jnp.abs(cx[:, None] - cols[None, :])      # (C, W)
        Ex = jnp.maximum(dx, 0.0).astype(matmul_dtype)
        return Ey, Ex

    def slot_update(grid, Ey, Ex, weights, b0):
        """Accumulate one (len(weights), H, W) block into grid[b0:].

        NOTE: keep the S THIN matmuls - stacking the slots into one
        (C, S*H) lhs was measured 1.8x SLOWER end-to-end (277 -> 154
        pairs/s): the broadcast-multiply + reshape materializes a
        (C, S, H) intermediate the compiler cannot fuse into the dot,
        while the per-slot (C, H) scaling fuses cleanly."""
        imgs = []
        for w in weights:
            lhs = (Ey * w[:, None]).astype(matmul_dtype)
            imgs.append(jax.lax.dot_general(
                lhs, Ex, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # (H, W)
        block = jnp.stack(imgs)                              # (S, H, W)
        cur = jax.lax.dynamic_slice(grid, (b0, 0, 0),
                                    (len(weights), height, width))
        return jax.lax.dynamic_update_slice(grid, cur + block, (b0, 0, 0))

    def occupancy_update(acc, cx, cy, cm):
        # integer-floor occupancy counts from one-hot matmuls
        oy = (jnp.floor(cy[:, None]) == rows[None, :])
        ox = (jnp.floor(cx[:, None]) == cols[None, :])
        lhs = (oy * cm[:, None]).astype(matmul_dtype)
        return acc + jax.lax.dot_general(
            lhs, ox.astype(matmul_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def splat_chunk(carry, cx, cy, ct, cv, cm, b0):
        grid, acc, dropped = carry
        Ey, Ex = bilinear_factors(cx, cy)
        tb = jnp.floor(ct).astype(jnp.int32)
        weights = []
        for s in range(slots):
            # t-weight of this chunk's events towards absolute bin b0+s:
            # corner tb (weight 1-frac) or tb+1 (weight frac)
            rel = (b0 + s) - tb
            frac = ct - tb
            wt = jnp.where(rel == 0, 1.0 - frac,
                           jnp.where(rel == 1, frac, 0.0))
            weights.append(cv * wt * ((b0 + s) < bins))
        grid = slot_update(grid, Ey, Ex, weights, b0)

        if acc is not None:
            acc = occupancy_update(acc, cx, cy, cm)

        if dropped is not None:
            # weight the slot window failed to capture: each event's two
            # time-bin corners are tb (1-frac) and tb+1 (frac); sortedness
            # guarantees tb >= b0, so only the far side can fall out
            frac = ct - tb
            rel_lo = tb - b0
            rel_hi = rel_lo + 1
            lost = jnp.where(cm,
                             (1.0 - frac) * (rel_lo >= slots)
                             + frac * (rel_hi >= slots), 0.0)
            dropped = dropped + jnp.sum(lost)
        return (grid, acc, dropped)

    if align_bins:
        # bin-aligned chunking: every chunk holds events of ONE time bin,
        # so slots=2 (the event's two corner bins) is always exact.
        # Sortedness makes each bin's events a CONTIGUOUS run, so chunks
        # are cheap lax.dynamic_slice windows (DMA copies) — an arbitrary
        # gather reorg was measured 11-27x slower than the splat itself.
        slots = 2  # an event's two corner bins; alignment needs no more
        tb_all = jnp.clip(jnp.floor(ts).astype(jnp.int32), 0, bins - 1)
        arangeb = jnp.arange(bins, dtype=jnp.int32)
        in_bin = (tb_all[:, None] == arangeb[None]) & mask[:, None]
        counts = jnp.sum(in_bin, axis=0)                    # (bins,)
        bin_first = jnp.cumsum(counts) - counts             # exclusive
        cpb = (counts + chunk - 1) // chunk                  # chunks/bin
        cpb_end = jnp.cumsum(cpb)
        n_al = n_chunks + bins                               # static bound
        c = jnp.arange(n_al, dtype=jnp.int32)
        b_c = jnp.sum(c[:, None] >= cpb_end[None, :], axis=1)
        b_cc = jnp.clip(b_c, 0, bins - 1)
        off = c - (cpb_end[b_cc] - cpb[b_cc])
        src = bin_first[b_cc] + off * chunk
        n_val = jnp.clip(counts[b_cc] - off * chunk, 0, chunk)
        n_val = jnp.where(b_c < bins, n_val, 0)
        N_tot = xq.shape[0]
        start = jnp.clip(src, 0, N_tot - chunk)
        delta = src - start                                  # >= 0
        lane = jnp.arange(chunk, dtype=jnp.int32)
        # one packed (4, N) array -> ONE 2D dynamic_slice per chunk (five
        # separate 1D slices were measured ~3 ms/batch slower: each extra
        # slice breaks fusion). |value| = 1, so validity rides along as
        # cv != 0 — no fifth row needed.
        packed = jnp.stack([xq, yq, ts, value * valid])

        def aligned_body(_, inp):
            b0, st, dl, nv = inp
            sl = jax.lax.dynamic_slice(packed, (0, st), (4, chunk))
            cx, cy, ct, cv = sl[0], sl[1], sl[2], sl[3]
            sel = (lane >= dl) & (lane < dl + nv)
            cv = cv * sel
            Ey, Ex = bilinear_factors(cx, cy)
            # every valid event in an aligned chunk has floor(ct) == b0,
            # so its corner weights are simply (1-frac, frac): no floor,
            # no slot-window tests, and nothing can be dropped
            frac = ct - b0
            imgs = []
            for w in (cv * (1.0 - frac), cv * frac):
                lhs = (Ey * w[:, None]).astype(matmul_dtype)
                imgs.append(jax.lax.dot_general(
                    lhs, Ex, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # (H, W)
            return 0, jnp.stack(imgs)                        # (2, H, W)

        # Carry-free scan: per-chunk corner blocks are stacked OUTPUTS and
        # combined afterwards by ONE (bins, 2*n_al) one-hot matmul over the
        # chunk axis. Carrying the f32 (bins+2, H, W) grid instead was
        # measured (XLA trace) to cost a whole-grid layout copy per scan
        # step plus nested per-item dynamic-update-slice while-loops —
        # ~2.9 of the 8.1 ms voxelize total at B=8.
        _, blocks = jax.lax.scan(aligned_body, 0,
                                 (b_cc, start, delta, n_val))
        ids = jnp.stack([b_cc, jnp.minimum(b_cc + 1, bins + slots - 1)],
                        1).reshape(-1)                       # (2*n_al,)
        # f32 on both sides: the blocks hold accumulated sums (hundreds)
        # that bf16's 8 mantissa bits would truncate; the matmul is tiny
        # (traffic-bound) so f32 costs nothing
        sel_onehot = (ids[None, :] == jnp.arange(bins + slots)[:, None]
                      ).astype(jnp.float32)                  # (bins+2, 2*n_al)
        grid = jax.lax.dot_general(
            sel_onehot, blocks.reshape(-1, height * width),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).reshape(bins + slots, height, width)
        dropped = jnp.float32(0.0) if with_drop_stat else None

        acc = None
        if with_accumulation:
            # occupancy has no time dimension: count it over plain
            # reshape-chunks (no dynamic slices, no per-bin remainders).
            # Carry-free like the splat scan above: per-chunk count images
            # leave as stacked outputs and one reduce sums them (an (H, W)
            # f32 carry still pays scan-carry copies).
            def acc_body(_, inp):
                cx, cy, cm = inp
                img = occupancy_update(
                    jnp.zeros((height, width), jnp.float32), cx, cy, cm)
                return 0, img
            _, acc_blocks = jax.lax.scan(
                acc_body, 0,
                (xq.reshape(n_chunks, chunk), yq.reshape(n_chunks, chunk),
                 valid.reshape(n_chunks, chunk)))
            acc = jnp.sum(acc_blocks, axis=0)
    else:
        xc = xq.reshape(n_chunks, chunk)
        yc = yq.reshape(n_chunks, chunk)
        tc = ts.reshape(n_chunks, chunk)
        vc = (value * valid).reshape(n_chunks, chunk)
        mc = valid.reshape(n_chunks, chunk)

        def chunk_body(carry, inp):
            cx, cy, ct, cv, cm = inp
            # first VALID event's bin anchors the slot window
            tb = jnp.floor(ct).astype(jnp.int32)
            b0 = jnp.clip(tb[jnp.argmax(cm)], 0, bins - 1)
            return splat_chunk(carry, cx, cy, ct, cv, cm, b0), None

        grid0 = jnp.zeros((bins + slots, height, width), jnp.float32)
        acc0 = jnp.zeros((height, width), jnp.float32) \
            if with_accumulation else None
        drop0 = jnp.float32(0.0) if with_drop_stat else None
        (grid, acc, dropped), _ = jax.lax.scan(
            chunk_body, (grid0, acc0, drop0), (xc, yc, tc, vc, mc))
    grid = grid[:bins]
    if normalize:
        grid = _nonzero_normalize(grid)
    out = (grid,)
    if with_accumulation:
        out = out + (acc,)
    if with_drop_stat:
        out = out + (dropped,)
    return out if len(out) > 1 else out[0]
