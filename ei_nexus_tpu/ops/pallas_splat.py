"""Pallas TPU kernel: fused matmul-splat voxelization.

Fuses the whole events->voxel-grid conversion of `events_to_voxel_grid_splat`
into one kernel: per (sample, chunk) grid step it builds the bilinear one-hot
row/column matrices in VMEM, runs the slot matmuls on the MXU, and
accumulates into a VMEM-resident (bins+slots+1, H, W) scratch that persists
across the sequential chunk iterations — the E matrices and partial images
never touch HBM (the XLA version moves ~300 MB/sample of one-hot matrices
through HBM). The final chunk DMAs the finished grid + accumulation image
out.

Layout notes:
 - TPU grid iterations run sequentially per core, so VMEM scratch carries
   the accumulator across chunks of one sample; it is zeroed at chunk 0.
 - outputs are per-sample VMEM blocks written once at the last chunk
   (vmem_limit raised; double-buffering disabled by the single write).
 - slot images address the scratch at a per-chunk dynamic offset b0 =
   min valid time bin of the chunk (`pl.ds`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splat_kernel(x_ref, y_ref, t_ref, v_ref, m_ref, grid_out, acc_out,
                  scratch, *, bins, height, width, slots, matmul_dtype):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        scratch[:] = jnp.zeros_like(scratch)

    xs = x_ref[0, 0, :, 0]
    ys = y_ref[0, 0, :, 0]
    ts = t_ref[0, 0, :, 0]
    vs = v_ref[0, 0, :, 0]
    ms = m_ref[0, 0, :, 0]

    C = xs.shape[0]
    # row one-hots are built TRANSPOSED — (H, C) with events along lanes —
    # so every slot matmul is a plain row-major (H, C) @ (C, W) contraction.
    # The first version built (C, H) and contracted dim 0 of both operands
    # (lhs^T @ rhs): Mosaic then relayouts/transposes the 2 MB tile per
    # slot per chunk — the same column-direction hazard that made the
    # round-1 attention kernels hang (see ops/pallas_attention.py), and the
    # reason this kernel measured 24 ms vs XLA's 12.
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (height, C), 0).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C, width), 1).astype(
        jnp.float32)

    Eyt = jnp.maximum(1.0 - jnp.abs(ys[None, :] - rows_t), 0.0)
    Ex = jnp.maximum(1.0 - jnp.abs(xs[:, None] - cols), 0.0).astype(
        matmul_dtype)

    tb = jnp.floor(ts).astype(jnp.int32)
    b0 = jnp.min(jnp.where(ms, tb, bins - 1))
    b0 = jnp.clip(b0, 0, bins - 1)
    frac = ts - tb.astype(jnp.float32)

    for s in range(slots):
        rel = (b0 + s) - tb
        wt = jnp.where(rel == 0, 1.0 - frac,
                       jnp.where(rel == 1, frac, 0.0))
        in_range = ((b0 + s) < bins).astype(jnp.float32)
        w = vs * wt * in_range
        lhs = (Eyt * w[None, :]).astype(matmul_dtype)
        img = jax.lax.dot_general(
            lhs, Ex, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        scratch[pl.ds(b0 + s, 1), :, :] += img[None]

    # occupancy counts (integer floor one-hots) -> last scratch channel
    oyt = (jnp.floor(ys[None, :]) == rows_t).astype(matmul_dtype)
    ox = (jnp.floor(xs[:, None]) == cols).astype(matmul_dtype)
    oyw = oyt * ms.astype(matmul_dtype)[None, :]
    cnt = jax.lax.dot_general(oyw, ox, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    scratch[pl.ds(bins + slots, 1), :, :] += cnt[None]

    @pl.when(c == n_chunks - 1)
    def _():
        grid_out[0] = scratch[pl.ds(0, bins), :, :]
        acc_out[0] = scratch[bins + slots, :, :]


@functools.partial(jax.jit, static_argnames=(
    "bins", "height", "width", "normalize", "chunk", "slots", "interpret"))
def voxel_grid_splat_pallas(
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
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched fused voxel splat. x/y/t/p/mask: (B, N) padded event arrays
    (t raw timestamps, time-sorted, padding at tail). Returns
    (grid (B, bins, H, W), accumulation (B, H, W)).

    Same semantics (and burst caveat) as events_to_voxel_grid_splat; bf16
    matmuls with f32 accumulation.
    """
    from ..data.representations import normalize_time, _nonzero_normalize

    B, N = x.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    xq = x.astype(jnp.float32)
    yq = y.astype(jnp.float32)
    pq = p.astype(jnp.float32)
    tn = jax.vmap(normalize_time)(t.astype(jnp.float32), mask)
    ts = (bins - 1) * tn
    value = jnp.where(pq < 1, -1.0, 1.0)
    valid = mask & (xq >= 0) & (xq < width) & (yq >= 0) & (yq < height)
    vs = value * valid

    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    def rs(a, fill=0.0):
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        return a.reshape(B, n_chunks, chunk, 1)

    xc, yc, vc = rs(xq), rs(yq), rs(vs)
    tc = rs(ts, fill=float(bins + slots))  # padded slots out of range
    mc = rs(valid.astype(jnp.float32)) > 0

    spec = pl.BlockSpec((1, 1, chunk, 1), lambda b, c: (b, c, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_out, acc_out = pl.pallas_call(
        functools.partial(_splat_kernel, bins=bins, height=height,
                          width=width, slots=slots,
                          matmul_dtype=jnp.bfloat16),
        grid=(B, n_chunks),
        in_specs=[spec] * 5,
        out_specs=(pl.BlockSpec((1, bins, height, width),
                                lambda b, c: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, height, width), lambda b, c: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, bins, height, width),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((B, height, width), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((bins + slots + 1, height, width), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # batch dim is independent; chunk dim carries the VMEM scratch
            # accumulator and must run sequentially
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xc, yc, tc, vc, mc)

    if normalize:
        grid_out = jax.vmap(_nonzero_normalize)(grid_out)
    return grid_out, acc_out
