"""Pallas TPU kernels: fused attention for LightGlue's 1024-token problems.

The XLA attention materializes the (B, h, N, M) similarity matrix in HBM
several times per layer (QK^T out, softmax in/out, PV in) — the dominant
LightGlue cost on TPU at N=M=1024 (CrossBlock alone moves ~0.7 GB/layer).
At this sequence length one (batch, head) problem fits VMEM outright
(1024^2 f32 similarity = 4 MB), so no online-softmax streaming is needed:
one grid step per (batch, head) computes QK^T, the f32 softmax and the PV
matmul entirely on-chip. HBM traffic drops to the q/k/v inputs + outputs
(~0.5 MB per head-problem).

A first-round variant of these kernels hung Mosaic for 18+ minutes per
compile. The cause was its column-direction path: `softmax(axis=0)` (a
sublane-major reduction over the full tile) followed by a dim-0-contracted
dot — both force whole-tile relayouts/transposes of the 4 MB similarity.
This version keeps EVERY reduction and contraction row-major:

 - `self_attention(q, k, v, mask)`: row-softmax attention, one direction;
 - `cross_attention_bidir(qk0, qk1, v0, v1, ...)`: LightGlue's shared-QK
   bidirectional cross attention. The reverse direction re-computes the
   transposed similarity with a second (M, d) @ (d, N) matmul on the SMALL
   bf16 operands (134 MFLOP — ~1% of the traffic it saves) instead of
   transposing or column-reducing the f32 tile.

Masks are key-side (B, N) booleans, passed to the kernels as additive f32
bias rows (0 / -1e9), the same convention as the XLA path
(models/lightglue.py `_attention_xla`).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIAS = -1e9
# experimental: q-block size for the pipelined variant (0 = whole-problem
# kernels). Smaller grid steps let Mosaic overlap DMA/MXU/VPU across steps;
# k/v index maps are constant per (b, h) so they are fetched once.
_QBLOCK = int(os.environ.get("EI_NEXUS_ATTN_QBLOCK", "0"))


def _rotate_half_matrix(d: int, dtype) -> jax.Array:
    """(d, d) constant with x @ R == rotate_half(x) (LightGlue's interleaved
    rotary pairing, models/lightglue.py:86). rotate_half is a lane-axis
    interleave shuffle — a Mosaic relayout hazard inside a kernel — but as a
    ±1 permutation matrix it is one MXU matmul, exact in any dtype:
    out[2m] = -x[2m+1], out[2m+1] = x[2m]."""
    import numpy as np
    r = np.zeros((d, d), np.float32)
    r[np.arange(1, d, 2), np.arange(0, d, 2)] = -1.0
    r[np.arange(0, d, 2), np.arange(1, d, 2)] = 1.0
    return jnp.asarray(r, dtype)


def _rot(t, cos, sin, r):
    """In-kernel rotary: t ⊙ cos + (t @ R) ⊙ sin, all in t.dtype (matches
    the XLA path's bf16 elementwise apply_rotary; the R matmul is exact)."""
    th = jax.lax.dot_general(t, r, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(t.dtype)
    return t * cos + th * sin


def _qblock_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale):
    q = q_ref[0, 0]                       # (bq, d)
    k = k_ref[0, 0]                       # (M, d)
    v = v_ref[0, 0]                       # (M, d)
    bias = b_ref[0, 0]                    # (M,)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = _row_softmax(s + bias[None, :]).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qblock_rot_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       r_ref, b_ref, o_ref, *, scale):
    """q-blocked attention with the rotary position encoding fused in:
    raw (un-rotated) q/k enter straight from the QKV projection, saving one
    HBM round-trip of rotated q and k per self layer."""
    r = r_ref[...]                        # (d, d)
    q = _rot(q_ref[0, 0], cq_ref[0], sq_ref[0], r)
    k = _rot(k_ref[0, 0], ck_ref[0], sk_ref[0], r)
    v = v_ref[0, 0]
    bias = b_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = _row_softmax(s + bias[None, :]).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qblock_attention(q, k, v, bias, scale: float, block_q: int,
                      interpret: bool = False, rot=None):
    """Generic row-softmax attention, q blocked over the grid: serves the
    self case and either cross direction (pre-scaled inputs, scale=1).
    rot=(cos, sin) (B, N, d) tables fuse the rotary encoding of q AND k
    (self attention: N == M, same tables both sides)."""
    B, h, N, d = q.shape
    M = k.shape[2]
    grid = (B, h, N // block_q)
    qspec = pl.BlockSpec((1, 1, block_q, d), lambda b, i, n: (b, i, n, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, M, d), lambda b, i, n: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, M), lambda b, i, n: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, block_q, d), lambda b, i, n: (b, i, n, 0),
                         memory_space=pltpu.VMEM)
    if rot is None:
        return pl.pallas_call(
            functools.partial(_qblock_kernel, scale=scale),
            grid=grid,
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            interpret=interpret,
        )(q, k, v, bias)
    cos, sin = rot                         # (B, N, d), head-shared
    r = _rotate_half_matrix(d, q.dtype)
    tq = pl.BlockSpec((1, block_q, d), lambda b, i, n: (b, n, 0),
                      memory_space=pltpu.VMEM)
    tk = pl.BlockSpec((1, M, d), lambda b, i, n: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((d, d), lambda b, i, n: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_qblock_rot_kernel, scale=scale),
        grid=grid,
        in_specs=[qspec, kspec, kspec, tq, tq, tk, tk, rspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, cos, sin, cos, sin, r, bias)


def _row_softmax(s):
    """Row (lane-axis) softmax of an f32 tile — the fast TPU direction."""
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "block_q"))
def self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   kv_mask: Optional[jax.Array] = None,
                   interpret: bool = False,
                   block_q: Optional[int] = None,
                   rot=None) -> jax.Array:
    """(B, h, N, d) fused attention; kv_mask (B, N) masks keys.

    block_q: 0 = whole-problem kernel, > 0 = q-blocked pipelined grid,
    None = the EI_NEXUS_ATTN_QBLOCK env default. A static jit arg so the
    two variants never share a trace.

    rot: optional (cos, sin) rotary tables, each (B, N, d) and shared
    across heads — pass RAW q/k and the encoding is applied inside the
    kernel (saves the HBM round-trip of rotated q and k that the kernel
    boundary otherwise forces; reference applies rotary to q and k only,
    lightglue.py:206-237)."""
    if block_q is None:
        block_q = _QBLOCK
    B, h, N, d = q.shape
    bias = (jnp.zeros((B, N), jnp.float32) if kv_mask is None
            else jnp.where(kv_mask, 0.0, _BIAS).astype(jnp.float32))
    # (B, 1, N) so the block's trailing two dims equal the array's (TPU
    # block-shape rule: divisible by (8, 128) or exactly the array dims)
    bias = bias[:, None, :]
    if block_q and N % block_q == 0:
        return _qblock_attention(q, k, v, bias, d ** -0.5, block_q,
                                 interpret, rot=rot)
    return _whole_attention(q, k, v, bias, d ** -0.5, interpret, rot=rot)


def _cross_kernel(qk0_ref, qk1_ref, v0_ref, v1_ref, b0_ref, b1_ref,
                  o0_ref, o1_ref, *, heads):
    bias0 = b0_ref[0, 0]                  # (N,)
    bias1 = b1_ref[0, 0]                  # (M,)
    for hh in range(heads):
        a = qk0_ref[0, hh]                # (N, d), pre-scaled
        b = qk1_ref[0, hh]                # (M, d), pre-scaled
        v0 = v0_ref[0, hh]
        v1 = v1_ref[0, hh]
        # direction 0 -> 1: rows are side-0 queries
        s01 = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        p01 = _row_softmax(s01 + bias1[None, :]).astype(v1.dtype)
        o0_ref[0, hh] = jax.lax.dot_general(
            p01, v1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o0_ref.dtype)
        # direction 1 -> 0: recompute the transposed similarity from the
        # small bf16 operands (b @ a^T) so the softmax stays row-major —
        # never transpose or column-reduce the f32 tile (Mosaic hazard)
        s10 = jax.lax.dot_general(b, a, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        p10 = _row_softmax(s10 + bias0[None, :]).astype(v0.dtype)
        o1_ref[0, hh] = jax.lax.dot_general(
            p10, v0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_q"))
def cross_attention_bidir(
    qk0: jax.Array, qk1: jax.Array, v0: jax.Array, v1: jax.Array,
    mask0: Optional[jax.Array] = None, mask1: Optional[jax.Array] = None,
    interpret: bool = False,
    block_q: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Shared-QK bidirectional cross attention (LightGlue CrossBlock).

    qk0 (B, h, N, d) / qk1 (B, h, M, d) are the shared query/key
    projections, PRE-SCALED by scale**0.5 on both sides (sm scale 1 inside,
    matching the XLA path); v0/v1 the value projections. Returns
    (message0 (B, h, N, d), message1 (B, h, M, d)).

    Matches `_attention_xla`'s cross usage: both directions softmax the
    same similarity (masked by the joint validity), one over keys of side
    1, one over keys of side 0.
    """
    B, h, N, d = qk0.shape
    M = qk1.shape[2]
    bias0 = (jnp.zeros((B, N), jnp.float32) if mask0 is None
             else jnp.where(mask0, 0.0, _BIAS).astype(jnp.float32))[:, None]
    bias1 = (jnp.zeros((B, M), jnp.float32) if mask1 is None
             else jnp.where(mask1, 0.0, _BIAS).astype(jnp.float32))[:, None]
    if block_q is None:
        block_q = _QBLOCK
    if block_q and N % block_q == 0 and M % block_q == 0:
        # both directions through the same generic q-blocked kernel
        # (inputs pre-scaled -> scale 1); the similarity is recomputed for
        # the reverse direction, which the whole-problem kernel does too
        return (
            _qblock_attention(qk0, qk1, v1, bias1, 1.0, block_q, interpret),
            _qblock_attention(qk1, qk0, v0, bias0, 1.0, block_q, interpret))

    def spec(n):
        return pl.BlockSpec((1, h, n, d), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def bspec(n):
        return pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_cross_kernel, heads=h),
        grid=(B,),
        in_specs=[spec(N), spec(M), spec(N), spec(M), bspec(N), bspec(M)],
        out_specs=(spec(N), spec(M)),
        out_shape=(jax.ShapeDtypeStruct(qk0.shape, qk0.dtype),
                   jax.ShapeDtypeStruct(qk1.shape, qk1.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qk0, qk1, v0, v1, bias0, bias1)


# ---------------------------------------------------------------------------
# Differentiable fused attention (training path)
# ---------------------------------------------------------------------------


def _generic_fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, heads):
    """Single-direction whole-problem attention; arbitrary softmax scale."""
    bias = b_ref[0, 0]                    # (M,) key-side additive bias
    for hh in range(heads):
        q = q_ref[0, hh]                  # (N, d)
        k = k_ref[0, hh]                  # (M, d)
        v = v_ref[0, hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = _row_softmax(s + bias[None, :]).astype(v.dtype)
        o_ref[0, hh] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _whole_rot_kernel(q_ref, k_ref, v_ref, c_ref, s_ref, r_ref, b_ref,
                      o_ref, *, scale, heads):
    """Whole-problem self attention with the rotary encoding fused in
    (tables head-shared; see _qblock_rot_kernel)."""
    bias = b_ref[0, 0]                    # (N,)
    r = r_ref[...]
    cos = c_ref[0]                        # (N, d)
    sin = s_ref[0]
    for hh in range(heads):
        q = _rot(q_ref[0, hh], cos, sin, r)
        k = _rot(k_ref[0, hh], cos, sin, r)
        v = v_ref[0, hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = _row_softmax(s + bias[None, :]).astype(v.dtype)
        o_ref[0, hh] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _whole_attention(q, k, v, bias_lane, scale: float, interpret: bool,
                     rot=None):
    B, h, N, d = q.shape
    M = k.shape[2]

    def spec(n):
        return pl.BlockSpec((1, h, n, d), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    bspec = pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    if rot is None:
        return pl.pallas_call(
            functools.partial(_generic_fwd_kernel, scale=scale, heads=h),
            grid=(B,),
            in_specs=[spec(N), spec(M), spec(M), bspec],
            out_specs=spec(N),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(q, k, v, bias_lane)
    cos, sin = rot
    r = _rotate_half_matrix(d, q.dtype)
    tspec = pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((d, d), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_whole_rot_kernel, scale=scale, heads=h),
        grid=(B,),
        in_specs=[spec(N), spec(M), spec(M), tspec, tspec, rspec, bspec],
        out_specs=spec(N),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v, cos, sin, r, bias_lane)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, bl_ref, bc_ref, do_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, heads):
    """Flash-style attention backward with every contraction and softmax
    ROW-major (the Mosaic compile hazard is column-direction work on the
    (N, M) f32 tile — see module docstring). The transposed quantities are
    recomputed from the small (tokens, d) operands:

      S  = scale·QK^T + bias[None, :];  m, Z = rowmax/rowsumexp(S)
      P  = exp(S − m)/Z                                  (N, M)
      dP = dO V^T;  c = rowsum(dP ∘ P);  dS = P ∘ (dP − c[:, None])
      dQ = scale · dS K
      S^T  = scale·KQ^T + bias[:, None]                  (M, N)
      P^T[j,i] = exp(S^T[j,i] − m_i)/Z_i   (pass-1 row normalizers — NOT a
                 row softmax of S^T, whose normalization axis is wrong)
      dV   = P^T dO
      dP^T = V dO^T;  dS^T = P^T ∘ (dP^T − c[None, :])
      dK   = scale · dS^T Q

    bias enters row-wise in the first pass (lane broadcast of bl) and
    column-wise in the transposed pass — fed as a separate (M, 1)-shaped
    input (bc) so no in-kernel vector relayout is needed; m/Z/c cross from
    sublane to lane orientation via tiny (N,)-vector reshapes.
    """
    bias_lane = bl_ref[0, 0]              # (M,) lanes
    for hh in range(heads):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        do = do_ref[0, hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_lane[None, :]                          # (N, M) f32
        m = jnp.max(s, axis=1, keepdims=True)               # (N, 1)
        e = jnp.exp(s - m)
        z = jnp.sum(e, axis=1, keepdims=True)               # (N, 1)
        p = e / z
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        c = jnp.sum(dp * p, axis=1, keepdims=True)          # (N, 1)
        ds = (p * (dp - c)).astype(q.dtype)
        dq_ref[0, hh] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale).astype(dq_ref.dtype)

        # transposed pass: rows are keys; pass-1 normalizers along lanes
        bias_col = bc_ref[0, :, 0]                          # (M,) sublanes
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        st = st + bias_col[:, None]                         # (M, N)
        m_lane = m.reshape(1, -1)                           # (1, N)
        z_lane = z.reshape(1, -1)
        c_lane = c.reshape(1, -1)
        pt = jnp.exp(st - m_lane) / z_lane                  # = P^T
        dv_ref[0, hh] = jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dst = (pt * (dpt - c_lane)).astype(q.dtype)
        dk_ref[0, hh] = (jax.lax.dot_general(
            dst, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * scale).astype(dk_ref.dtype)


def _attention_bwd_call(q, k, v, bias_lane, bias_col, do, scale: float,
                        interpret: bool):
    B, h, N, d = q.shape
    M = k.shape[2]

    def spec(n):
        return pl.BlockSpec((1, h, n, d), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_attention_bwd_kernel, scale=scale, heads=h),
        grid=(B,),
        in_specs=[spec(N), spec(M), spec(M),
                  pl.BlockSpec((1, 1, M), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, M, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  spec(N)],
        out_specs=(spec(N), spec(M), spec(M)),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, k, v, bias_lane, bias_col, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attention(q, k, v, bias_lane, bias_col, scale, interpret):
    return _whole_attention(q, k, v, bias_lane, scale, interpret)


def _fused_attention_fwd(q, k, v, bias_lane, bias_col, scale, interpret):
    o = _whole_attention(q, k, v, bias_lane, scale, interpret)
    return o, (q, k, v, bias_lane, bias_col)


def _fused_attention_bwd(scale, interpret, res, do):
    q, k, v, bias_lane, bias_col = res
    dq, dk, dv = _attention_bwd_call(q, k, v, bias_lane, bias_col,
                                     do.astype(q.dtype), scale, interpret)
    return dq, dk, dv, jnp.zeros_like(bias_lane), jnp.zeros_like(bias_col)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention_vjp(q: jax.Array, k: jax.Array, v: jax.Array,
                        kv_mask: Optional[jax.Array] = None,
                        scale: Optional[float] = None,
                        interpret: bool = False) -> jax.Array:
    """Differentiable fused attention: the whole-problem forward kernel
    plus a matching row-major backward kernel (training path — XLA's
    attention backward materializes the scores AND their gradients in HBM).
    The key-side mask receives zero gradient (it is boolean upstream).

    scale: softmax scale (default d^-0.5; pass 1.0 for LightGlue's
    pre-scaled cross projections).
    """
    B, h, N, d = q.shape
    M = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    bias = (jnp.zeros((B, M), jnp.float32) if kv_mask is None
            else jnp.where(kv_mask, 0.0, _BIAS).astype(jnp.float32))
    return _fused_attention(q, k, v, bias[:, None, :], bias[:, :, None],
                            float(scale), interpret)
