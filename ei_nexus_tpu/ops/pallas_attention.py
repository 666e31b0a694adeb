"""Pallas TPU kernels: fused attention for LightGlue's 1024-token problems.

The XLA attention materializes the (B, h, N, M) similarity matrix in HBM
three times per layer (QK^T out, softmax in/out, PV in) — at N=M=1024 f32
that's the dominant LightGlue cost on TPU. At this sequence length the WHOLE
similarity tile fits VMEM (1024^2 f32 = 4 MB), so no online-softmax
streaming is needed: one kernel per (batch, head) computes QK^T, the f32
softmax and the PV matmul entirely on-chip.

Two kernels:
 - `self_attention(q, k, v, mask)`: standard row-softmax attention;
 - `cross_attention_bidir(qk0, qk1, v0, v1, ...)`: LightGlue's shared-QK
   bidirectional cross attention — computes the similarity ONCE and derives
   both directions (row softmax @ v1, column softmax^T @ v0), halving the
   matmul volume vs two separate passes.

Masks are key-side (B, N) booleans; -1e9 bias like the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIAS = -1e9


def _self_kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    mask = m_ref[0, :, 0] > 0
    scale = q.shape[-1] ** -0.5
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[None, :], s, _BIAS)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   kv_mask: Optional[jax.Array] = None,
                   interpret: bool = False) -> jax.Array:
    """(B, h, N, d) fused attention; kv_mask (B, N) masks keys."""
    B, h, N, d = q.shape
    if kv_mask is None:
        kv_mask = jnp.ones((B, N), jnp.float32)
    else:
        kv_mask = kv_mask.astype(jnp.float32)
    kv_mask = kv_mask[..., None]  # (B, N, 1): TPU-tileable block shape
    spec = pl.BlockSpec((1, 1, N, d), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _self_kernel,
        grid=(B, h),
        in_specs=[spec, spec, spec, mspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, kv_mask)


def _cross_kernel(qk0_ref, qk1_ref, v0_ref, v1_ref, m0_ref, m1_ref,
                  o0_ref, o1_ref):
    a = qk0_ref[0, 0]
    b = qk1_ref[0, 0]
    v0 = v0_ref[0, 0]
    v1 = v1_ref[0, 0]
    mask0 = m0_ref[0, :, 0] > 0
    mask1 = m1_ref[0, :, 0] > 0
    s = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(mask0[:, None] & mask1[None, :], s, _BIAS)
    p01 = jax.nn.softmax(s, axis=-1).astype(v1.dtype)
    p10 = jax.nn.softmax(s, axis=0).astype(v0.dtype)
    o0_ref[0, 0] = jax.lax.dot_general(
        p01, v1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o0_ref.dtype)
    o1_ref[0, 0] = jax.lax.dot_general(
        p10, v0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o1_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_attention_bidir(
    qk0: jax.Array, qk1: jax.Array, v0: jax.Array, v1: jax.Array,
    mask0: Optional[jax.Array] = None, mask1: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Shared-similarity bidirectional cross attention.

    qk0 (B, h, N, d), qk1 (B, h, M, d) (pre-scaled); returns
    (m0 (B, h, N, d), m1 (B, h, M, d)).
    """
    B, h, N, d = qk0.shape
    M = qk1.shape[2]
    if mask0 is None:
        mask0 = jnp.ones((B, N), jnp.float32)
    else:
        mask0 = mask0.astype(jnp.float32)
    if mask1 is None:
        mask1 = jnp.ones((B, M), jnp.float32)
    else:
        mask1 = mask1.astype(jnp.float32)
    mask0 = mask0[..., None]
    mask1 = mask1[..., None]

    def spec(n):
        return pl.BlockSpec((1, 1, n, d), lambda b, i: (b, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def mspec(n):
        return pl.BlockSpec((1, n, 1), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _cross_kernel,
        grid=(B, h),
        in_specs=[spec(N), spec(M), spec(N), spec(M), mspec(N), mspec(M)],
        out_specs=(spec(N), spec(M)),
        out_shape=(jax.ShapeDtypeStruct(qk0.shape, qk0.dtype),
                   jax.ShapeDtypeStruct(qk1.shape, qk1.dtype)),
        interpret=interpret,
    )(qk0, qk1, v0, v1, mask0, mask1)
