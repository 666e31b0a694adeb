"""LightGlue attention matcher.

Capability parity with reference `core/modules/matchers/lightglue.py:421`:
9-layer transformer with rotary learnable-Fourier positional encoding,
bidirectional shared-QK cross attention, per-layer sigmoid-gated dual-softmax
assignment heads, token-confidence heads, mutual+threshold match filtering,
and deep-supervision outputs for the NLL loss (lightglue.py:751-800; the
loss itself lives in `losses/matcher_loss.py`).

TPU-first re-design:
 - static K tokens per side; optional validity masks fold into attention
   biases (replacing the reference's batch-1 python loops / ragged lists);
 - during training every layer's log-assignment and confidence logits are
   produced inside the jitted forward (flax parameters are declared
   unconditionally), so the loss is pure array math — no module re-entry;
 - inference attention runs this repo's fused Pallas kernels
   (ops/pallas_attention.py): a 1024-token (batch, head) problem fits VMEM
   whole, so similarity + softmax(es) + PV never touch HBM; training
   falls back to XLA einsum+softmax (fused kernels are forward-only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_MASK_BIAS = -1e9


@dataclasses.dataclass(frozen=True)
class LightGlueConfig:
    input_dim: int = 256
    descriptor_dim: int = 256
    n_layers: int = 9
    num_heads: int = 4
    filter_threshold: float = 0.0
    gamma: float = 1.0           # deep-supervision layer weighting (loss)
    nll_balancing: float = 0.5   # (loss)
    dtype: str = "float32"       # compute dtype of dense/attention layers
    # dtype in which the (B, h, N, M) attention/assignment score matrices
    # are MATERIALIZED in HBM; the softmax itself always reduces in f32.
    # "bfloat16" halves the dominant HBM traffic of the matcher (the
    # reference runs flash attention in fp16, lightglue.py:224, so
    # half-precision scores match its numerics class).
    score_dtype: str = "float32"
    shard_heads: bool = False    # tensor-parallel: shard attention heads
                                 # over the mesh's "model" axis
    attention_impl: str = "auto"  # "auto" | "xla" | "flash" (jax's blocked
                                  # TPU kernel) | "pallas" (this repo's
                                  # fused per-(batch,head) VMEM kernels,
                                  # ops/pallas_attention.py). flash/pallas
                                  # are inference-only; XLA is used for
                                  # training/backprop and shard_heads
    scan_layers: bool = False    # lax.scan over the 9 identical layers:
                                 # one compiled layer body instead of nine
                                 # (param tree gains a leading layer axis;
                                 # see stack_lightglue_params)
    # Adaptive inference (reference lightglue.py:431-432, its early-exit /
    # point-pruning blocks are commented out at :606-672 — this is the
    # static-shape TPU formulation; -1 disables, reference defaults when
    # enabled are 0.95 / 0.99). Inference-only; requires scan_layers=False.
    depth_confidence: float = -1.0  # early exit when this fraction of
                                    # tokens is confident (batch-global:
                                    # every pair in the batch must pass —
                                    # lax.cond needs a scalar predicate)
    width_confidence: float = -1.0  # prune tokens that are confident AND
                                    # unmatchable via the validity masks
                                    # (static shapes: masked, not gathered)


def normalize_keypoints(kpts: jax.Array, size: jax.Array) -> jax.Array:
    """Center+scale keypoints by image size (reference lightglue.py:137).

    kpts: (B, N, 2) in the same axis order as `size` (B, 2) — yx with (H, W).
    """
    shift = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
    return (kpts - shift[:, None, :]) / scale[:, None, :]


def rotate_half(x: jax.Array) -> jax.Array:
    y = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = y[..., 0], y[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(freqs, t: jax.Array) -> jax.Array:
    return t * freqs[0] + rotate_half(t) * freqs[1]


class FourierPositionalEncoding(nn.Module):
    """Learnable Fourier features -> rotary (cos, sin) tables
    (reference LearnableFourierPositionalEncoding, lightglue.py:161)."""

    head_dim: int
    gamma: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array):
        proj = nn.Dense(self.head_dim // 2, use_bias=False,
                        kernel_init=nn.initializers.normal(self.gamma ** -2),
                        name="Wr")(x)
        cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
        # (B, N, head_dim) -> (B, 1, N, head_dim) broadcasting over heads
        return cos[:, None], sin[:, None]


def _head_sharding():
    """PartitionSpec ('data', 'model') for (B, h, N, d) tensors when a
    mesh with a 'model' axis is active — XLA then keeps the per-head
    attention local to each model-shard and all-gathers only the merged
    message (tensor parallelism over heads)."""
    from jax.sharding import PartitionSpec as P
    return P("data", "model")


def _maybe_shard_heads(t: jax.Array, enable: bool) -> jax.Array:
    if not enable:
        return t
    try:
        return jax.lax.with_sharding_constraint(t, _head_sharding())
    except (ValueError, RuntimeError):
        return t  # no mesh / no model axis: no-op


def _flash_supported(n: int, d: int) -> bool:
    """jax's TPU flash kernel wants tiles of at least (128, 128); the
    LightGlue production shapes (N=1024, d=64..128) qualify, tiny test
    shapes (and non-TPU backends) fall back to the XLA path."""
    import jax as _jax
    return (n % 128 == 0 and n >= 128 and d % 8 == 0
            and _jax.default_backend() == "tpu")


def _flash_attention(q, k, v, kv_mask, sm_scale: float) -> jax.Array:
    """jax.experimental TPU flash attention (never materializes the
    (N, M) scores in HBM). Key-side padding mask via segment ids: valid
    kv tokens get segment 1, invalid 2; all queries live in segment 1 so
    they attend only valid keys (outputs at invalid query rows are
    garbage and masked downstream, same as the XLA path)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, SegmentIds)
    segment_ids = None
    if kv_mask is not None:
        B, _, N, _ = q.shape
        q_seg = jnp.ones((B, N), jnp.int32)
        kv_seg = jnp.where(kv_mask, 1, 2).astype(jnp.int32)
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)
    return flash_attention(q, k, v, segment_ids=segment_ids, causal=False,
                           sm_scale=sm_scale)


def _pallas_supported(n: int, d: int, m: Optional[int] = None) -> bool:
    """ops/pallas_attention keeps one (N, M) f32 similarity tile per
    (batch, head) in VMEM: fine for the production 1024-token problems,
    skipped for tiny test shapes (tiling rules), for token counts whose
    tile no longer fits comfortably in VMEM (> 1024^2 f32 = 4 MB per head
    — fall back to XLA, or opt into "flash" there), and for non-TPU
    backends."""
    import jax as _jax
    return (n % 128 == 0 and d % 64 == 0
            and n * (m if m is not None else n) <= 1024 * 1024
            and _jax.default_backend() == "tpu")


def _attention(q, k, v, kv_mask: Optional[jax.Array],
               shard_heads: bool = False,
               impl: str = "xla",
               score_dtype=jnp.float32) -> jax.Array:
    if impl == "pallas" and _pallas_supported(q.shape[2], q.shape[3]):
        from ..ops.pallas_attention import self_attention
        return self_attention(q, k, v, kv_mask).astype(q.dtype)
    if impl == "pallas_vjp" and _pallas_supported(q.shape[2], q.shape[3]):
        # differentiable fused kernels (training): custom-vjp forward +
        # row-major backward, ops/pallas_attention.fused_attention_vjp
        from ..ops.pallas_attention import fused_attention_vjp
        return fused_attention_vjp(q, k, v, kv_mask).astype(q.dtype)
    if impl == "flash" and _flash_supported(q.shape[2], q.shape[3]):
        return _flash_attention(q, k, v, kv_mask,
                                sm_scale=q.shape[-1] ** -0.5).astype(q.dtype)
    return _attention_xla(q, k, v, kv_mask, shard_heads, score_dtype)


def _attention_xla(q, k, v, kv_mask: Optional[jax.Array],
                   shard_heads: bool = False,
                   score_dtype=jnp.float32) -> jax.Array:
    """(B, h, N, d) attention; kv_mask (B, M) masks keys.

    Mixed precision: QK^T and PV run in the operand dtype (bf16 on TPU)
    with f32 MXU accumulation; scores are materialized in `score_dtype`
    (the matcher's dominant HBM traffic at N=1024: 36 score matrices per
    forward); the softmax reduction always upcasts to f32 in-register."""
    q = _maybe_shard_heads(q, shard_heads)
    k = _maybe_shard_heads(k, shard_heads)
    v = _maybe_shard_heads(v, shard_heads)
    scale = q.shape[-1] ** -0.5
    q = q * jnp.asarray(scale, q.dtype)  # fold scale pre-matmul
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=score_dtype)
    if kv_mask is not None:
        sim = jnp.where(kv_mask[:, None, None, :], sim,
                        jnp.asarray(_MASK_BIAS, sim.dtype))
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class SelfBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    shard_heads: bool = False
    attn_impl: str = "xla"
    score_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, encoding, kv_mask=None):
        B, N, _ = x.shape
        h, hd = self.num_heads, self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype,
                       name="Wqkv")(x)
        qkv = qkv.reshape(B, N, h, hd, 3).transpose(0, 2, 1, 3, 4)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        if self.attn_impl == "pallas" and _pallas_supported(N, hd):
            # rotary fused into the kernel: raw q/k go in with the (cos,
            # sin) tables, saving the HBM round-trip of rotated q and k
            # the pallas_call boundary would otherwise force
            from ..ops.pallas_attention import self_attention
            rot = (encoding[0][:, 0], encoding[1][:, 0])   # (B, N, hd)
            ctx = self_attention(q, k, v, kv_mask, rot=rot).astype(q.dtype)
        else:
            q = apply_rotary(encoding, q)
            k = apply_rotary(encoding, k)
            ctx = _attention(q, k, v, kv_mask, self.shard_heads,
                             self.attn_impl, self.score_dtype)
        message = ctx.transpose(0, 2, 1, 3).reshape(B, N, self.embed_dim)
        message = nn.Dense(self.embed_dim, dtype=self.dtype,
                           name="out_proj")(message)
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="ffn_0")(y)
        # IO in compute dtype; flax always reduces the norm stats in f32
        # (normalization._compute_stats force_float32_reductions)
        y = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_3")(y)
        return x + y.astype(x.dtype)


class CrossBlock(nn.Module):
    """Bidirectional cross attention with a shared QK projection
    (reference CrossBlock, lightglue.py:275)."""

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    shard_heads: bool = False
    attn_impl: str = "xla"
    score_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, mask0=None, mask1=None):
        B, N, _ = x0.shape
        M = x1.shape[1]
        h, hd = self.num_heads, self.embed_dim // self.num_heads
        scale = hd ** -0.5
        to_qk = nn.Dense(self.embed_dim, dtype=self.dtype, name="to_qk")
        to_v = nn.Dense(self.embed_dim, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(self.embed_dim, dtype=self.dtype, name="to_out")

        def split(t, n):
            return t.reshape(B, n, h, hd).transpose(0, 2, 1, 3)

        qk0 = _maybe_shard_heads(split(to_qk(x0), N) * scale ** 0.5,
                                 self.shard_heads)
        qk1 = _maybe_shard_heads(split(to_qk(x1), M) * scale ** 0.5,
                                 self.shard_heads)
        v0 = _maybe_shard_heads(split(to_v(x0), N), self.shard_heads)
        v1 = _maybe_shard_heads(split(to_v(x1), M), self.shard_heads)

        if self.attn_impl == "pallas" and _pallas_supported(N, hd, M) \
                and M % 128 == 0:
            # fused bidirectional kernel: similarity + both softmaxes + both
            # PV products stay in VMEM per (batch, head)
            from ..ops.pallas_attention import cross_attention_bidir
            m0, m1 = cross_attention_bidir(qk0, qk1, v0, v1, mask0, mask1)
            m0 = m0.astype(v1.dtype)
            m1 = m1.astype(v0.dtype)
        elif self.attn_impl == "pallas_vjp" \
                and _pallas_supported(N, hd, M) and M % 128 == 0:
            # training: each direction through the differentiable fused
            # kernel (inputs pre-scaled -> scale 1); autodiff sums the
            # q-role and k-role gradients flowing into the shared qk
            from ..ops.pallas_attention import fused_attention_vjp
            m0 = fused_attention_vjp(qk0, qk1, v1, mask1,
                                     scale=1.0).astype(v1.dtype)
            m1 = fused_attention_vjp(qk1, qk0, v0, mask0,
                                     scale=1.0).astype(v0.dtype)
        elif self.attn_impl == "flash" and _flash_supported(N, hd) \
                and M % 128 == 0:
            # two flash passes (qk pre-scaled on both sides -> sm_scale 1);
            # loses the shared-similarity trick but never touches HBM with
            # the (N, M) scores, which dominates
            m0 = _flash_attention(qk0, qk1, v1, mask1, sm_scale=1.0
                                  ).astype(v1.dtype)
            m1 = _flash_attention(qk1, qk0, v0, mask0, sm_scale=1.0
                                  ).astype(v0.dtype)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", qk0, qk1,
                             preferred_element_type=self.score_dtype)
            if mask0 is not None and mask1 is not None:
                joint = mask0[:, None, :, None] & mask1[:, None, None, :]
                sim = jnp.where(joint, sim,
                                jnp.asarray(_MASK_BIAS, sim.dtype))
            simf = sim.astype(jnp.float32)
            attn01 = jax.nn.softmax(simf, axis=-1).astype(v1.dtype)
            # reverse direction: normalize over axis -2 directly instead of
            # materializing a transposed copy of the (B, h, N, M) scores
            attn10 = jax.nn.softmax(simf, axis=-2).astype(v0.dtype)
            m0 = jnp.einsum("bhij,bhjd->bhid", attn01, v1,
                            preferred_element_type=jnp.float32
                            ).astype(v1.dtype)
            m1 = jnp.einsum("bhij,bhid->bhjd", attn10, v0,
                            preferred_element_type=jnp.float32
                            ).astype(v0.dtype)

        def merge(t, n):
            return t.transpose(0, 2, 1, 3).reshape(B, n, self.embed_dim)

        m0 = to_out(merge(m0, N))
        m1 = to_out(merge(m1, M))

        ffn_0 = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="ffn_0")
        ffn_norm = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")
        ffn_3 = nn.Dense(self.embed_dim, dtype=self.dtype, name="ffn_3")

        def ffn(x, m):
            y = jnp.concatenate([x, m], axis=-1)
            out = ffn_3(nn.gelu(ffn_norm(ffn_0(y)), approximate=False))
            return x + out.astype(x.dtype)

        return ffn(x0, m0), ffn(x1, m1)


class TransformerLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    shard_heads: bool = False
    attn_impl: str = "xla"
    score_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, desc0, desc1, enc0, enc1, mask0=None, mask1=None):
        self_attn = SelfBlock(self.embed_dim, self.num_heads,
                              dtype=self.dtype,
                              shard_heads=self.shard_heads,
                              attn_impl=self.attn_impl,
                              score_dtype=self.score_dtype,
                              name="self_attn")
        cross_attn = CrossBlock(self.embed_dim, self.num_heads,
                                dtype=self.dtype,
                                shard_heads=self.shard_heads,
                                attn_impl=self.attn_impl,
                                score_dtype=self.score_dtype,
                                name="cross_attn")
        desc0 = self_attn(desc0, enc0, mask0)
        desc1 = self_attn(desc1, enc1, mask1)
        return cross_attn(desc0, desc1, mask0, mask1)


def sigmoid_log_double_softmax(sim, z0, z1) -> jax.Array:
    """(B, N, M) similarity + matchability logits (B, N|M, 1) ->
    (B, N+1, M+1) log assignment (reference lightglue.py:365)."""
    B, N, M = sim.shape
    certainties = (jax.nn.log_sigmoid(z0)
                   + jnp.swapaxes(jax.nn.log_sigmoid(z1), -1, -2))
    scores0 = jax.nn.log_softmax(sim, axis=2)
    scores1 = jnp.swapaxes(
        jax.nn.log_softmax(jnp.swapaxes(sim, -1, -2), axis=2), -1, -2)
    scores = jnp.zeros((B, N + 1, M + 1), sim.dtype)
    scores = scores.at[:, :N, :M].set(scores0 + scores1 + certainties)
    scores = scores.at[:, :-1, -1].set(jax.nn.log_sigmoid(-z0[..., 0]))
    scores = scores.at[:, -1, :-1].set(jax.nn.log_sigmoid(-z1[..., 0]))
    return scores


class MatchAssignment(nn.Module):
    """Shared final projection + matchability head
    (reference MatchAssignment, lightglue.py:380).

    mask0/mask1 (adaptive-inference path only): surviving-token masks;
    the similarity is biased to -1e9 outside their outer product so both
    log_softmax normalizations run over surviving slots only — the
    static-shape equivalent of the reference's index_select row removal
    (pruned rows/cols of the output are garbage and masked downstream).
    """

    dim: int

    @nn.compact
    def __call__(self, desc0, desc1, mask0=None, mask1=None):
        final_proj = nn.Dense(self.dim, name="final_proj")
        mdesc0 = final_proj(desc0) / self.dim ** 0.25
        mdesc1 = final_proj(desc1) / self.dim ** 0.25
        sim = jnp.einsum("bmd,bnd->bmn", mdesc0, mdesc1)
        if mask0 is not None and mask1 is not None:
            joint = mask0[:, :, None] & mask1[:, None, :]
            sim = jnp.where(joint, sim, jnp.asarray(_MASK_BIAS, sim.dtype))
        matchability = nn.Dense(1, name="matchability")
        scores = sigmoid_log_double_softmax(
            sim, matchability(desc0), matchability(desc1))
        return scores, sim


def filter_matches(scores: jax.Array, threshold: float):
    """Mutual-max + threshold match extraction from a log-assignment matrix
    (reference lightglue.py:402)."""
    core = scores[:, :-1, :-1]
    m0 = jnp.argmax(core, axis=2).astype(jnp.int32)
    m1 = jnp.argmax(core, axis=1).astype(jnp.int32)
    max0 = jnp.max(core, axis=2)
    indices0 = jnp.arange(m0.shape[1])[None]
    indices1 = jnp.arange(m1.shape[1])[None]
    mutual0 = indices0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = indices1 == jnp.take_along_axis(m0, m1, axis=1)
    max0_exp = jnp.exp(max0)
    mscores0 = jnp.where(mutual0, max0_exp, 0.0)
    mscores1 = jnp.where(mutual1,
                         jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    m0 = jnp.where(valid0, m0, -1)
    m1 = jnp.where(valid1, m1, -1)
    return m0, m1, mscores0, mscores1


class LightGlue(nn.Module):
    config: LightGlueConfig = LightGlueConfig()

    @nn.compact
    def __call__(self, feats0: Dict[str, jax.Array],
                 feats1: Dict[str, jax.Array],
                 training: bool = False) -> Dict[str, jax.Array]:
        cfg = self.config
        kpts0 = feats0["sparse_positions"][..., :2]
        kpts1 = feats1["sparse_positions"][..., :2]
        desc0 = feats0["sparse_descriptors"]
        desc1 = feats1["sparse_descriptors"]
        mask0 = feats0.get("sparse_valid")
        mask1 = feats1.get("sparse_valid")

        nk0 = normalize_keypoints(kpts0, feats0["image_size"])
        nk1 = normalize_keypoints(kpts1, feats1["image_size"])

        if cfg.input_dim != cfg.descriptor_dim:
            proj = nn.Dense(cfg.descriptor_dim, name="input_proj")
            desc0, desc1 = proj(desc0), proj(desc1)

        compute_dtype = jnp.dtype(cfg.dtype)
        desc0 = desc0.astype(compute_dtype)
        desc1 = desc1.astype(compute_dtype)
        head_dim = cfg.descriptor_dim // cfg.num_heads
        posenc = FourierPositionalEncoding(head_dim, name="posenc")
        enc0 = tuple(e.astype(compute_dtype) for e in posenc(nk0))
        enc1 = tuple(e.astype(compute_dtype) for e in posenc(nk1))

        impl = cfg.attention_impl
        if impl == "auto":
            # inference: this repo's fused per-(batch,head) VMEM kernels
            # (ops/pallas_attention.py) — full-pipeline measured 28.4 vs
            # 29.1 ms/batch over XLA at B=8/N=1024 (score HBM traffic gone;
            # the rest is compute-bound). jax's builtin "flash" loses here
            # (second cross pass, no shared similarity: 145 vs 277 pairs/s
            # round-1) but stays available for token counts whose f32
            # similarity tile no longer fits VMEM. Training/backprop uses
            # XLA (fused kernels are forward-only), see attn_impl below.
            impl = "pallas"
        if cfg.shard_heads:
            # tensor-parallel heads need XLA's partitionable einsums
            attn_impl = "xla"
        elif training:
            # pallas has a differentiable path (custom-vjp kernels,
            # gradient-exact vs XLA autodiff on CPU). Round 3 MEASURED it
            # on the target TPU: the backward compiles and steps fine but
            # LOSES the same-session A/B — stage-2 1.961 steps/s vs XLA's
            # 2.036 (tools/bench_train.py --stages stage2, B=8). The
            # whole-problem backward grid (B,) pipelines poorly against
            # XLA's partitioned score-gradient einsums, so XLA stays the
            # training default; EI_NEXUS_ATTN_TRAIN=pallas keeps the
            # kernels exercised (single device only: GSPMD cannot
            # partition a pallas_call). flash is forward-only.
            import os
            attn_impl = ("pallas_vjp"
                         if os.environ.get("EI_NEXUS_ATTN_TRAIN") == "pallas"
                         and impl == "pallas" and jax.device_count() == 1
                         else "xla")
        else:
            attn_impl = impl

        adaptive = ((cfg.depth_confidence > 0 or cfg.width_confidence > 0)
                    and not training and not cfg.scan_layers)
        # adaptive-init: run the plain loop but create EVERY per-layer head
        # and token-confidence param (the adaptive apply path reads them
        # all; training checkpoints already contain them)
        adaptive_init = adaptive and self.is_initializing()

        all_scores = []
        conf_logits0, conf_logits1 = [], []
        scores = sim = None
        exit_layer = None
        if adaptive and not adaptive_init:
            scores, sim, mask0, mask1, exit_layer = self._adaptive_layers(
                desc0, desc1, enc0, enc1, mask0, mask1, compute_dtype,
                attn_impl)
        elif cfg.scan_layers:
            scores, sim, extras = self._scanned_layers(
                desc0, desc1, enc0, enc1, mask0, mask1, compute_dtype,
                attn_impl, training)
            if training:
                all_la, conf0, conf1 = extras
        else:
            for i in range(cfg.n_layers):
                desc0, desc1 = TransformerLayer(
                    cfg.descriptor_dim, cfg.num_heads, dtype=compute_dtype,
                    shard_heads=cfg.shard_heads, attn_impl=attn_impl,
                    score_dtype=jnp.dtype(cfg.score_dtype),
                    name=f"transformers_{i}")(desc0, desc1, enc0, enc1,
                                              mask0, mask1)
                head = MatchAssignment(cfg.descriptor_dim,
                                       name=f"log_assignment_{i}")
                d0f = desc0.astype(jnp.float32)
                d1f = desc1.astype(jnp.float32)
                if training or adaptive_init:
                    scores, sim = head(d0f, d1f)
                    all_scores.append(scores)
                elif i == cfg.n_layers - 1:
                    scores, sim = head(d0f, d1f)
                if i < cfg.n_layers - 1:
                    token = nn.Dense(1, name=f"token_confidence_{i}")
                    if training:
                        conf_logits0.append(
                            token(jax.lax.stop_gradient(d0f))[..., 0])
                        conf_logits1.append(
                            token(jax.lax.stop_gradient(d1f))[..., 0])
                    elif adaptive_init:
                        token(d0f)

        m0, m1, ms0, ms1 = filter_matches(scores, cfg.filter_threshold)
        if mask0 is not None:
            m0 = jnp.where(mask0, m0, -1)
            ms0 = jnp.where(mask0, ms0, 0.0)
        if mask1 is not None:
            m1 = jnp.where(mask1, m1, -1)
            ms1 = jnp.where(mask1, ms1, 0.0)
        # a valid query must not match an INVALID key slot (the assignment
        # head sees unmasked padded descriptors, so its argmax can land on
        # one; the reference never pads at eval — batch-1 ragged loop)
        if mask1 is not None:
            tgt_ok0 = jnp.take_along_axis(mask1, jnp.maximum(m0, 0), axis=1)
            m0 = jnp.where(tgt_ok0, m0, -1)
            ms0 = jnp.where(tgt_ok0, ms0, 0.0)
        if mask0 is not None:
            tgt_ok1 = jnp.take_along_axis(mask0, jnp.maximum(m1, 0), axis=1)
            m1 = jnp.where(tgt_ok1, m1, -1)
            ms1 = jnp.where(tgt_ok1, ms1, 0.0)

        out = {
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": ms0,
            "matching_scores1": ms1,
            "similarity": sim,
            "log_assignment": scores,
        }
        if exit_layer is not None:
            # adaptive diagnostics: 0-based layer the batch exited at and
            # the surviving-token masks after width pruning
            out["exit_layer"] = exit_layer
            out["surviving0"] = (mask0 if mask0 is not None
                                 else jnp.ones(m0.shape, bool))
            out["surviving1"] = (mask1 if mask1 is not None
                                 else jnp.ones(m1.shape, bool))
        if training:
            # (B, L, N+1, M+1) per-layer assignments for deep supervision
            if cfg.scan_layers:
                out["all_log_assignments"] = all_la
                out["confidence_logits0"] = conf0
                out["confidence_logits1"] = conf1
            else:
                out["all_log_assignments"] = jnp.stack(all_scores, axis=1)
                out["confidence_logits0"] = jnp.stack(conf_logits0, axis=1)
                out["confidence_logits1"] = jnp.stack(conf_logits1, axis=1)
        return out

    def _adaptive_layers(self, desc0, desc1, enc0, enc1, mask0, mask1,
                         compute_dtype, attn_impl):
        """Early exit + point pruning with STATIC shapes (inference only).

        Reference semantics (lightglue.py:606-672 commented out; helpers
        :718-743 live): after layer i, token confidences decide (a) whether
        to stop — ratio of confident tokens > depth_confidence — and
        (b) which tokens to prune — confident AND matchability below
        1 - width_confidence.  TPU formulation:

         - layers after the exit point are SKIPPED at runtime via
           `lax.cond` with a batch-global scalar predicate (every pair in
           the batch must pass the stop check; the reference asserts b==1);
         - pruning folds into the validity masks consumed by the attention
           bias and the masked assignment head, instead of gather/scatter
           row removal — shapes never change, the pruned tokens simply
           stop participating (and are force-unmatched downstream);
         - the per-layer modules are applied DETACHED (`Module.apply` on
           `self.variables` subtrees) so a `lax.cond` can skip them; the
           params were created by the adaptive-init pass / training.

        Returns (scores, sim, mask0', mask1', exit_layer)."""
        cfg = self.config
        L = cfg.n_layers
        do_stop = cfg.depth_confidence > 0
        do_prune = cfg.width_confidence > 0
        params = self.variables["params"]
        B, N = desc0.shape[:2]
        M = desc1.shape[1]
        # pruning masks (p*) are tracked separately from base validity: the
        # assignment head must renormalize over pruned-out slots only, NOT
        # over padded slots — the plain forward feeds padded slots through
        # the head unmasked (post-filtered), and adaptive-off must equal it
        # bit-for-bit
        p0 = jnp.ones((B, N), bool)
        p1 = jnp.ones((B, M), bool)
        a0 = (mask0 if mask0 is not None else jnp.ones((B, N), bool))
        a1 = (mask1 if mask1 is not None else jnp.ones((B, M), bool))

        def layer_apply(i, op):
            d0, d1, a0, a1 = op
            mod = TransformerLayer(
                cfg.descriptor_dim, cfg.num_heads, dtype=compute_dtype,
                shard_heads=False, attn_impl=attn_impl,
                score_dtype=jnp.dtype(cfg.score_dtype))
            return mod.apply({"params": params[f"transformers_{i}"]},
                             d0, d1, enc0, enc1, a0, a1)

        def head_apply(i, d0, d1, p0, p1):
            mod = MatchAssignment(cfg.descriptor_dim)
            return mod.apply({"params": params[f"log_assignment_{i}"]},
                             d0.astype(jnp.float32), d1.astype(jnp.float32),
                             p0 if do_prune else None,
                             p1 if do_prune else None)

        def token_conf(i, d):
            w = params[f"token_confidence_{i}"]
            logits = nn.Dense(1).apply({"params": w},
                                       d.astype(jnp.float32))[..., 0]
            return jax.nn.sigmoid(logits)

        def matchability(i, d):
            w = params[f"log_assignment_{i}"]["matchability"]
            logits = nn.Dense(1).apply({"params": w},
                                       d.astype(jnp.float32))[..., 0]
            return jax.nn.sigmoid(logits)

        done = jnp.asarray(False)
        scores = jnp.zeros((B, N + 1, M + 1), jnp.float32)
        sim = jnp.zeros((B, N, M), jnp.float32)
        exit_layer = jnp.asarray(L - 1, jnp.int32)

        for i in range(L):
            desc0, desc1 = jax.lax.cond(
                done, lambda op: (op[0], op[1]),
                lambda op: layer_apply(i, op), (desc0, desc1, a0, a1))
            last = i == L - 1
            if not last and (do_stop or do_prune):
                conf0 = token_conf(i, desc0)
                conf1 = token_conf(i, desc1)
                # scaled threshold, reference lightglue.py:718-721
                th = float(np.clip(0.8 + 0.1 * np.exp(-4.0 * i / L), 0, 1))
            if not last and do_stop:
                # stop check over valid+surviving tokens of both sides
                # (reference :732-743 counts all tokens; it never pads)
                low = (jnp.sum((conf0 < th) & a0, axis=1)
                       + jnp.sum((conf1 < th) & a1, axis=1))
                num = jnp.maximum(jnp.sum(a0, 1) + jnp.sum(a1, 1), 1)
                ratio = 1.0 - low / num
                stop_now = jnp.all(ratio > cfg.depth_confidence)
            else:
                stop_now = None
            newly = (jnp.logical_not(done) if last or stop_now is None
                     else jnp.logical_and(jnp.logical_not(done), stop_now))
            if last or do_stop:
                scores, sim = jax.lax.cond(
                    newly, lambda op: head_apply(i, *op),
                    lambda op: (scores, sim), (desc0, desc1, p0, p1))
                exit_layer = jnp.where(newly, i, exit_layer)
            if stop_now is not None:
                done = jnp.logical_or(done, stop_now)
            if last:
                done = jnp.asarray(True)
            if not last and do_prune:
                # keep: matchable OR not-yet-confident (reference :723-730)
                keep0 = matchability(i, desc0) > (1 - cfg.width_confidence)
                keep1 = matchability(i, desc1) > (1 - cfg.width_confidence)
                if do_stop:
                    keep0 = keep0 | (conf0 <= th)
                    keep1 = keep1 | (conf1 <= th)
                p0 = jnp.where(done, p0, p0 & keep0)
                p1 = jnp.where(done, p1, p1 & keep1)
                a0 = a0 & p0
                a1 = a1 & p1
        return scores, sim, a0, a1, exit_layer

    def _scanned_layers(self, desc0, desc1, enc0, enc1, mask0, mask1,
                        compute_dtype, attn_impl, training):
        """lax.scan over the transformer stack + vmapped per-layer heads.

        One compiled layer body (and only two unique Pallas attention
        kernels) instead of n_layers copies — an order of magnitude off
        compile times; identical math to the unrolled path. Param tree:
        layers/..., log_assignment/... with a leading (L,) axis."""
        cfg = self.config
        L = cfg.n_layers

        class Body(nn.Module):
            @nn.compact
            def __call__(self2, carry, _):
                d0, d1 = carry
                d0, d1 = TransformerLayer(
                    cfg.descriptor_dim, cfg.num_heads, dtype=compute_dtype,
                    shard_heads=cfg.shard_heads, attn_impl=attn_impl,
                    score_dtype=jnp.dtype(cfg.score_dtype),
                    name="layer")(d0, d1, enc0, enc1, mask0, mask1)
                return (d0, d1), (d0, d1)

        Scanned = nn.scan(Body, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=L)
        (_, _), (stack0, stack1) = Scanned(name="layers")(
            (desc0, desc1), None)
        # (L, B, N, D) all-layer descriptors
        stack0 = stack0.astype(jnp.float32)
        stack1 = stack1.astype(jnp.float32)

        VAssign = nn.vmap(MatchAssignment, variable_axes={"params": 0},
                          split_rngs={"params": True}, in_axes=0, out_axes=0,
                          axis_size=L)
        all_scores, all_sim = VAssign(cfg.descriptor_dim,
                                      name="log_assignment")(stack0, stack1)
        scores = all_scores[-1]
        sim = all_sim[-1]
        extras = None
        if training:
            VToken = nn.vmap(nn.Dense, variable_axes={"params": 0},
                             split_rngs={"params": True}, in_axes=0,
                             out_axes=0, axis_size=L - 1)
            token = VToken(1, name="token_confidence")
            conf0 = token(jax.lax.stop_gradient(stack0[:-1]))[..., 0]
            conf1 = token(jax.lax.stop_gradient(stack1[:-1]))[..., 0]
            extras = (jnp.swapaxes(all_scores, 0, 1),
                      jnp.swapaxes(conf0, 0, 1),
                      jnp.swapaxes(conf1, 0, 1))
        return scores, sim, extras


# ---------------------------------------------------------------------------
# Torch checkpoint porting (official LightGlue release weights)
# ---------------------------------------------------------------------------


def _dense(sd, key, bias=True):
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{key}.weight"]).T)}
    if bias:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{key}.bias"]))
    return p


def _layernorm(sd, key):
    return {"scale": jnp.asarray(np.asarray(sd[f"{key}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{key}.bias"]))}


def load_lightglue_torch_weights(state_dict,
                                 n_layers: int = 9) -> Dict[str, Any]:
    """Port a torch LightGlue state dict (reference naming:
    transformers.{i}.self_attn/..., log_assignment.{i}.*,
    token_confidence.{i}.token.0) to this module's flax params."""
    sd = dict(state_dict)
    # old-style keys self_attn.{i} -> transformers.{i}.self_attn
    for i in range(n_layers):
        for old, new in ((f"self_attn.{i}", f"transformers.{i}.self_attn"),
                         (f"cross_attn.{i}", f"transformers.{i}.cross_attn")):
            sd = {k.replace(old, new): v for k, v in sd.items()}

    params: Dict[str, Any] = {}
    params["posenc"] = {"Wr": _dense(sd, "posenc.Wr", bias=False)}
    if any(k.startswith("input_proj.") for k in sd):
        params["input_proj"] = _dense(sd, "input_proj")
    for i in range(n_layers):
        t = f"transformers.{i}"
        params[f"transformers_{i}"] = {
            "self_attn": {
                "Wqkv": _dense(sd, f"{t}.self_attn.Wqkv"),
                "out_proj": _dense(sd, f"{t}.self_attn.out_proj"),
                "ffn_0": _dense(sd, f"{t}.self_attn.ffn.0"),
                "ffn_norm": _layernorm(sd, f"{t}.self_attn.ffn.1"),
                "ffn_3": _dense(sd, f"{t}.self_attn.ffn.3"),
            },
            "cross_attn": {
                "to_qk": _dense(sd, f"{t}.cross_attn.to_qk"),
                "to_v": _dense(sd, f"{t}.cross_attn.to_v"),
                "to_out": _dense(sd, f"{t}.cross_attn.to_out"),
                "ffn_0": _dense(sd, f"{t}.cross_attn.ffn.0"),
                "ffn_norm": _layernorm(sd, f"{t}.cross_attn.ffn.1"),
                "ffn_3": _dense(sd, f"{t}.cross_attn.ffn.3"),
            },
        }
        params[f"log_assignment_{i}"] = {
            "final_proj": _dense(sd, f"log_assignment.{i}.final_proj"),
            "matchability": _dense(sd, f"log_assignment.{i}.matchability"),
        }
        if i < n_layers - 1:
            params[f"token_confidence_{i}"] = _dense(
                sd, f"token_confidence.{i}.token.0")
    return {"params": params}


def stack_lightglue_params(params: Dict[str, Any],
                           n_layers: int) -> Dict[str, Any]:
    """Convert unrolled per-layer params (transformers_{i} /
    log_assignment_{i} / token_confidence_{i}) to the scan_layers layout
    (layers/layer, log_assignment, token_confidence with a leading (L,)
    axis). Lets torch-ported or previously trained checkpoints run in
    scanned mode."""
    import jax

    def stack(trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    out = {k: v for k, v in params.items()
           if not (k.startswith("transformers_")
                   or k.startswith("log_assignment_")
                   or k.startswith("token_confidence_"))}
    out["layers"] = {"layer": stack(
        [params[f"transformers_{i}"] for i in range(n_layers)])}
    out["log_assignment"] = stack(
        [params[f"log_assignment_{i}"] for i in range(n_layers)])
    if f"token_confidence_0" in params:
        out["token_confidence"] = stack(
            [params[f"token_confidence_{i}"] for i in range(n_layers - 1)])
    return out
