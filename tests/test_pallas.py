"""Pallas kernels in interpreter mode vs their XLA references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.ops.detector import nms
from ei_nexus_tpu.ops.pallas_nms import nms_pallas


class TestPallasNMS:
    def test_sparse_map(self, rng):
        s = rng.uniform(0, 1, (2, 40, 48)).astype(np.float32)
        s[s < 0.6] = 0
        want = np.asarray(nms(jnp.asarray(s), 4))
        got = np.asarray(nms_pallas(jnp.asarray(s), 4, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_dense_map(self, rng):
        s = rng.uniform(0.01, 1, (1, 32, 32)).astype(np.float32)
        want = np.asarray(nms(jnp.asarray(s), 3, max_iter=4))
        got = np.asarray(nms_pallas(jnp.asarray(s), 3, n_iter=4,
                                    interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_separation_property(self, rng):
        s = rng.uniform(0, 1, (1, 48, 48)).astype(np.float32)
        out = np.asarray(nms_pallas(jnp.asarray(s), 4, interpret=True))[0]
        ys, xs = np.nonzero(out)
        for i in range(len(ys)):
            for j in range(i + 1, len(ys)):
                assert max(abs(ys[i] - ys[j]), abs(xs[i] - xs[j])) > 4


class TestPallasAttention:
    """ops/pallas_attention fused kernels vs the XLA attention math
    (models/lightglue.py). Interpreter mode; f32 exactness expected since
    both paths do the same f32 softmax."""

    def test_self_attention_matches_xla(self, rng):
        from ei_nexus_tpu.ops.pallas_attention import self_attention
        from ei_nexus_tpu.models.lightglue import _attention_xla
        B, h, N, d = 2, 3, 128, 64
        q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, d)).astype(
            np.float32)) for _ in range(3))
        mask = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
        want = _attention_xla(q, k, v, mask)
        got = self_attention(q, k, v, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_self_attention_no_mask(self, rng):
        from ei_nexus_tpu.ops.pallas_attention import self_attention
        from ei_nexus_tpu.models.lightglue import _attention_xla
        B, h, N, d = 1, 2, 128, 64
        q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, d)).astype(
            np.float32)) for _ in range(3))
        want = _attention_xla(q, k, v, None)
        got = self_attention(q, k, v, None, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_cross_bidir_matches_xla(self, rng):
        """Both directions against the CrossBlock einsum math; only valid
        query rows compared (invalid rows carry differently-masked
        garbage in both implementations and are masked downstream)."""
        from ei_nexus_tpu.ops.pallas_attention import cross_attention_bidir
        B, h, N, M, d = 2, 2, 128, 256, 64
        qk0 = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        qk1 = jnp.asarray(rng.normal(size=(B, h, M, d)).astype(np.float32))
        v0 = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        v1 = jnp.asarray(rng.normal(size=(B, h, M, d)).astype(np.float32))
        m0 = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
        m1 = jnp.asarray(rng.uniform(size=(B, M)) > 0.2)

        sim = jnp.einsum("bhid,bhjd->bhij", qk0, qk1)
        joint = m0[:, None, :, None] & m1[:, None, None, :]
        sim_m = jnp.where(joint, sim, -1e9)
        w0 = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim_m, -1), v1)
        w1 = jnp.einsum("bhij,bhid->bhjd", jax.nn.softmax(sim_m, -2), v0)

        g0, g1 = cross_attention_bidir(qk0, qk1, v0, v1, m0, m1,
                                       interpret=True)
        np.testing.assert_allclose(
            np.asarray(jnp.where(m0[:, None, :, None], g0, 0)),
            np.asarray(jnp.where(m0[:, None, :, None], w0, 0)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.where(m1[:, None, :, None], g1, 0)),
            np.asarray(jnp.where(m1[:, None, :, None], w1, 0)), atol=1e-5)

    def test_qblock_variant_matches_whole_problem(self, rng):
        """block_q path: q-blocked grid == whole-problem kernels == XLA
        reference. block_q is a STATIC jit arg, so the two variants get
        distinct traces (an env-global toggle would hit the jit cache and
        compare the blocked output against itself)."""
        import ei_nexus_tpu.ops.pallas_attention as pa
        from ei_nexus_tpu.models.lightglue import _attention_xla
        B, h, N, d = 2, 2, 128, 64
        q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, d)).astype(
            np.float32)) for _ in range(3))
        mask = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
        got = pa.self_attention(q, k, v, mask, interpret=True, block_q=64)
        want = _attention_xla(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        qk0 = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        qk1 = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        v0 = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        v1 = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        m0 = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
        m1 = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
        gb0, gb1 = pa.cross_attention_bidir(qk0, qk1, v0, v1, m0, m1,
                                            interpret=True, block_q=64)
        gw0, gw1 = pa.cross_attention_bidir(qk0, qk1, v0, v1, m0, m1,
                                            interpret=True, block_q=0)
        np.testing.assert_allclose(
            np.asarray(jnp.where(m0[:, None, :, None], gb0, 0)),
            np.asarray(jnp.where(m0[:, None, :, None], gw0, 0)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.where(m1[:, None, :, None], gb1, 0)),
            np.asarray(jnp.where(m1[:, None, :, None], gw1, 0)), atol=1e-5)

    def test_rotary_fused_matches_apply_rotary(self, rng):
        """Rotary folded into the self kernels (whole-problem AND q-block)
        == apply_rotary outside + plain attention. Exercises the ±1
        rotate-half matmul reformulation (a lane shuffle is a Mosaic
        hazard; x @ R is exact in any dtype)."""
        from ei_nexus_tpu.ops.pallas_attention import self_attention
        from ei_nexus_tpu.models.lightglue import (_attention_xla,
                                                   apply_rotary)
        B, h, N, d = 2, 2, 128, 64
        q, k, v = (jnp.asarray(rng.normal(size=(B, h, N, d)).astype(
            np.float32)) for _ in range(3))
        mask = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
        # head-shared (B, 1, N, d) tables as FourierPositionalEncoding emits
        ang = rng.uniform(0, 2 * np.pi, (B, 1, N, d // 2)).astype(np.float32)
        cos = jnp.asarray(np.repeat(np.cos(ang), 2, axis=-1))
        sin = jnp.asarray(np.repeat(np.sin(ang), 2, axis=-1))
        want = _attention_xla(apply_rotary((cos, sin), q),
                              apply_rotary((cos, sin), k), v, mask)
        rot = (cos[:, 0], sin[:, 0])
        got_whole = self_attention(q, k, v, mask, interpret=True,
                                   block_q=0, rot=rot)
        got_block = self_attention(q, k, v, mask, interpret=True,
                                   block_q=64, rot=rot)
        np.testing.assert_allclose(np.asarray(got_whole), np.asarray(want),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_block), np.asarray(want),
                                   atol=1e-5)

    def test_fused_attention_vjp_grads_match_xla(self, rng):
        """Custom-vjp fused attention: gradients == XLA autodiff (the
        training path). Covers both scale conventions (self d^-0.5, cross
        pre-scaled -> 1.0)."""
        from ei_nexus_tpu.ops.pallas_attention import fused_attention_vjp
        from ei_nexus_tpu.models.lightglue import _attention_xla
        B, h, N, M, d = 2, 2, 128, 256, 64
        q = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, h, M, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, h, M, d)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=(B, M)) > 0.2)
        co = jnp.asarray(rng.normal(size=(B, h, N, d)).astype(np.float32))

        gp = jax.grad(lambda q, k, v: jnp.sum(fused_attention_vjp(
            q, k, v, mask, interpret=True) * co), argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda q, k, v: jnp.sum(_attention_xla(
            q, k, v, mask) * co), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

        def xla1(q, k, v):
            sim = jnp.einsum("bhid,bhjd->bhij", q, k)
            sim = jnp.where(mask[:, None, None, :], sim, -1e9)
            return jnp.einsum("bhij,bhjd->bhid",
                              jax.nn.softmax(sim, -1), v)

        gp1 = jax.grad(lambda q, k, v: jnp.sum(fused_attention_vjp(
            q, k, v, mask, scale=1.0, interpret=True) * co),
            argnums=(0, 1, 2))(q, k, v)
        gx1 = jax.grad(lambda q, k, v: jnp.sum(xla1(q, k, v) * co),
                       argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp1, gx1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)
