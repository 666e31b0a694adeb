"""Adaptive LightGlue inference: static-shape early exit + point pruning.

Reference semantics at core/modules/matchers/lightglue.py:431-432 (config),
:606-672 (the commented-out adaptive blocks), :718-743 (live helpers).
Our formulation: `lax.cond`-skipped layers after a batch-global stop check,
and mask-folded pruning (models/lightglue.py:_adaptive_layers). These tests
steer the decision heads via their bias params to force each regime and
check exact equivalence against the plain unrolled forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.models import LightGlue, LightGlueConfig


K, D = 32, 64
BASE = dict(input_dim=D, descriptor_dim=D, n_layers=3, num_heads=4)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _feats(rng, B=2):
    d = rng.normal(size=(B, K, D)).astype(np.float32)
    pos = np.concatenate([
        rng.uniform(0, 60, (B, K, 2)), rng.uniform(0, 1, (B, K, 1))],
        -1).astype(np.float32)
    valid = np.ones((B, K), bool)
    valid[:, -4:] = False  # some padded slots, as in production
    return {"sparse_descriptors": jnp.asarray(d),
            "sparse_positions": jnp.asarray(pos),
            "sparse_valid": jnp.asarray(valid),
            "image_size": jnp.full((B, 2), 64.0)}


def _set_bias(variables, name_fmt, n, value):
    """Overwrite the bias of Dense head `name_fmt.format(i)` for all i."""
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    for i in range(n):
        node = params
        for part in name_fmt.format(i).split("/"):
            node = node[part]
        node["bias"] = jnp.full_like(node["bias"], value)
    return {**variables, "params": params}


def _init_adaptive(cfg, f0, f1):
    model = LightGlue(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), f0, f1)
    return model, variables


class TestAdaptive:
    def test_never_exit_equals_plain_forward(self, rng):
        """Token confidences ~0 -> no early exit: the adaptive path must
        reproduce the plain full-depth forward (up to lax.cond fusion
        reassociation noise)."""
        f0, f1 = _feats(rng), _feats(rng)
        cfg = LightGlueConfig(**BASE, depth_confidence=0.95)
        model, variables = _init_adaptive(cfg, f0, f1)
        variables = _set_bias(variables, "token_confidence_{}", 2, -10.0)
        out = jax.jit(lambda v: model.apply(v, f0, f1))(variables)
        assert int(out["exit_layer"]) == 2

        plain = LightGlue(config=LightGlueConfig(**BASE))
        ref = plain.apply(variables, f0, f1)
        np.testing.assert_allclose(np.asarray(out["log_assignment"]),
                                   np.asarray(ref["log_assignment"]),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      np.asarray(ref["matches0"]))

    def test_exit_at_first_layer_equals_one_layer_model(self, rng):
        """Token confidences ~1 -> exit after layer 0; the result must equal
        a 1-layer plain model over the same params (layers 1..L-1 skipped,
        assignment head of the EXIT layer used — reference :668 uses
        log_assignment[i] at the break layer)."""
        f0, f1 = _feats(rng), _feats(rng)
        cfg = LightGlueConfig(**BASE, depth_confidence=0.5)
        model, variables = _init_adaptive(cfg, f0, f1)
        variables = _set_bias(variables, "token_confidence_{}", 2, 10.0)
        out = jax.jit(lambda v: model.apply(v, f0, f1))(variables)
        assert int(out["exit_layer"]) == 0

        one = LightGlue(config=LightGlueConfig(**{**BASE, "n_layers": 1}))
        ref = one.apply(variables, f0, f1)
        np.testing.assert_allclose(np.asarray(out["log_assignment"]),
                                   np.asarray(ref["log_assignment"]),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      np.asarray(ref["matches0"]))

    def test_prune_everything_unmatches_all(self, rng):
        """Width pruning with matchability ~0 prunes every confident token
        after layer 0 -> every match is -1 and no surviving tokens remain
        (the static-mask analogue of the reference's index_select removal +
        scatter-back-to--1, :649-672)."""
        f0, f1 = _feats(rng), _feats(rng)
        cfg = LightGlueConfig(**BASE, width_confidence=0.99)
        model, variables = _init_adaptive(cfg, f0, f1)
        variables = _set_bias(
            variables, "log_assignment_{}/matchability", 3, -10.0)
        out = jax.jit(lambda v: model.apply(v, f0, f1))(variables)
        assert (np.asarray(out["matches0"]) == -1).all()
        assert (np.asarray(out["matches1"]) == -1).all()
        assert not np.asarray(out["surviving0"]).any()

    def test_prune_keep_all_equals_plain(self, rng):
        """Matchability ~1 keeps every token: width-pruning enabled must be
        a no-op relative to the plain forward."""
        f0, f1 = _feats(rng), _feats(rng)
        cfg = LightGlueConfig(**BASE, width_confidence=0.99)
        model, variables = _init_adaptive(cfg, f0, f1)
        variables = _set_bias(
            variables, "log_assignment_{}/matchability", 3, 10.0)
        out = jax.jit(lambda v: model.apply(v, f0, f1))(variables)
        plain = LightGlue(config=LightGlueConfig(**BASE))
        ref = plain.apply(variables, f0, f1)
        np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                      np.asarray(ref["matches0"]))
        # padded slots stay excluded, valid ones all survive
        np.testing.assert_array_equal(np.asarray(out["surviving0"]),
                                      np.asarray(f0["sparse_valid"]))

    def test_depth_and_width_combined_runs(self, rng):
        """Both mechanisms on at reference defaults (0.95/0.99): runs under
        jit, exits somewhere in [0, L-1], surviving masks subset validity."""
        f0, f1 = _feats(rng), _feats(rng)
        cfg = LightGlueConfig(**BASE, depth_confidence=0.95,
                              width_confidence=0.99)
        model, variables = _init_adaptive(cfg, f0, f1)
        out = jax.jit(lambda v: model.apply(v, f0, f1))(variables)
        assert 0 <= int(out["exit_layer"]) <= 2
        assert (np.asarray(out["surviving0"])
                <= np.asarray(f0["sparse_valid"])).all()
        m0 = np.asarray(out["matches0"])
        assert ((m0 == -1) | np.asarray(out["surviving0"])).all()

    def test_training_ignores_adaptive_flags(self, rng):
        """Adaptive is inference-only (reference :607-608 gates on
        `not self.training`): training=True must produce the standard
        deep-supervision outputs."""
        f0, f1 = _feats(rng), _feats(rng)
        cfg = LightGlueConfig(**BASE, depth_confidence=0.95,
                              width_confidence=0.99)
        model = LightGlue(config=cfg)
        variables = model.init(jax.random.PRNGKey(0), f0, f1, training=True)
        out = model.apply(variables, f0, f1, training=True)
        assert out["all_log_assignments"].shape[1] == 3
        assert "exit_layer" not in out
