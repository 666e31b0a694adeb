"""Evaluation-loop tests: val_extractor and rpe_eval drive a small EIM on
synthetic batches end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ei_nexus_tpu.models import EIM
from ei_nexus_tpu.train import create_train_state
from ei_nexus_tpu.train.evaluate import val_extractor, rpe_eval
from ei_nexus_tpu.train.steps import batch_representation
from tests.test_train import small_config, synth_batch, H, W, BINS, KPTS


@pytest.fixture(scope="module")
def eval_setup():
    rng = np.random.default_rng(0)
    model = EIM(config=small_config("MNN"))
    batch = synth_batch(rng)
    ev_rep, ev_mask = batch_representation(
        {k: jnp.asarray(v) for k, v in batch[0].items()
         if k.startswith("events")}, "VoxelGrid", BINS, H, W)
    variables = model.init({"params": jax.random.PRNGKey(0)}, ev_rep,
                           jnp.asarray(batch[0]["image"]), ev_mask)
    state = create_train_state(model, variables, optax.sgd(0.0))
    return model, state, rng


class TestValExtractor:
    def test_metrics_dict(self, eval_setup):
        model, state, rng = eval_setup
        batches = [synth_batch(rng) for _ in range(2)]
        out = val_extractor(state, model, batches, "VoxelGrid", BINS, H, W)
        for key in ("R@1", "R@3", "MR", "VVD_Repeatability@1"):
            assert key in out, sorted(out)
        assert 0.0 <= out["R@3"] <= 1.0
        assert "HE@3_auc" in out

    def test_max_batches(self, eval_setup):
        model, state, rng = eval_setup
        batches = [synth_batch(rng) for _ in range(3)]
        out = val_extractor(state, model, batches, "VoxelGrid", BINS, H, W,
                            max_batches=1)
        assert "R@1" in out


class TestRPEEval:
    def test_summary_keys(self, eval_setup):
        model, state, rng = eval_setup
        batches = [synth_batch(rng) for _ in range(2)]
        out = rpe_eval(state, model, batches, "VoxelGrid", BINS, H, W,
                       pose_thresh=(5, 10, 20))
        assert out["n_pairs"] == 4
        for t in (5, 10, 20):
            assert f"RPE@{t}_auc" in out
        # random model on random scenes: errors exist but fields are finite
        assert np.isfinite(out["RPE@5_auc"])
