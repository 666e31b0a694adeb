"""Training harness tests: optimizers/schedules, config system, train steps
(loss decreases; frozen modules stay fixed), data-parallel sharded step on
the 8-device CPU mesh, checkpoint round-trip + stage surgery."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ei_nexus_tpu.models import EIM, EIMConfig, KeypointExtractorConfig, \
    LightGlueConfig
from ei_nexus_tpu.models.eim import ExtractorSpec, MatcherConfig
from ei_nexus_tpu.losses import build_losses
from ei_nexus_tpu.train import (
    build_optimizer, build_schedule, create_train_state,
    freeze_mask, save_checkpoint, restore_checkpoint,
    load_stage1_event_extractor,
)
from ei_nexus_tpu.train.steps import (
    make_stage1_train_step, make_stage2_train_step, make_eval_step,
    batch_representation,
)
from ei_nexus_tpu.train.partition import frozen_roots_from_config
from ei_nexus_tpu.parallel import make_mesh, shard_batch, replicate
from ei_nexus_tpu.utils.config import (
    Config, load_config, apply_overrides, deep_merge, save_config)

H, W, BINS, KPTS = 48, 64, 4, 32


def small_config(matcher="MNN", freeze_matcher=True):
    # stage-2 (LightGlue training) freezes both extractors like the real
    # configs; stage-1 trains the event extractor
    freeze_event = (matcher == "LightGlue")
    k = KeypointExtractorConfig(detection_top_k=KPTS)
    return EIMConfig(
        event_extractor=ExtractorSpec(type="vgg", in_channels=BINS,
                                      feat_channels=16, descriptor_dim=24,
                                      lat_channels=24, freeze=freeze_event,
                                      keypoints=k),
        image_extractor=ExtractorSpec(type="superpointv1", freeze=True,
                                      descriptor_dim=24, keypoints=k),
        matcher=MatcherConfig(
            type=matcher, freeze=freeze_matcher, max_points_num=KPTS,
            lightglue=LightGlueConfig(input_dim=24, descriptor_dim=24,
                                      n_layers=2, num_heads=4)),
    )


def synth_batch(rng, B=2, n_events=500, max_events=1024, with_depth=True):
    def view():
        x = rng.uniform(0, W - 1, (B, max_events)).astype(np.float32)
        y = rng.uniform(0, H - 1, (B, max_events)).astype(np.float32)
        # relative-f32 stamps, like data/mvsec.py view() emits
        t = np.sort(rng.uniform(0, 0.4, (B, max_events)),
                    axis=1).astype(np.float32)
        p = rng.integers(0, 2, (B, max_events)).astype(np.float32)
        valid = np.zeros((B, max_events), bool)
        valid[:, :n_events] = True
        # production padding is zeros (representations.pad_events); random
        # tail values would still be masked out but change the bf16
        # splat's chunk composition, breaking bit-equality comparisons
        for arr in (x, y, t, p):
            arr[:, n_events:] = 0.0
        d = {
            "events_x": x, "events_y": y, "events_t": t, "events_p": p,
            "events_valid": valid,
            "image": rng.uniform(0, 255, (B, H, W, 1)).astype(np.float32),
            "K": np.tile(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2],
                                   [0, 0, 1]], np.float32), (B, 1, 1)),
        }
        if with_depth:
            d["depth"] = np.full((B, H, W), 2.0, np.float32)
            d["depth_mask"] = np.ones((B, H, W), bool)
        return d

    T01 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T01[:, 0, 3] = 0.05
    T10 = np.linalg.inv(T01)
    return (view(), view(), T01, T10.astype(np.float32))


class TestSchedules:
    def test_cosine(self):
        s = build_schedule({"type": "CosineAnnealingLR",
                            "CosineAnnealingLR": {"T_max": 10,
                                                  "eta_min": 0.0}},
                           base_lr=1.0, steps_per_epoch=5)
        assert s(0) == pytest.approx(1.0)
        assert s(5 * 5) == pytest.approx(0.5, abs=1e-6)  # epoch 5 of 10
        assert s(10 * 5) == pytest.approx(0.0, abs=1e-6)

    def test_step_lr(self):
        s = build_schedule({"type": "StepLR",
                            "StepLR": {"step_size": 2, "gamma": 0.1}},
                           base_lr=1.0, steps_per_epoch=1)
        assert s(0) == 1.0 and s(1) == 1.0
        assert s(2) == pytest.approx(0.1)
        assert s(4) == pytest.approx(0.01)

    def test_multistep(self):
        s = build_schedule({"type": "MultiStepLR",
                            "MultiStepLR": {"milestones": [2, 4],
                                            "gamma": 0.5}},
                           base_lr=1.0, steps_per_epoch=1)
        assert s(1) == 1.0 and s(2) == 0.5 and s(4) == 0.25

    def test_warm_restarts(self):
        s = build_schedule({"type": "CosineAnnealingWarmRestarts",
                            "CosineAnnealingWarmRestarts":
                                {"T_0": 4, "T_mult": 1, "eta_min": 0.0}},
                           base_lr=1.0, steps_per_epoch=1)
        assert s(0) == pytest.approx(1.0)
        assert s(4) == pytest.approx(1.0)  # restart

    def test_optimizers_build(self):
        for otype in ("Adam", "AdamW", "SGD"):
            tx = build_optimizer({"type": otype, otype: {}},
                                 lambda s: 1e-3)
            params = {"w": jnp.ones(3)}
            st = tx.init(params)
            g = {"w": jnp.ones(3)}
            up, _ = tx.update(g, st, params)
            assert jnp.isfinite(up["w"]).all()


class TestConfigSystem:
    def test_compose_and_interpolate(self, tmp_path):
        (tmp_path / "dataset").mkdir()
        (tmp_path / "train").mkdir()
        (tmp_path / "dataset" / "d1.yaml").write_text(
            "name: d1\nbatch_size: 8\n")
        (tmp_path / "train" / "t1.yaml").write_text(
            "optimizer:\n  lr: 0.001\n  Adam:\n    lr: ${train.optimizer.lr}\n")
        root = tmp_path / "exp.yaml"
        root.write_text(
            "defaults:\n  - dataset: d1\n  - train: t1\nexperiment: test\n")
        cfg = load_config(str(root))
        assert cfg.dataset.name == "d1"
        assert cfg.train.optimizer.Adam.lr == 0.001  # interpolated, typed
        assert cfg.experiment == "test"

    def test_overrides(self, tmp_path):
        root = tmp_path / "c.yaml"
        root.write_text("a:\n  b: 1\nc: hello\n")
        cfg = load_config(str(root), overrides=["a.b=5", "c=world",
                                                "new.key=2.5"])
        assert cfg.a.b == 5 and cfg.c == "world" and cfg.new.key == 2.5

    def test_override_scientific_notation_is_float(self, tmp_path):
        """YAML 1.1 rejects '5e-4' as a float (needs '5.0e-4'); the CLI
        coercion must fix it or lr=5e-4 silently becomes a string and
        crashes the LR schedule (hit live, round 3). Strings that merely
        LOOK numeric-ish must survive."""
        root = tmp_path / "c.yaml"
        root.write_text("lr: 0.1\nname: x\n")
        cfg = load_config(str(root), overrides=["lr=5e-4", "name=v1e2x"])
        assert cfg.lr == 5e-4 and isinstance(cfg.lr, float)
        assert cfg.name == "v1e2x"

    def test_group_override(self, tmp_path):
        """Hydra-class CLI group re-selection: `group=name` replaces the
        composed group file when <dir>/<group>/<name>.yaml exists; a
        plain `key=value` whose key is not a group stays a dotlist edit."""
        (tmp_path / "model").mkdir()
        (tmp_path / "model" / "m1.yaml").write_text("name: m1\nwidth: 8\n")
        (tmp_path / "model" / "m2.yaml").write_text("name: m2\ndepth: 3\n")
        root = tmp_path / "exp.yaml"
        root.write_text("defaults:\n  - model: m1\nexperiment: e\n")
        cfg = load_config(str(root), overrides=["model=m2"])
        assert cfg.model.name == "m2" and cfg.model.depth == 3
        assert "width" not in cfg.model.to_dict()  # replaced, not merged
        # non-group '=' override still works
        cfg = load_config(str(root), overrides=["model=m2",
                                                "model.depth=9"])
        assert cfg.model.depth == 9
        # value matching no group file: plain override (replaces node)
        cfg = load_config(str(root), overrides=["experiment=zzz"])
        assert cfg.experiment == "zzz"

    def test_save_roundtrip(self, tmp_path):
        cfg = Config({"a": {"b": [1, 2]}, "c": "x"})
        save_config(cfg, str(tmp_path / "out.yaml"))
        cfg2 = load_config(str(tmp_path / "out.yaml"))
        assert cfg2.to_dict() == cfg.to_dict()


class TestStage1:
    def _setup(self, rng):
        model = EIM(config=small_config("MNN"))
        batch = synth_batch(rng)
        ev_rep, ev_mask = batch_representation(
            {k: jnp.asarray(v) for k, v in batch[0].items()
             if k.startswith("events")}, "VoxelGrid", BINS, H, W)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            ev_rep, jnp.asarray(batch[0]["image"]), ev_mask)
        losses = build_losses({
            "keypoints_loss": {"type": "ScoreLoss",
                               "ScoreLoss": {"weight": 1.0, "mode": "mse",
                                             "use_mask": True}},
            "descriptors_loss": {"type": "DescriptorsLoss",
                                 "DescriptorsLoss": {"mode": "mae",
                                                     "weight": 1.0,
                                                     "use_mask": True}},
            # feature loss needs matching backbone widths (128 in the real
            # configs); the small test model uses 16 vs SuperPoint's 128
        })
        tx = build_optimizer({"type": "AdamW", "AdamW": {}}, lambda s: 3e-4)
        state = create_train_state(model, variables, tx)
        freeze = freeze_mask(variables["params"],
                             frozen_roots_from_config(model.config))
        step = make_stage1_train_step(model, losses, freeze, "VoxelGrid",
                                      BINS, H, W)
        return model, state, step, batch

    def test_loss_decreases_and_teacher_frozen(self, rng):
        model, state, step, batch = self._setup(rng)
        im_params0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(),
            state.params["image_extractor"])
        losses = []
        for i in range(8):
            state, info = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(info["loss"]))
        assert losses[-1] < losses[0], losses
        # frozen teacher unchanged bit-for-bit
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            state.params["image_extractor"], im_params0)
        assert int(state.step) == 8

    def test_bucket_transition_resume_bit_exact(self, rng, tmp_path):
        """Chunk boundary AT a wire-bucket transition: checkpoint after
        the small-bucket batches, restore into a FRESH state, and continue
        on batches whose compact columns land in a larger bucket — a new
        jit signature compiled by the resumed process. This is the
        production recompile+resume event at a tools/train_chunked.py
        chunk boundary; the trajectory must equal the uninterrupted one
        bit-exactly (CPU f32)."""
        from ei_nexus_tpu.train.steps import (bucket_event_view,
                                              compact_event_view)
        model, state0, step, _ = self._setup(rng)
        buckets = (128, 512)

        def wire(batch):
            enc = compact_event_view(batch[0], keep=("image",),
                                     bucket=False)
            return (bucket_event_view(enc, buckets=buckets),)

        data_rng = np.random.default_rng(7)
        batches = [wire(synth_batch(data_rng, n_events=n,
                                    with_depth=False))
                   for n in (100, 100, 400, 400)]
        assert batches[0][0]["events_xq"].shape[-1] == 128
        assert batches[2][0]["events_xq"].shape[-1] == 512

        sa = state0
        for i, b in enumerate(batches):
            sa, _ = step(sa, b, jax.random.PRNGKey(i))

        sb = state0
        for i in (0, 1):
            sb, _ = step(sb, batches[i], jax.random.PRNGKey(i))
        path = save_checkpoint(str(tmp_path), sb, epoch=0)
        # fresh process stand-in: new model/state/step (separate jit
        # cache), template state re-initialized from a different data rng
        _, fresh, step2, _ = self._setup(np.random.default_rng(99))
        sc, _ = restore_checkpoint(path, fresh)
        for i in (2, 3):
            sc, _ = step2(sc, batches[i], jax.random.PRNGKey(i))

        assert int(sa.step) == int(sc.step) == 4
        la = jax.tree_util.tree_leaves_with_path(sa.params)
        lc = dict(jax.tree_util.tree_leaves_with_path(sc.params))
        for p, leaf in la:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(lc[p]),
                                          err_msg=str(p))

    def test_data_parallel_mesh(self, rng):
        """Same step under an 8-device data mesh: runs and matches the
        single-device loss."""
        model, state, step, batch = self._setup(rng)
        mesh = make_mesh(data=8)
        batch8 = synth_batch(rng, B=8)
        with jax.set_mesh(mesh):
            sharded = shard_batch(batch8, mesh)
            state_r = replicate(state, mesh)
            state2, info = step(state_r, sharded, jax.random.PRNGKey(0))
            assert np.isfinite(float(info["loss"]))
            state3, _ = step(state2, sharded, jax.random.PRNGKey(1))
        assert int(state3.step) == 2


class TestStage2:
    def test_homography_stage2_step(self, rng):
        """Homography-supervised stage-2 for depthless datasets (EC):
        the step warps the frame on device with a sampled perspective
        transform and supervises from the known H — the reference's
        stage-2 cannot run on EC at all (it reads data0['depth'],
        ref train_matcher.py:185). Loss must be finite and decrease,
        frozen extractors must not move, and the wire ships only
        data0's events + frame."""
        from ei_nexus_tpu.train.steps import (
            make_stage2_homography_train_step,
            compact_stage2_homography_batch)
        model = EIM(config=small_config("LightGlue", freeze_matcher=False))
        batch = synth_batch(rng, with_depth=False)
        wire = compact_stage2_homography_batch(batch)
        assert set(wire[0].keys()) == {
            "events_xq", "events_yq", "events_tr", "events_pq",
            "events_n", "image"}
        ev_rep, ev_mask = batch_representation(
            {k: jnp.asarray(v) for k, v in batch[0].items()
             if k.startswith("events")}, "VoxelGrid", BINS, H, W)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "pad": jax.random.PRNGKey(1)},
            ev_rep, jnp.asarray(batch[0]["image"]), ev_mask, None, True)
        tx = build_optimizer({"type": "AdamW", "AdamW": {}}, lambda s: 1e-4)
        state = create_train_state(model, variables, tx)
        freeze = freeze_mask(variables["params"],
                             frozen_roots_from_config(model.config))
        step = make_stage2_homography_train_step(
            model, freeze, "VoxelGrid", BINS, H, W)
        ev0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(),
            state.params["event_extractor"])
        losses = []
        for i in range(6):
            state, info = step(state, wire, jax.random.PRNGKey(10 + i))
            losses.append(float(info["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            state.params["event_extractor"], ev0)

    def test_lightglue_training_step(self, rng):
        model = EIM(config=small_config("LightGlue", freeze_matcher=False))
        batch = synth_batch(rng)
        ev_rep, ev_mask = batch_representation(
            {k: jnp.asarray(v) for k, v in batch[0].items()
             if k.startswith("events")}, "VoxelGrid", BINS, H, W)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "pad": jax.random.PRNGKey(1)},
            ev_rep, jnp.asarray(batch[0]["image"]), ev_mask, None, True)
        tx = build_optimizer({"type": "AdamW", "AdamW": {}}, lambda s: 1e-4)
        state = create_train_state(model, variables, tx)
        cfg = model.config
        freeze = freeze_mask(variables["params"],
                             frozen_roots_from_config(cfg))
        step = make_stage2_train_step(model, freeze, "VoxelGrid", BINS, H, W)
        ev0 = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(),
            state.params["event_extractor"])
        losses = []
        for i in range(4):
            state, info = step(state, batch, jax.random.PRNGKey(10 + i))
            losses.append(float(info["loss"]))
        assert np.isfinite(losses).all()
        # frozen extractors unchanged; matcher moved
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            state.params["event_extractor"], ev0)
        moved = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
            jax.tree_util.tree_map(
                lambda a, b: a - b, state.params["matcher"],
                variables["params"]["matcher"]), 0.0)
        assert moved > 0

    def test_compact_wire_equality(self, rng):
        """compact_event_view's uint16/uint8/count wire format must decode
        to the exact same representation (integer sensor coords round-trip
        losslessly through the 1/64-px fixed point) and the stage-2 step
        must produce the same loss/grads from the compact batch."""
        from ei_nexus_tpu.train.steps import (compact_event_view,
                                              compact_stage2_batch)
        model = EIM(config=small_config("LightGlue", freeze_matcher=False))
        batch = synth_batch(rng)
        for view in (batch[0], batch[1]):  # integer coords like the sensor
            view["events_x"] = np.floor(view["events_x"])
            view["events_y"] = np.floor(view["events_y"])

        ev = {k: v for k, v in batch[0].items() if k.startswith("events")}
        rep_a, mask_a = batch_representation(ev, "VoxelGrid", BINS, H, W)
        rep_b, mask_b = batch_representation(
            compact_event_view(batch[0]), "VoxelGrid", BINS, H, W)
        np.testing.assert_allclose(np.asarray(rep_a), np.asarray(rep_b),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mask_a),
                                      np.asarray(mask_b))

        ev_rep, ev_mask = rep_a, mask_a
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "pad": jax.random.PRNGKey(1)},
            ev_rep, jnp.asarray(batch[0]["image"]), ev_mask, None, True)
        tx = build_optimizer({"type": "AdamW", "AdamW": {}}, lambda s: 1e-4)
        freeze = freeze_mask(variables["params"],
                             frozen_roots_from_config(model.config))
        step = make_stage2_train_step(model, freeze, "VoxelGrid", BINS,
                                      H, W)
        s_full = create_train_state(model, variables, tx)
        s_comp = create_train_state(model, variables, tx)
        s_full, info_full = step(s_full, batch, jax.random.PRNGKey(3))
        s_comp, info_comp = step(s_comp, compact_stage2_batch(batch),
                                 jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(info_comp["loss"]),
                                   float(info_full["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(info_comp["grad_norm"]),
                                   float(info_full["grad_norm"]),
                                   rtol=1e-5)

    def test_bucketed_wire_equality(self, rng):
        """Bucket truncation of the tail-padded compact columns is
        LOSSLESS: the decoded device representation is bit-identical to
        the full-column wire at any valid count below the bucket."""
        from ei_nexus_tpu.train.steps import (EVENT_BUCKETS,
                                              bucket_event_view,
                                              compact_event_view)
        batch = synth_batch(rng)
        view = batch[0]
        full = compact_event_view(view, bucket=False)
        buck = bucket_event_view(full, buckets=(128, 256, 512))
        n_max = int(full["events_n"].max())
        assert buck["events_xq"].shape[-1] >= n_max
        assert buck["events_xq"].shape[-1] <= full["events_xq"].shape[-1]
        rep_a, mask_a = batch_representation(full, "VoxelGrid", BINS, H, W)
        rep_b, mask_b = batch_representation(buck, "VoxelGrid", BINS, H, W)
        np.testing.assert_array_equal(np.asarray(rep_a), np.asarray(rep_b))
        np.testing.assert_array_equal(np.asarray(mask_a),
                                      np.asarray(mask_b))
        # a count above every bucket falls back to the full column length
        same = bucket_event_view(full, buckets=(8,))
        assert same["events_xq"].shape == full["events_xq"].shape
        assert EVENT_BUCKETS == tuple(sorted(EVENT_BUCKETS))

    def test_eval_step(self, rng):
        model = EIM(config=small_config("MNN"))
        batch = synth_batch(rng)
        ev_rep, ev_mask = batch_representation(
            {k: jnp.asarray(v) for k, v in batch[0].items()
             if k.startswith("events")}, "VoxelGrid", BINS, H, W)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               ev_rep, jnp.asarray(batch[0]["image"]),
                               ev_mask)
        tx = optax.sgd(1e-3)
        state = create_train_state(model, variables, tx)
        step = make_eval_step(model, "VoxelGrid", BINS, H, W)
        ev, im, matches = step(state, batch)
        assert matches["matches0"].shape == (2, KPTS)


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        model = EIM(config=small_config("MNN"))
        batch = synth_batch(rng)
        ev_rep, ev_mask = batch_representation(
            {k: jnp.asarray(v) for k, v in batch[0].items()
             if k.startswith("events")}, "VoxelGrid", BINS, H, W)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               ev_rep, jnp.asarray(batch[0]["image"]),
                               ev_mask)
        tx = build_optimizer({"type": "AdamW", "AdamW": {}}, lambda s: 1e-3)
        state = create_train_state(model, variables, tx)
        path = save_checkpoint(str(tmp_path), state, epoch=7)
        # perturb then restore
        state_p = state.replace(params=jax.tree_util.tree_map(
            lambda x: x + 1.0, state.params))
        restored, epoch = restore_checkpoint(path, state_p)
        assert epoch == 7
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            restored.params, state.params)

    def test_stage1_surgery(self, rng, tmp_path):
        model = EIM(config=small_config("MNN"))
        batch = synth_batch(rng)
        ev_rep, ev_mask = batch_representation(
            {k: jnp.asarray(v) for k, v in batch[0].items()
             if k.startswith("events")}, "VoxelGrid", BINS, H, W)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               ev_rep, jnp.asarray(batch[0]["image"]),
                               ev_mask)
        tx = optax.sgd(1e-3)
        state = create_train_state(model, variables, tx)
        # pretend stage-1 training moved the event extractor
        state = state.replace(params={
            **state.params,
            "event_extractor": jax.tree_util.tree_map(
                lambda x: x + 2.0, state.params["event_extractor"])})
        path = save_checkpoint(str(tmp_path), state, epoch=1)
        new_vars = load_stage1_event_extractor(path, variables)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            new_vars["params"]["event_extractor"],
            state.params["event_extractor"])
        # other subtrees untouched
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            new_vars["params"]["image_extractor"],
            variables["params"]["image_extractor"])
