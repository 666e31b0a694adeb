#!/usr/bin/env python
"""Stage-2 training entry point: train LightGlue on time-separated
event/image pairs with per-step GT matches from pose + depth.

Capability parity with reference `train_matcher.py:58-271`, TPU-first: the
GT-match generation (gt_matches_from_pose_depth) runs inside the jitted
step; everything else mirrors train_extractor.py.

Usage:
  python train_matcher.py --config configs/train_EIM_stage2.yaml \
      [--stage1-ckpt runs/.../checkpoints/final] [key=value ...]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np


class GracefulShutdown:
    """SIGTERM/SIGINT -> finish the current step, checkpoint, exit.

    The reference has no preemption handling (SURVEY.md §5); crash recovery
    there is a manual restart. Here a termination request flips a flag the
    epoch loop checks each step, so preempted jobs save a resumable
    checkpoint."""

    def __init__(self):
        import signal
        self.requested = False

        def handler(signum, frame):
            self.requested = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # non-main thread




def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/train_EIM_stage2.yaml")
    p.add_argument("--stage1-ckpt", default=None,
                   help="stage-1 checkpoint for the event extractor")
    p.add_argument("--resume", default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("overrides", nargs="*")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ei_nexus_tpu.utils import load_config, logger_from_config
    from ei_nexus_tpu.utils.config import save_config
    from ei_nexus_tpu.models import EIM, build_model, eim_config_from_dict
    from ei_nexus_tpu.train import (
        build_optimizer, build_schedule, create_train_state, freeze_mask,
        save_checkpoint, restore_checkpoint, load_stage1_event_extractor,
        is_host_driven, PlateauController, set_learning_rate)
    from ei_nexus_tpu.train.steps import (
        make_stage2_train_step, make_stage2_homography_train_step,
        batch_representation, compact_stage2_batch,
        compact_stage2_homography_batch)
    from ei_nexus_tpu.train.partition import frozen_roots_from_config
    from ei_nexus_tpu.parallel import make_mesh, shard_batch, replicate
    from ei_nexus_tpu.data import DataLoader
    from ei_nexus_tpu.data.mvsec import fetch_mvsec_dataset
    from ei_nexus_tpu.data.ec import fetch_ec_dataset

    cfg = load_config(args.config, args.overrides)
    from ei_nexus_tpu.utils.platform import apply_platform
    apply_platform(cfg.get("device"))
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    logger = logger_from_config(cfg, cfg.get("experiment", "stage2"))
    save_config(cfg, os.path.join(logger.run_dir, "config.yaml"))
    np.random.seed(cfg.get("seed", 3407))

    ds_cfg = cfg.dataset.to_dict()
    H, W = ds_cfg["resolution"]
    bins = ds_cfg["channel"]
    rep = ds_cfg["representation_type"]
    fetch = fetch_mvsec_dataset if ds_cfg["name"] == "mvsec" \
        else fetch_ec_dataset
    train_ds = fetch(ds_cfg, "train")
    loader = DataLoader(
        train_ds, batch_size=ds_cfg["train"]["batch_size"],
        shuffle=ds_cfg["train"].get("shuffle", True), drop_last=True,
        seed=cfg.get("seed", 0), process_index=jax.process_index(),
        process_count=jax.process_count(),
        num_workers=ds_cfg["train"].get("num_workers", 4))
    logger.log_info(f"train dataset: {len(train_ds)} samples")

    model_cfg = eim_config_from_dict(cfg.model.to_dict())
    model = build_model(cfg.model.to_dict().get("name", "EIM"), model_cfg)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    sample = train_ds[0]
    ev_rep, ev_mask = batch_representation(
        {k: np.asarray(v)[None] for k, v in sample[0].items()
         if k.startswith("events")}, rep, bins, H, W)
    variables = model.init(
        {"params": rng, "pad": jax.random.PRNGKey(1)}, ev_rep,
        np.asarray(sample[1]["image"])[None], ev_mask, None, True)

    s1 = args.stage1_ckpt or cfg.get_path("model.pretrain_stage1.model_path")
    if s1 and os.path.exists(str(s1)):
        variables = load_stage1_event_extractor(str(s1), variables)
        logger.log_info(f"loaded stage-1 event extractor from {s1}")

    tcfg = cfg.train.to_dict()
    schedule = build_schedule(tcfg["scheduler"], tcfg["optimizer"]["lr"],
                              steps_per_epoch=max(len(loader), 1))
    host_lr = is_host_driven(tcfg["scheduler"])
    tx = build_optimizer(tcfg["optimizer"], schedule, inject_lr=host_lr)
    plateau = (PlateauController.from_config(tcfg["scheduler"],
                                             tcfg["optimizer"]["lr"])
               if host_lr else None)
    state = create_train_state(model, variables, tx)
    start_epoch = 0
    resume_skip = 0
    if args.resume:
        state, start_epoch = restore_checkpoint(args.resume, state)
        # exact mid-epoch resume (see train_extractor.py): position the
        # deterministic epoch stream at the preempted batch
        steps_per_epoch = max(len(loader), 1)
        resume_skip = max(0, int(state.step) - start_epoch * steps_per_epoch)
        start_epoch += resume_skip // steps_per_epoch
        resume_skip %= steps_per_epoch
        if plateau is not None:
            import json
            sidecar = os.path.join(args.resume, "plateau.json")
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    plateau.load_state_dict(json.load(f))

    freeze = freeze_mask(state.params, frozen_roots_from_config(model_cfg))
    gtc = tcfg.get("gt_matches", {})
    lgc = model_cfg.matcher.lightglue
    # EC carries no depth frames, so pose+depth GT is impossible there
    # (the reference's stage-2 trainer simply cannot run on EC —
    # ref train_matcher.py:181-190 reads data0['depth']); datasets
    # without depth train with on-device homography supervision instead
    has_depth = "depth" in sample[0]
    if has_depth:
        step_fn = make_stage2_train_step(
            model, freeze, rep, bins, H, W,
            pos_th=gtc.get("pos_th", 3.0), neg_th=gtc.get("neg_th", 5.0),
            gamma=lgc.gamma, nll_balancing=lgc.nll_balancing)
        compact_fn = compact_stage2_batch
    else:
        logger.log_info("no depth in dataset: homography-supervised "
                        "stage-2 (on-device warp + known-H GT)")
        step_fn = make_stage2_homography_train_step(
            model, freeze, rep, bins, H, W,
            pos_th=gtc.get("pos_th", 3.0), neg_th=gtc.get("neg_th", 5.0),
            gamma=lgc.gamma, nll_balancing=lgc.nll_balancing)
        compact_fn = compact_stage2_homography_batch

    shutdown = GracefulShutdown()
    mesh = make_mesh()
    state = replicate(state, mesh)
    global_step = int(state.step)
    epochs = tcfg["epochs"]
    # see train_extractor.py: early-stopped "final" records the in-progress
    # epoch so chunked runs (--max-steps + --resume) continue exactly
    end_epoch = epochs
    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, epochs):
            loader.set_epoch(epoch,
                             resume_skip if epoch == start_epoch else 0)
            t0 = time.time()
            epoch_losses = []

            def drain(pending):
                # fetch the PREVIOUS step's scalars only after the next
                # step is enqueued: the device pipelines compute while the
                # host eats the fetch round-trip (through the remote
                # tunnel that RTT otherwise serializes every step)
                pstep, pinfo = pending
                vals = jax.device_get(pinfo)
                if jax.process_index() == 0:
                    logger.maybe_status(
                        pstep, {k: float(v) for k, v in vals.items()},
                        prefix=f"[stage2 e{epoch}] ")
                if plateau is not None:
                    epoch_losses.append(float(vals["loss"]))

            pending = None
            put = lambda b: shard_batch(compact_fn(b), mesh)  # noqa: E731
            if os.environ.get("EI_NEXUS_TRAIN_DEVICE_PREFETCH") == "1":
                # encode+H2D one batch ahead on a thread (opt-in until
                # A/B'd through the tunnel; see data.device_prefetch)
                from ei_nexus_tpu.data import device_prefetch
                batches = device_prefetch(iter(loader), put)
            else:
                batches = (put(b) for b in loader)
            for batch in batches:
                state, info = step_fn(state, batch,
                                      jax.random.fold_in(rng, global_step))
                global_step += 1
                if pending is not None:
                    drain(pending)
                pending = (global_step, info)
                if shutdown.requested or (
                        args.max_steps and global_step >= args.max_steps):
                    break
            if pending is not None:
                drain(pending)
            logger.log_info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
            if plateau is not None and epoch_losses \
                    and not shutdown.requested:
                new_lr = plateau.step(float(np.mean(epoch_losses)))
                state = state.replace(opt_state=set_learning_rate(
                    state.opt_state, new_lr))
                logger.log_info(f"plateau lr -> {new_lr:.2e}")
            if jax.process_index() == 0 and not shutdown.requested and (
                    (epoch + 1) % tcfg.get("checkpoint_freq", 5) == 0):
                path = save_checkpoint(
                    os.path.join(logger.run_dir, "checkpoints"), state,
                    epoch + 1)
                if plateau is not None:
                    import json
                    with open(os.path.join(path, "plateau.json"), "w") as f:
                        json.dump(plateau.state_dict(), f)
            if shutdown.requested:
                if jax.process_index() == 0:
                    path = save_checkpoint(
                        os.path.join(logger.run_dir, "checkpoints"), state,
                        epoch, name="preempted")
                    logger.log_info(f"shutdown requested; saved {path}")
                end_epoch = epoch
                break
            if args.max_steps and global_step >= args.max_steps:
                end_epoch = epoch
                break
    if jax.process_index() == 0:
        save_checkpoint(os.path.join(logger.run_dir, "checkpoints"), state,
                        end_epoch, name="final")
        logger.log_info(
            f"stopped at step {global_step}, epoch {end_epoch}/{epochs}")
    logger.close()
    return state


if __name__ == "__main__":
    main()
