#!/usr/bin/env python
"""Stage-1 training entry point: distill the event keypoint extractor
against a frozen image extractor on time-synchronized event/image pairs.

Capability parity with reference `train_extractor.py:66-382` (Hydra main,
DDP setup, epoch loop, per-step losses/metrics, periodic checkpointing and
validation), re-designed TPU-first: one jitted train step with on-device
voxelization, data-parallel over a `jax.sharding.Mesh`, host-sharded input
pipeline, orbax checkpoints.

Usage:
  python train_extractor.py --config configs/train_EIM_stage1_MVSEC_SP_MNN.yaml \
      [key=value overrides...]
"""

from __future__ import annotations

import argparse
import os
import sys
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
    p.add_argument("--config",
                   default="configs/train_EIM_stage1_MVSEC_SP_MNN.yaml")
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total steps (smoke testing)")
    p.add_argument("overrides", nargs="*", help="key=value config overrides")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ei_nexus_tpu.utils import load_config, logger_from_config
    from ei_nexus_tpu.utils.config import save_config
    from ei_nexus_tpu.models import EIM, build_model, eim_config_from_dict
    from ei_nexus_tpu.models.eim import EIMConfig
    from ei_nexus_tpu.losses import build_losses
    from ei_nexus_tpu.train import (
        build_optimizer, build_schedule, create_train_state, freeze_mask,
        save_checkpoint, restore_checkpoint, is_host_driven,
        PlateauController, set_learning_rate)
    from ei_nexus_tpu.train.steps import (
        make_stage1_train_step, batch_representation, compact_stage1_batch)
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
    logger = logger_from_config(cfg, cfg.get("experiment", "stage1"))
    save_config(cfg, os.path.join(logger.run_dir, "config.yaml"))
    logger.log_info(f"devices: {jax.devices()}")
    np.random.seed(cfg.get("seed", 3407))

    # -- data --------------------------------------------------------------
    ds_cfg = cfg.dataset.to_dict()
    H, W = ds_cfg["resolution"]
    bins = ds_cfg["channel"]
    rep = ds_cfg["representation_type"]
    fetch = fetch_mvsec_dataset if ds_cfg["name"] == "mvsec" \
        else fetch_ec_dataset
    train_ds = fetch(ds_cfg, "train")
    if getattr(train_ds, "augment", None) is not None:
        # pair augmentation crops every sample to crop_size: that IS the
        # training resolution (reference trains on 256x256 crops of the
        # 260x346 frames)
        ch, cw = train_ds.augment.crop_size
        H, W = min(ch, H), min(cw, W)  # aug clamps crop to the frame size
        logger.log_info(f"pair augmentation active: training at {H}x{W}")
    loader = DataLoader(
        train_ds, batch_size=ds_cfg["train"]["batch_size"],
        shuffle=ds_cfg["train"].get("shuffle", True),
        drop_last=True, seed=cfg.get("seed", 0),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        num_workers=ds_cfg["train"].get("num_workers", 4))
    logger.log_info(f"train dataset: {len(train_ds)} samples, "
                    f"{len(loader)} steps/epoch")

    # -- model -------------------------------------------------------------
    model_cfg = eim_config_from_dict(cfg.model.to_dict())
    model = build_model(cfg.model.to_dict().get("name", "EIM"), model_cfg)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    sample = train_ds[0]
    ev_rep, ev_mask = batch_representation(
        {k: np.asarray(v)[None] for k, v in sample[0].items()
         if k.startswith("events")}, rep, bins, H, W)
    variables = model.init({"params": rng}, ev_rep,
                           np.asarray(sample[0]["image"])[None], ev_mask)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    logger.log_info(f"model parameters: {n_params / 1e6:.2f}M")

    # optional SuperPoint/SiLK pretrained weights from local files
    sp_path = cfg.get("superpoint_weights")
    if sp_path and os.path.exists(sp_path):
        import torch
        from ei_nexus_tpu.models import load_superpoint_torch_weights
        sd = torch.load(sp_path, map_location="cpu")
        variables["params"]["image_extractor"] = \
            load_superpoint_torch_weights(sd)["params"]
        logger.log_info(f"loaded SuperPoint weights from {sp_path}")

    # -- optimizer ---------------------------------------------------------
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
        # exact mid-epoch resume: the optimizer step count positions the
        # stream inside the (deterministic, seed+epoch-keyed) epoch
        # permutation; a preempted checkpoint resumes at the exact batch
        # where SIGTERM landed, reproducing the uninterrupted trajectory
        steps_per_epoch = max(len(loader), 1)
        resume_skip = max(0, int(state.step) - start_epoch * steps_per_epoch)
        start_epoch += resume_skip // steps_per_epoch
        resume_skip %= steps_per_epoch
        logger.log_info(f"resumed from {args.resume} @ epoch {start_epoch}"
                        + (f" batch {resume_skip}" if resume_skip else ""))
        if plateau is not None:
            import json
            sidecar = os.path.join(args.resume, "plateau.json")
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    plateau.load_state_dict(json.load(f))

    losses = build_losses(tcfg["loss"])
    freeze = freeze_mask(state.params, frozen_roots_from_config(model_cfg))
    step_fn = make_stage1_train_step(model, losses, freeze, rep, bins, H, W)

    shutdown = GracefulShutdown()
    mesh = make_mesh()
    state = replicate(state, mesh)

    # -- epoch loop --------------------------------------------------------
    global_step = int(state.step)
    epochs = tcfg["epochs"]
    # epoch recorded in the "final" checkpoint: the in-progress epoch when
    # stopping early (SIGTERM / --max-steps) so `--resume .../final`
    # continues the exact trajectory — the axon tunnel client leaks ~one
    # host batch per device_put'd step, so long runs MUST be chunked into
    # multiple processes (see tools/train_chunked.sh).
    end_epoch = epochs
    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, epochs):
            loader.set_epoch(epoch,
                             resume_skip if epoch == start_epoch else 0)
            t_epoch = time.time()
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
                        prefix=f"[stage1 e{epoch}] ")
                if plateau is not None:
                    epoch_losses.append(float(vals["loss"]))

            pending = None
            put = lambda b: shard_batch(compact_stage1_batch(b), mesh)  # noqa: E731
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
            logger.log_info(
                f"epoch {epoch} done in {time.time() - t_epoch:.1f}s")
            if plateau is not None and epoch_losses \
                    and not shutdown.requested:
                # monitored metric = epoch-mean train loss (the reference
                # calls scheduler.step() argless, which torch's plateau
                # scheduler rejects — this path is strictly more usable).
                # Skipped on preemption: the epoch is partial, and resume
                # replays the remaining batches before the plateau step.
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
                logger.log_info(f"checkpoint saved: {path}")
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
        path = save_checkpoint(os.path.join(logger.run_dir, "checkpoints"),
                               state, end_epoch, name="final")
        logger.log_info(f"final checkpoint: {path}")
        logger.log_info(
            f"stopped at step {global_step}, epoch {end_epoch}/{epochs}")
    logger.close()
    return state


if __name__ == "__main__":
    main()
