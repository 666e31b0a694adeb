"""Jitted train/eval steps for the two training stages.

Stage 1 (reference train_extractor.py:213-321): distill the event extractor
against the frozen image extractor on time-synchronized pairs with
score/descriptor/feature losses, event-occupancy masked.

Stage 2 (reference train_matcher.py:155-220): train LightGlue on
time-separated pairs; GT matches generated per step from pose + depth.

TPU-first design:
 - the events->voxel-grid conversion and the event-occupancy mask are
   computed ON DEVICE inside the step (vmapped scatter kernels) from the
   pipeline's padded raw event arrays — the reference's CPU-side per-event
   loops are gone;
 - one `jax.jit` per stage; under a `Mesh` with the batch sharded over the
   `data` axis, XLA inserts the gradient all-reduce over ICI automatically
   (replacing DDP's NCCL allreduce);
 - frozen submodules receive zero gradient via a static mask
   (train/partition.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import numpy as np
import optax
import jax.numpy as jnp

from ..data import representations as reps
from ..geometry import Camera, Pose, gt_matches_from_pose_depth
from ..losses.matcher_loss import lightglue_loss, mnn_loss
from .partition import apply_freeze
from .state import TrainState


# uint16 fixed-point event coordinates: 1/64-px resolution (exact for the
# integer sensor coords; 0.016 px quantization for rectified fractional
# coords — far below the voxel grid's bilinear footprint). 64 is a power
# of two, so encode/decode round-trips exactly in f32.
EVENT_COORD_SCALE = 64.0


def compact_event_view(view: Mapping[str, np.ndarray],
                       keep: Tuple[str, ...] = (),
                       bucket: bool = True) -> Dict[str, np.ndarray]:
    """Shrink a collated view's host->device transfer ~4.7x.

    The tunnel/PCIe H2D of padded raw events dominates the real train
    loop (measured: stage-1 1.29 s/step against a 0.26 s device step;
    each sample ships 262144 x 21 B of f32/f64/bool event arrays). Encode
    x/y as uint16 fixed-point, t as f32 RELATIVE to the window's first
    event (absolute MVSEC stamps are epoch-scale — f32 would lose ~100 ns
    only after subtraction, and every consumer normalizes to the window
    anyway), p as uint8, and the validity mask as one int32 count per
    sample (events are tail-padded). decode inside the jitted step
    (`_decode_event_view`) restores the standard float arrays on device.

    `keep` lists non-event keys to carry through (e.g. "image", "depth",
    "K"); everything else is dropped from the transfer. `bucket` further
    truncates the tail-padded columns to the smallest EVENT_BUCKETS
    length >= the batch's max valid count (lossless; ~5x less wire on
    typical windows).
    """
    x = np.asarray(view["events_x"])
    y = np.asarray(view["events_y"])
    pol = np.asarray(view["events_p"])
    valid = np.asarray(view["events_valid"])
    t = np.asarray(view["events_t"])
    enc = None
    if x.ndim == 2:
        # fused C++/OpenMP single-pass encoder when available (the numpy
        # path below makes ~6 passes over the ~17 MB batch)
        from ..native import compact_encode
        enc = compact_encode(x.astype(np.float32, copy=False),
                             y.astype(np.float32, copy=False),
                             pol.astype(np.float32, copy=False),
                             valid, EVENT_COORD_SCALE)
    if enc is not None:
        xq, yq, pq, n = enc
    else:
        n = valid.sum(axis=-1).astype(np.int32)
        xq = np.round(x * EVENT_COORD_SCALE).astype(np.uint16)
        yq = np.round(y * EVENT_COORD_SCALE).astype(np.uint16)
        pq = pol.astype(np.uint8)
    if t.dtype == np.float64:
        # legacy absolute stamps: shift before narrowing (see the
        # relative-f32 note in data/mvsec.py view(), which now does this
        # at the source — f32 inputs pass through bit-identically)
        t0 = t[..., :1] * (n > 0)[..., None]
        t = ((t - t0) * valid).astype(np.float32)
    out = {
        "events_xq": xq,
        "events_yq": yq,
        "events_tr": np.asarray(t, np.float32),
        "events_pq": pq,
        "events_n": n,
    }
    if bucket:
        out = bucket_event_view(out)
    for k in keep:
        if k in view:
            out[k] = view[k]
    return out


# wire buckets for the padded event columns: real windows are far
# sparser than the max_events=262144 slot budget (mini-MVSEC median 27k,
# max 55k events/window — measured round 4), so shipping full columns
# wastes 5-9x H2D. Columns are tail-padded, so truncating to the
# smallest bucket >= the batch's max valid count is lossless; jit
# specializes the step once per bucket (the persistent compilation
# cache amortizes recompiles across chunks/runs).
EVENT_BUCKETS = (16384, 32768, 65536, 131072)


def bucket_event_view(enc: Dict[str, np.ndarray],
                      buckets: Tuple[int, ...] = EVENT_BUCKETS
                      ) -> Dict[str, np.ndarray]:
    """Truncate tail-padded compact event columns to a bucketed length."""
    L = enc["events_xq"].shape[-1]
    n = int(np.max(enc["events_n"])) if enc["events_n"].size else 0
    b = next((bk for bk in sorted(buckets) if bk >= n), L)
    if b >= L:
        return enc
    out = dict(enc)
    for k in ("events_xq", "events_yq", "events_tr", "events_pq"):
        out[k] = np.ascontiguousarray(enc[k][..., :b])
    return out


def _decode_event_view(view: Mapping[str, jax.Array]
                       ) -> Dict[str, jax.Array]:
    """In-jit inverse of compact_event_view (pass-through otherwise)."""
    if "events_xq" not in view:
        return dict(view)
    out = {k: v for k, v in view.items()
           if not k.startswith("events_")}
    L = view["events_xq"].shape[-1]
    out["events_x"] = view["events_xq"].astype(jnp.float32) \
        / EVENT_COORD_SCALE
    out["events_y"] = view["events_yq"].astype(jnp.float32) \
        / EVENT_COORD_SCALE
    out["events_t"] = view["events_tr"].astype(jnp.float32)
    out["events_p"] = view["events_pq"].astype(jnp.float32)
    out["events_valid"] = jnp.arange(L)[None, :] < view["events_n"][:, None]
    return out


def compact_stage1_batch(batch) -> Tuple[Dict[str, np.ndarray]]:
    """Host-side wire shrink for the stage-1 step: it reads only
    batch[0]'s events + image, so ship exactly that (the loader's data1 is
    the SAME view for the single-pair protocol — previously transferred
    twice)."""
    return (compact_event_view(batch[0], keep=("image",)),)


def compact_stage2_batch(batch):
    """Host-side wire shrink for the stage-2 step: data0 events (compact)
    + K + depth, data1 image + depth, and the relative poses — data1's
    event arrays, poses and masks never cross the wire."""
    data0, data1, T01, T10 = batch[:4]
    return (compact_event_view(data0, keep=("K", "depth")),
            {"image": data1["image"], "depth": data1["depth"]},
            T01, T10)


def compact_stage2_homography_batch(batch):
    """Wire shrink for the homography-supervised stage-2 step (EC): only
    data0's events + frame cross the wire — the warped second view and
    the GT homography are generated on device inside the step."""
    return (compact_event_view(batch[0], keep=("image",)),)


def batch_representation(batch_view: Mapping[str, jax.Array], kind: str,
                         bins: int, height: int, width: int,
                         fast: bool = True, with_drop_stat: bool = False):
    """Padded raw events -> (events_rep NHWC (B,H,W,bins), mask (B,H,W)).

    For VoxelGrid the default path is the MXU matmul-splat kernel
    (events_to_voxel_grid_splat — ~20x the XLA scatter's throughput on TPU,
    yielding the accumulation mask from the same matmuls); `fast=False`
    selects the exact scatter path. `with_drop_stat` appends the total
    splat weight dropped by the slot-window guard (always 0.0 on the
    scatter path), summed over the batch — trainers log it so bursty
    streams cannot silently corrupt the representation.

    Accepts either the standard float event arrays or the compact wire
    format of `compact_event_view` (decoded on device here).
    """
    batch_view = _decode_event_view(batch_view)
    if kind == "VoxelGrid" and fast:
        def one(x, y, t, p, m):
            grid, acc, drop = reps.events_to_voxel_grid_splat(
                x, y, t, p, bins=bins, height=height, width=width, mask=m,
                with_drop_stat=True)
            return grid, acc > 0, drop
    else:
        def one(x, y, t, p, m):
            rep = reps.build_representation(kind, x, y, t, p, bins=bins,
                                            height=height, width=width,
                                            mask=m)
            acc = reps.events_to_accumulation_image(x, y, height=height,
                                                    width=width, mask=m)
            return rep, acc > 0, jnp.float32(0.0)

    rep, mask, drop = jax.vmap(one)(
        batch_view["events_x"], batch_view["events_y"],
        batch_view["events_t"].astype(jnp.float32),
        batch_view["events_p"], batch_view["events_valid"])
    if with_drop_stat:
        return rep.transpose(0, 2, 3, 1), mask, jnp.sum(drop)
    return rep.transpose(0, 2, 3, 1), mask


def make_stage1_train_step(
    model, losses: Mapping[str, Callable], freeze: Any,
    rep_kind: str, bins: int, height: int, width: int,
) -> Callable:
    """Build the jitted stage-1 (extractor distillation) step."""

    @jax.jit
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        data0 = batch[0]
        events_rep, events_mask, drop_w = batch_representation(
            data0, rep_kind, bins, height, width, with_drop_stat=True)
        image = data0["image"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (ev_feats, im_feats, _), mutated = state.apply_fn(
                variables, events_rep, image, events_mask, None, True,
                mutable=["batch_stats"], rngs={"pad": rng})
            l_kp, i_kp = losses["keypoints_loss"](ev_feats, im_feats,
                                                  events_mask)
            l_de, i_de = losses["descriptors_loss"](ev_feats, im_feats,
                                                    events_mask)
            l_fe, i_fe = losses["feature_loss"](ev_feats, im_feats)
            total = l_kp + l_de + l_fe
            info = {"loss": total, **i_kp, **i_de, **i_fe}
            return total, (info, mutated.get("batch_stats",
                                             state.batch_stats))

        (loss, (info, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = apply_freeze(grads, freeze)
        # global grad norm: training observability + the multichip dryrun's
        # sharded-vs-single-device equality check (a wrong/missing psum
        # shows up as a norm mismatch long before the loss diverges)
        info["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        info["dropped_splat_weight"] = drop_w
        return new_state, info

    return step


def make_stage2_train_step(
    model, freeze: Any, rep_kind: str, bins: int, height: int, width: int,
    pos_th: float = 3.0, neg_th: float = 5.0, gamma: float = 1.0,
    nll_balancing: float = 0.5,
) -> Callable:
    """Build the jitted stage-2 (LightGlue) step: per-step GT match
    generation from pose + depth, deep-supervision NLL."""

    @jax.jit
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        data0, data1, T01, T10 = batch[:4]
        ev_rep, ev_mask, drop_w = batch_representation(
            data0, rep_kind, bins, height, width, with_drop_stat=True)
        image1 = data1["image"]
        K = data0["K"]
        cam = Camera.from_calibration_matrix(
            K, size=jnp.broadcast_to(
                jnp.asarray([width, height], jnp.float32), K.shape[:-2] + (2,)))
        T_0to1 = Pose.from_4x4mat(T01)
        T_1to0 = Pose.from_4x4mat(T10)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (ev_feats, im_feats, matches), mutated = state.apply_fn(
                variables, ev_rep, image1, ev_mask, None, True,
                mutable=["batch_stats"], rngs={"pad": rng})
            kp0 = matches["input_feats0"]["sparse_positions"][..., :2]
            kp1 = matches["input_feats1"]["sparse_positions"][..., :2]
            gt = gt_matches_from_pose_depth(
                kp0, kp1, cam, cam,
                data0["depth"], data1["depth"], T_0to1, T_1to0,
                pos_th=pos_th, neg_th=neg_th, ordering="yx")
            loss, info = lightglue_loss(
                matches, gt, gamma=gamma, nll_balancing=nll_balancing,
                training=True)
            n_gt = jnp.mean(jnp.sum(gt["matches0"] > -1, axis=-1)
                            .astype(jnp.float32))
            info = {"loss": loss, "gt_matches": n_gt, **info}
            return loss, (info, mutated.get("batch_stats",
                                            state.batch_stats))

        (loss, (info, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = apply_freeze(grads, freeze)
        # global grad norm: training observability + the multichip dryrun's
        # sharded-vs-single-device equality check (a wrong/missing psum
        # shows up as a norm mismatch long before the loss diverges)
        info["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        info["dropped_splat_weight"] = drop_w
        return new_state, info

    return step


def make_stage2_homography_train_step(
    model, freeze: Any, rep_kind: str, bins: int, height: int, width: int,
    pos_th: float = 3.0, neg_th: float = 5.0, gamma: float = 1.0,
    nll_balancing: float = 0.5, max_corner_jitter: float = 0.125,
) -> Callable:
    """Stage-2 (LightGlue) step with HOMOGRAPHY supervision for datasets
    without depth (EC: ref datasets/EC.py carries no depth frames, so the
    reference's stage-2 trainer — which reads data0['depth'],
    train_matcher.py:181-190 — cannot run on EC at all; this step is the
    framework's EC-capable extension using the reference's own dormant
    homography GT path, ref core/geometry/gt_generation.py:173).

    Per step, each sample's grayscale frame is warped by a random
    perspective transform sampled on device (corner jitter up to
    `max_corner_jitter` of the frame size), the events stay unwarped at
    t0, and GT matches come from the known H via
    `gt_matches_from_homography`. Classic homography self-supervision:
    the matcher learns event->image matching under viewpoint change
    without depth/pose labels."""
    from ..geometry import gt_matches_from_homography
    from ..ops.homographic import (extract_crops_batched,
                                   perspective_transform_from_points)

    @jax.jit
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        data0 = batch[0]
        ev_rep, ev_mask, drop_w = batch_representation(
            data0, rep_kind, bins, height, width, with_drop_stat=True)
        image0 = data0["image"]
        B = image0.shape[0]
        rng_h, rng_pad = jax.random.split(rng)
        corners = jnp.asarray([[0.0, 0.0], [width, 0.0],
                               [width, height], [0.0, height]],
                              jnp.float32)
        jitter = jax.random.uniform(
            rng_h, (B, 4, 2), minval=-1.0, maxval=1.0) * \
            jnp.asarray([width, height], jnp.float32) * max_corner_jitter
        src = corners[None] + jitter                  # quad in image0
        dst = jnp.broadcast_to(corners, (B, 4, 2))
        Hmat = perspective_transform_from_points(src, dst)  # H: im0 -> im1
        image1 = extract_crops_batched(image0, Hmat, (height, width))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (ev_feats, im_feats, matches), mutated = state.apply_fn(
                variables, ev_rep, image1, ev_mask, None, True,
                mutable=["batch_stats"], rngs={"pad": rng_pad})
            # sparse positions are (y+0.5, x+0.5) — homography GT wants xy
            kp0 = matches["input_feats0"]["sparse_positions"][..., :2]
            kp1 = matches["input_feats1"]["sparse_positions"][..., :2]
            gt = gt_matches_from_homography(
                kp0[..., ::-1], kp1[..., ::-1], Hmat,
                pos_th=pos_th, neg_th=neg_th,
                mask0=matches["input_feats0"]["sparse_valid"],
                mask1=matches["input_feats1"]["sparse_valid"])
            loss, info = lightglue_loss(
                matches, gt, gamma=gamma, nll_balancing=nll_balancing,
                training=True)
            n_gt = jnp.mean(jnp.sum(gt["matches0"] > -1, axis=-1)
                            .astype(jnp.float32))
            info = {"loss": loss, "gt_matches": n_gt, **info}
            return loss, (info, mutated.get("batch_stats",
                                            state.batch_stats))

        (loss, (info, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = apply_freeze(grads, freeze)
        info["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        info["dropped_splat_weight"] = drop_w
        return new_state, info

    return step


def make_eval_step(model, rep_kind: str, bins: int, height: int, width: int
                   ) -> Callable:
    """Jitted inference step: batch -> (event feats, image feats, matches)
    with masks (no random slot filling)."""

    @jax.jit
    def step(state: TrainState, batch) -> Tuple[Dict, Dict, Optional[Dict]]:
        data0, data1 = batch[0], batch[1]
        ev_rep, ev_mask = batch_representation(data0, rep_kind, bins, height,
                                               width)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return state.apply_fn(variables, ev_rep, data1["image"], ev_mask,
                              None, False)

    return step
