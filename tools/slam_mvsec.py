#!/usr/bin/env python
"""SLAM back-end on REAL mini-MVSEC front-end tracks (VERDICT r3 #9).

Pipeline: events -> voxel grid -> trained stage-1 event extractor ->
MNN matching between consecutive keyframes -> track chaining ->
triangulation -> Schur/CG bundle adjustment (Cauchy IRLS + cheirality
gate). Poses are initialized from a drift-perturbed trajectory (cumulative
noise on relative motions — the realistic odometry failure mode) and the
tool reports ATE (Umeyama-aligned camera-center RMSE) before/after BA plus
the reprojection-cost trajectory. `--check-sharded` additionally runs the
same problem observation-sharded over an 8-device CPU mesh and compares.

The reference has no SLAM back-end at all (pose is only estimated
per-pair, SURVEY.md §2.1); this is the BASELINE.json north-star chain on
real data end to end.

Usage:
  python tools/slam_mvsec.py --ckpt runs/<stage1>/checkpoints/final \
      [--device cpu] [--frames 40] [--iters 12] [--check-sharded]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def umeyama_ate(est_centers: np.ndarray, gt_centers: np.ndarray) -> float:
    """Camera-center RMSE after similarity (sim3) alignment — the gauge
    freedom of monocular BA (first pose fixed, scale free)."""
    mu_e = est_centers.mean(0)
    mu_g = gt_centers.mean(0)
    E = est_centers - mu_e
    G = gt_centers - mu_g
    U, S, Vt = np.linalg.svd(E.T @ G)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    # S comes from the UN-normalized cross-covariance E^T G, so the
    # denominator must be the un-normalized source energy too
    s = (S * np.diag(D)).sum() / max((E ** 2).sum(), 1e-12)
    aligned = s * (E @ R) + mu_g
    return float(np.sqrt(((aligned - gt_centers) ** 2).sum(-1).mean()))


def centers_from_poses6(poses6: np.ndarray) -> np.ndarray:
    """(M, 6) [so3 log | t] world->cam -> (M, 3) camera centers."""
    import jax.numpy as jnp
    from ei_nexus_tpu.geometry.se3 import so3exp_map
    R = np.asarray(so3exp_map(jnp.asarray(poses6[:, :3])))
    t = poses6[:, 3:]
    return -np.einsum("mij,mi->mj", R, t)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="stage-1 run checkpoint (orbax dir)")
    p.add_argument("--data", default="data/mini_mvsec")
    p.add_argument("--sequence", default="indoor_flying1")
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--topk", type=int, default=512)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--drift", type=float, default=0.01,
                   help="per-step relative-pose noise (rad / m units)")
    p.add_argument("--prior-weight", type=float, default=50.0,
                   help="odometry prior weight (px per rad|m; 0 = off)")
    p.add_argument("--gate-px", type=float, default=15.0,
                   help="front-end track gate at init (px; scale with --drift)")
    p.add_argument("--check-sharded", action="store_true")
    args = p.parse_args(argv)

    import os
    if args.check_sharded:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ei_nexus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ei_nexus_tpu.data.mvsec import MVSECArchive, MVSECSequence
    from ei_nexus_tpu.train.steps import batch_representation
    from ei_nexus_tpu.train.checkpoint import _restore_raw
    from ei_nexus_tpu.models import VGGExtractor, KeypointExtractorConfig
    from ei_nexus_tpu.models.mnn import mnn_match
    from ei_nexus_tpu.parallel.slam import (Keyframe, chain_tracks,
                                            build_ba_problem)
    from ei_nexus_tpu.parallel.ba import ba_solve

    # ---- front-end: trained event extractor + MNN over consecutive kfs --
    seq = MVSECSequence(MVSECArchive(args.data), args.sequence)
    n_kf = min(args.frames, len(seq) // args.stride)
    frames = [seq.view(i * args.stride, 0.4, 1 << 18) for i in range(n_kf)]

    ckpt = _restore_raw(args.ckpt)
    ev_params = {"params": ckpt["params"]["event_extractor"]}
    if "event_extractor" in ckpt.get("batch_stats", {}):
        ev_params["batch_stats"] = ckpt["batch_stats"]["event_extractor"]
    kcfg = KeypointExtractorConfig(detection_top_k=args.topk)
    # flagship stage-1 shapes (configs/model/EIM_stage1.yaml)
    model = VGGExtractor(config=kcfg, feat_channels=128,
                         descriptor_dim=256, lat_channels=256)

    @jax.jit
    def extract(ev_batch):
        rep, mask = batch_representation(ev_batch, "VoxelGrid", 16,
                                         260, 346)
        return model.apply(ev_params, rep, mask)

    feats = []
    t0 = time.time()
    for fr in frames:
        ev = {k: np.asarray(v)[None] for k, v in fr.items()
              if k.startswith("events")}
        out = extract(ev)
        feats.append({k: np.asarray(out[k]) for k in
                      ("sparse_positions", "sparse_descriptors",
                       "sparse_valid")})
    t_extract = time.time() - t0

    matches01 = []
    n_match = []
    for a, b in zip(feats[:-1], feats[1:]):
        m = mnn_match({k: jnp.asarray(v) for k, v in a.items()},
                      {k: jnp.asarray(v) for k, v in b.items()},
                      ratio_thresh=0.95)
        m0 = np.asarray(m["matches0"][0])
        matches01.append(m0)
        n_match.append(int((m0 > -1).sum()))

    # ---- GT poses + drift-perturbed initialization ---------------------
    # "pose" is world->camera: the oracle-verified T_0to1 semantics
    # (T_0to1 = pose1 @ inv(pose0) maps cam0 points to cam1,
    # tests/test_reference_parity GT-match parity) pin the convention.
    rng = np.random.default_rng(7)
    P_wc = np.stack([fr["pose"] for fr in frames]).astype(np.float64)

    def make_kfs(P):
        return [Keyframe(keypoints=feats[i]["sparse_positions"][0],
                         valid=feats[i]["sparse_valid"][0],
                         pose=P[i].astype(np.float32),
                         K=frames[i]["K"]) for i in range(n_kf)]

    tracks = chain_tracks(matches01, args.topk)

    # drift: accumulate noisy relative motions from the first pose
    from scipy.spatial.transform import Rotation
    P_drift = [P_wc[0]]
    for i in range(1, n_kf):
        rel = P_wc[i] @ np.linalg.inv(P_wc[i - 1])
        noise = np.eye(4)
        noise[:3, :3] = Rotation.from_rotvec(
            rng.normal(0, args.drift, 3)).as_matrix()
        noise[:3, 3] = rng.normal(0, args.drift, 3)
        P_drift.append(noise @ rel @ P_drift[-1])
    P_drift = np.stack(P_drift)

    prob = build_ba_problem(make_kfs(P_drift), tracks, min_track_len=3)

    # front-end outlier gating (standard SLAM practice): a wrong MNN match
    # triangulates to garbage (often behind a camera) and even a robust
    # loss spends influence on it — invalidate every observation of any
    # track that, at the INIT poses' own triangulation, has an
    # observation behind a camera or reprojecting > gate_px
    from ei_nexus_tpu.parallel.ba import residuals, _obs_z
    gate_px = args.gate_px
    r0 = np.linalg.norm(np.asarray(residuals(prob)), axis=-1)
    z0 = np.asarray(_obs_z(prob))
    obs_point = np.asarray(prob.obs_point)
    bad_obs = (z0 < 0.05) | (r0 > gate_px)
    bad_lm = np.zeros(len(np.asarray(prob.points)), bool)
    np.logical_or.at(bad_lm, obs_point[bad_obs], True)
    keep = ~bad_lm[obs_point]
    prob = prob._replace(obs_valid=jnp.asarray(
        np.asarray(prob.obs_valid) & keep))

    n_obs = int(keep.sum())
    n_lm = int((~bad_lm).sum())
    print(f"front-end: {n_kf} keyframes (stride {args.stride}), "
          f"{np.mean(n_match):.0f} MNN matches/pair, {len(tracks)} tracks "
          f"-> {n_lm} gated landmarks / {n_obs} obs "
          f"({int(bad_lm.sum())} outlier tracks dropped; "
          f"extract {t_extract:.1f}s)", flush=True)

    def reproj_stats(problem):
        # median + p90 of valid-observation reprojection error: a few
        # tracks can still collapse to the projection pole under the
        # redescending loss, so the mean is not a usable statistic
        r = np.linalg.norm(np.asarray(residuals(problem)), axis=-1)
        v = np.asarray(problem.obs_valid)
        return (float(np.median(r[v])), float((r[v] < 3.0).mean()))

    prior = (jnp.asarray(np.asarray(prob.poses))
             if args.prior_weight > 0 else None)
    t0 = time.time()
    refined, errs = ba_solve(prob, iters=args.iters, huber_delta=2.0,
                             robust="cauchy", z_min=0.05,
                             prior_poses=prior,
                             prior_weight=args.prior_weight)
    t_ba = time.time() - t0

    gt_centers = centers_from_poses6(np.asarray(
        build_ba_problem(make_kfs(P_wc), tracks, min_track_len=3).poses))
    ate_before = umeyama_ate(centers_from_poses6(np.asarray(prob.poses)),
                             gt_centers)
    ate_after = umeyama_ate(centers_from_poses6(np.asarray(refined.poses)),
                            gt_centers)

    result = {
        "sequence": args.sequence, "keyframes": n_kf,
        "landmarks": n_lm, "observations": n_obs,
        "mnn_matches_per_pair": round(float(np.mean(n_match)), 1),
        "robust_cost": [round(float(e), 4) for e in np.asarray(errs)],
        "reproj_median_px_and_frac3px_before": [round(x, 3) for x in
                                        reproj_stats(prob)],
        "reproj_median_px_and_frac3px_after": [round(x, 3) for x in
                                       reproj_stats(refined)],
        "ate_before_m": round(ate_before, 4),
        "ate_after_m": round(ate_after, 4),
        "ba_seconds": round(t_ba, 2),
        "device": args.device,
    }
    print(json.dumps(result), flush=True)

    if args.check_sharded:
        from ei_nexus_tpu.parallel import make_mesh, replicate
        from jax.sharding import NamedSharding, PartitionSpec as P
        pad = (-n_obs) % 8

        def padded(a, fill=0):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
        prob_p = prob._replace(
            obs_pose=padded(prob.obs_pose),
            obs_point=padded(prob.obs_point),
            obs_uv=padded(prob.obs_uv),
            obs_valid=padded(prob.obs_valid, False))
        single, errs_s = ba_solve(prob_p, iters=args.iters,
                                  huber_delta=2.0, robust="cauchy",
                                  z_min=0.05, prior_poses=prior,
                                  prior_weight=args.prior_weight)
        mesh = make_mesh(data=8)
        with jax.set_mesh(mesh):
            sh = NamedSharding(mesh, P("data"))
            prob_sh = prob_p._replace(
                obs_pose=jax.device_put(prob_p.obs_pose, sh),
                obs_point=jax.device_put(prob_p.obs_point, sh),
                obs_uv=jax.device_put(prob_p.obs_uv, sh),
                obs_valid=jax.device_put(prob_p.obs_valid, sh),
                poses=replicate(prob_p.poses, mesh),
                points=replicate(prob_p.points, mesh),
                intrinsics=replicate(prob_p.intrinsics, mesh),
                fixed_poses=replicate(prob_p.fixed_poses, mesh))
            sharded, errs_m = ba_solve(prob_sh, iters=args.iters,
                                       huber_delta=2.0, robust="cauchy",
                                       z_min=0.05,
                                       prior_poses=(replicate(prior, mesh)
                                                    if prior is not None
                                                    else None),
                                       prior_weight=args.prior_weight)
        ate_sh = umeyama_ate(centers_from_poses6(np.asarray(sharded.poses)),
                             gt_centers)
        print(json.dumps({
            "sharded_check": "8-device CPU mesh vs single device",
            "final_cost_single": round(float(errs_s[-1]), 4),
            "final_cost_sharded": round(float(errs_m[-1]), 4),
            "ate_after_sharded_m": round(ate_sh, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
