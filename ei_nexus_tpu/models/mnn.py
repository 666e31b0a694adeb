"""Mutual-nearest-neighbor descriptor matcher.

Capability parity with reference `core/modules/matchers/MNN.py` (find_nn,
mutual_check, NearestNeighborMatcher), fully batched and mask-aware:

 - cosine similarity einsum `bnd,bmd->bnm`, optional ratio / distance tests
   on the top-2 neighbors, mutual check;
 - log-assignment matrix from dual log-softmax (rows+cols), same (N+1, M+1)
   layout with zero dustbins;
 - invalid (padded) keypoint slots are masked out of the similarity before
   matching, replacing the reference's per-sample ragged loop
   (MNN.py:103-129) — matched keypoints are recovered downstream by
   `gather_matched_keypoints` with static shapes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _find_nn(sim: jax.Array, ratio_thresh: Optional[float],
             distance_thresh: Optional[float]) -> jax.Array:
    """Best-match indices along the last axis with optional ratio/distance
    tests (reference MNN.py:12). sim: (..., N, M) -> (..., N) int32."""
    if ratio_thresh:
        sim_nn, ind_nn = jax.lax.top_k(sim, 2)
        dist_nn = 2 * (1 - sim_nn)
        mask = dist_nn[..., 0] <= (ratio_thresh ** 2) * dist_nn[..., 1]
        best = ind_nn[..., 0]
        best_dist = dist_nn[..., 0]
    else:
        best = jnp.argmax(sim, axis=-1)
        best_dist = 2 * (1 - jnp.max(sim, axis=-1))
        mask = jnp.ones(best.shape, bool)
    if distance_thresh:
        mask = mask & (best_dist <= distance_thresh ** 2)
    return jnp.where(mask, best, -1).astype(jnp.int32)


def _mutual_check(m0: jax.Array, m1: jax.Array):
    """Keep only matches agreeing in both directions (reference MNN.py:25)."""
    inds0 = jnp.arange(m0.shape[-1])
    inds1 = jnp.arange(m1.shape[-1])
    loop0 = jnp.take_along_axis(m1, jnp.maximum(m0, 0), axis=-1)
    loop1 = jnp.take_along_axis(m0, jnp.maximum(m1, 0), axis=-1)
    m0_new = jnp.where((m0 > -1) & (inds0 == loop0), m0, -1)
    m1_new = jnp.where((m1 > -1) & (inds1 == loop1), m1, -1)
    return m0_new, m1_new


def mnn_match(
    feats0: Dict[str, jax.Array],
    feats1: Dict[str, jax.Array],
    ratio_thresh: Optional[float] = None,
    distance_thresh: Optional[float] = None,
    mutual_check: bool = True,
) -> Dict[str, jax.Array]:
    """Match two fixed-K feature dicts.

    feats* must hold `sparse_descriptors` (B, K, D), `sparse_positions`
    (B, K, 3) and optionally `sparse_valid` (B, K). Returns the reference's
    output contract (matches0/1, matching_scores0/1, similarity,
    log_assignment) in static shapes, with `matches` of invalid slots = -1.
    """
    desc0 = feats0["sparse_descriptors"]
    desc1 = feats1["sparse_descriptors"]
    valid0 = feats0.get("sparse_valid")
    valid1 = feats1.get("sparse_valid")

    sim = jnp.einsum("bnd,bmd->bnm", desc0, desc1)
    sim_m = sim
    if valid0 is not None:
        sim_m = jnp.where(valid0[..., :, None], sim_m, _NEG_INF)
    if valid1 is not None:
        sim_m = jnp.where(valid1[..., None, :], sim_m, _NEG_INF)

    matches0 = _find_nn(sim_m, ratio_thresh, distance_thresh)
    matches1 = _find_nn(jnp.swapaxes(sim_m, -1, -2), ratio_thresh,
                        distance_thresh)
    if mutual_check:
        matches0, matches1 = _mutual_check(matches0, matches1)
    if valid0 is not None:
        matches0 = jnp.where(valid0, matches0, -1)
    if valid1 is not None:
        matches1 = jnp.where(valid1, matches1, -1)

    B, N, M = sim.shape
    la_core = (jax.nn.log_softmax(sim, axis=-1)
               + jax.nn.log_softmax(sim, axis=-2))
    la = jnp.zeros((B, N + 1, M + 1), sim.dtype)
    la = la.at[:, :N, :M].set(la_core)

    return {
        "matches0": matches0,
        "matches1": matches1,
        "matching_scores0": (matches0 > -1).astype(jnp.float32),
        "matching_scores1": (matches1 > -1).astype(jnp.float32),
        "similarity": sim,
        "log_assignment": la,
    }


def gather_matched_keypoints(kpts0: jax.Array, kpts1: jax.Array,
                             matches0: jax.Array):
    """Pair up matched keypoints in static shape.

    Returns (mkpts0 (B, N, 3), mkpts1 (B, N, 3), match_mask (B, N)): slot i
    holds (kpts0[i], kpts1[matches0[i]]) where matched. Replaces the
    reference's per-sample python gather (MNN.py:103-129,
    lightglue.py:674-700); hosts needing a ragged list apply the mask.
    """
    match_mask = matches0 > -1
    idx = jnp.maximum(matches0, 0)
    mkpts1 = jnp.take_along_axis(kpts1, idx[..., None], axis=-2)
    return kpts0, mkpts1, match_mask
