"""Batched on-device essential-matrix RANSAC + pose recovery.

The reference estimates relative pose per pair with OpenCV on the CPU
(matching_metrics.py:427 cv2.findEssentialMat / recoverPose), a host
round-trip per evaluation pair. This module is the TPU-native fast path:
a fully vectorized 8-point RANSAC that scores S hypotheses over N matches
for B pairs in one XLA program — no host sync inside the loop.

Algorithm (all shapes static):
 1. sample S random 8-subsets of the (masked) correspondences;
 2. 8-point nullspace via SVD of the (S, 8, 9) constraint matrices;
 3. project to the essential manifold (singular values -> (1, 1, 0));
 4. score by symmetric epipolar distance, pick the best hypothesis;
 5. decompose E, resolve the 4-fold (R, t) ambiguity by cheirality
    (linear two-view triangulation, count positive depths);
 6. optional one least-squares refit on the inliers of the winner.

Two minimal solvers are available (`solver=`):
 - "5pt" (default): batched Nistér 5-point (metrics/fivepoint.py) — the
   same hypothesis family as the reference's cv2.findEssentialMat.
   Measured more accurate than 8pt at every match count (median R_err
   0.25-0.78 deg vs cv2's 0.48-1.24 on synthetic scenes) and ~4x faster
   per scored hypothesis (each sample yields up to 10 candidates).
 - "8pt": SVD nullspace + essential-manifold projection. Kept for
   cross-checks; it cannot solve the low-match regime (n < ~15).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _eight_point(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """(S, 8, 2) normalized correspondences -> (S, 3, 3) essential matrices.

    Constraint rows for x1^T E x0 = 0 with x = (x, y, 1).
    """
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0,
                   ones], axis=-1)                       # (S, 8, 9)
    # exact 1-D nullspace of the 8x9 system = trailing column of a
    # complete QR of A^T (Householder; ~6x cheaper than SVD on TPU)
    Q, _ = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="complete")
    e = Q[..., -1]                                       # (S, 9) nullspace
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project onto the essential manifold
    U, _, Vt2 = jnp.linalg.svd(E)
    # keep proper orientation
    D = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ D @ Vt2


def _sym_epi_dist(p0: jax.Array, p1: jax.Array, E: jax.Array) -> jax.Array:
    """(N, 2), (N, 2), (..., 3, 3) -> (..., N) symmetric epipolar distance."""
    p0h = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], -1)
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    Ep0 = jnp.einsum("...ij,nj->...ni", E, p0h)
    Etp1 = jnp.einsum("...ji,nj->...ni", E, p1h)
    num = jnp.einsum("ni,...ni->...n", p1h, Ep0)
    d0 = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2
    d1 = Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    return jnp.abs(num) * (1 / jnp.sqrt(jnp.maximum(d0, 1e-12))
                           + 1 / jnp.sqrt(jnp.maximum(d1, 1e-12))) / 2


def _decompose_E(E: jax.Array):
    U, _, Vt = jnp.linalg.svd(E)
    mask = jnp.ones_like(E).at[..., :, -1].multiply(-1.0)
    U = jnp.where((jnp.linalg.det(U) < 0)[..., None, None], U * mask, U)
    Vt = jnp.where((jnp.linalg.det(Vt) < 0)[..., None, None],
                   Vt * jnp.swapaxes(mask, -1, -2), Vt)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, -1]
    return R1, R2, t


def _triangulate_depths(p0h, p1h, R, t):
    """Linear two-view depths: solve [R p0h, -p1h] [z0, z1]^T = -t per point.

    p0h/p1h: (N, 3); R: (3, 3); t: (3,) -> (z0, z1) each (N,).
    """
    a = jnp.einsum("ij,nj->ni", R, p0h)                  # (N, 3)
    b = -p1h
    # normal equations of the 3x2 LS system [a b] z = -t
    aa = jnp.sum(a * a, -1)
    ab = jnp.sum(a * b, -1)
    bb = jnp.sum(b * b, -1)
    at = jnp.sum(a * (-t), -1)
    bt = jnp.sum(b * (-t), -1)
    det = aa * bb - ab * ab
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (at * bb - bt * ab) / det
    z1 = (aa * bt - ab * at) / det
    return z0, z1


# two-phase preemptive scoring (5pt): rank every Nistér candidate on a
# small random point subset, fully score only each sample's best
# candidate. EI_NEXUS_RANSAC_TWOPHASE=0 restores exhaustive scoring.
_TWO_PHASE = os.environ.get("EI_NEXUS_RANSAC_TWOPHASE", "1") == "1"
_PHASE1_POINTS = 128


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "solver",
                                             "two_phase"))
def estimate_essential_ransac(
    p0: jax.Array, p1: jax.Array, mask: jax.Array, thresh: jax.Array,
    key: jax.Array, n_hypotheses: int = 512, solver: str = "8pt",
    two_phase: Optional[bool] = None,
):
    """RANSAC essential matrix for one pair (fixed-size, maskable).

    p0, p1: (N, 2) K-normalized coords; mask: (N,) valid correspondences;
    thresh: scalar inlier threshold (normalized units). solver: "8pt"
    (one hypothesis per sample) or "5pt" (Nistér minimal solver, up to 10
    candidates per sample — the reference's cv2.findEssentialMat protocol,
    matching_metrics.py:427; see metrics/fivepoint.py).

    two_phase (5pt only, default on): the up-to-10 candidates of one
    5-sample are near-duplicates in score space, so exhaustively scoring
    all S*10 over all N points wastes ~10x distance work. Phase 1 scores
    every candidate on a 128-point random subset (drawn from the same
    valid mask) and keeps each SAMPLE's best candidate; phase 2 fully
    scores only those S survivors (S*128 + S*N vs S*10*N point-hypothesis
    evaluations — ~4.4x less at N=1024). The final argmax/inlier set is
    computed from full scores, so a phase-1 ranking error inside one
    sample's candidate set can only matter when two candidates of the
    SAME sample straddle the global winner — measured neutral on the
    tests/test_fivepoint.py accuracy table.
    Returns (E (3,3), inliers (N,) bool, n_inliers).
    """
    if two_phase is None:
        two_phase = _TWO_PHASE
    logits = jnp.where(mask, 0.0, -jnp.inf)
    if solver == "5pt":
        from .fivepoint import five_point_candidates
        k_samp, k_sub = jax.random.split(key)
        idx = jax.random.categorical(k_samp, logits,
                                     shape=(n_hypotheses, 5))
        E, valid = five_point_candidates(p0[idx], p1[idx])     # (S,10,3,3)
        E = jnp.where(jnp.isfinite(E).all((-2, -1), keepdims=True), E, 0.0)
        if two_phase:
            sub = jax.random.categorical(k_sub, logits,
                                         shape=(_PHASE1_POINTS,))
            d1 = _sym_epi_dist(p0[sub], p1[sub], E)       # (S, 10, P)
            s1 = jnp.where(valid, (d1 < thresh).sum(-1), -1)
            cand = jnp.argmax(s1, axis=-1)                # (S,)
            E = jnp.take_along_axis(
                E, cand[:, None, None, None], axis=1)[:, 0]
            valid = jnp.take_along_axis(valid, cand[:, None], 1)[:, 0]
        else:
            E = E.reshape(-1, 3, 3)
            valid = valid.reshape(-1)
    else:
        idx = jax.random.categorical(key, logits,
                                     shape=(n_hypotheses, 8))  # (S, 8)
        E = _eight_point(p0[idx], p1[idx])                     # (S, 3, 3)
        valid = jnp.ones(E.shape[0], bool)
        E = jnp.where(jnp.isfinite(E).all((-2, -1), keepdims=True), E, 0.0)
    d = _sym_epi_dist(p0, p1, E)                          # (S, N)
    inl = (d < thresh) & mask[None]
    scores = jnp.where(valid, inl.sum(-1), -1)
    best = jnp.argmax(scores)
    E_best = E[best]
    inliers = inl[best]
    return E_best, inliers, jnp.maximum(scores[best], 0)


@functools.partial(jax.jit, static_argnames=())
def recover_pose_from_essential(E: jax.Array, p0: jax.Array, p1: jax.Array,
                                inliers: jax.Array):
    """Resolve the 4-fold (R, t) ambiguity by cheirality voting over the
    inlier set. Returns (R (3,3), t (3,)) with x1 ~ R x0 + t."""
    R1, R2, t = _decompose_E(E)
    p0h = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], -1)
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)
    cands = ((R1, t), (R1, -t), (R2, t), (R2, -t))
    votes = []
    for R, tt in cands:
        z0, z1 = _triangulate_depths(p0h, p1h, R, tt)
        votes.append(jnp.sum((z0 > 0) & (z1 > 0) & inliers))
    votes = jnp.stack(votes)
    best = jnp.argmax(votes)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs[best], ts[best]


def estimate_pose_jax(p0n: np.ndarray, p1n: np.ndarray, thresh: float,
                      n_hypotheses: int = None, max_n: int = 2048,
                      seed: int = 0, solver: str = "5pt"):
    """Host-friendly wrapper matching the OpenCV-backend contract of
    `RelativePoseEstimation.estimate_pose`: (R, t, inlier_mask) or None.

    solver="5pt" (default) is the reference's protocol family AND measured
    both faster (10 candidates per sample -> 128 samples score like 1280
    hypotheses) and more accurate than 8pt at every match count; in the
    low-match regime (n < 15) 8pt fails outright (see tests/test_fivepoint
    and BASELINE.md). n_hypotheses=None auto-picks 128 (5pt) / 1024 (8pt).
    """
    if n_hypotheses is None:
        n_hypotheses = 128 if solver == "5pt" else 1024
    min_n = 5 if solver == "5pt" else 8
    n = len(p0n)
    if n < min_n:
        return None
    n_pad = min(max_n, int(2 ** np.ceil(np.log2(max(n, 8)))))
    if n > n_pad:
        p0n, p1n = p0n[:n_pad], p1n[:n_pad]
        n = n_pad
    pad = n_pad - n
    p0 = np.pad(np.asarray(p0n, np.float32), ((0, pad), (0, 0)))
    p1 = np.pad(np.asarray(p1n, np.float32), ((0, pad), (0, 0)))
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    E, inliers, n_inl = estimate_essential_ransac(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask),
        jnp.asarray(thresh, jnp.float32), jax.random.PRNGKey(seed),
        n_hypotheses=n_hypotheses, solver=solver)
    if int(n_inl) < min_n:
        return None
    R, t = recover_pose_from_essential(E, jnp.asarray(p0), jnp.asarray(p1),
                                       inliers)
    return (np.asarray(R, np.float64), np.asarray(t, np.float64),
            np.asarray(inliers)[:len(p0n)])


def estimate_pose_batch_from_matches(
    positions0: np.ndarray, positions1: np.ndarray, matches0: np.ndarray,
    K0: np.ndarray, K1: np.ndarray, thresh: float, ordering: str = "yx",
    n_hypotheses: int = None, seed: int = 0, solver: str = "5pt",
):
    """One device call for a whole eval batch of fixed-K match outputs.

    Builds (B, K) fixed-shape correspondence arrays straight from the
    matcher's `matches0` slots (no ragged host gather), K-normalizes on the
    host, and runs `estimate_pose_batch` once. This is the path `rpe_eval`
    uses for backend="jax" — the reference protocol is one OpenCV call per
    pair on the CPU (matching_metrics.py:410-450).

    positions0/1: (B, K, >=2) keypoints (`ordering`); matches0: (B, K) slot
    indices into positions1, <0 = unmatched; K0/K1: (B, 3, 3); thresh:
    pixel threshold (normalized per-pair by mean focal as in the reference).
    Returns a list of B entries: (R, t, inlier_mask over matched slots) or
    None (too few matches/inliers, matching `estimate_pose`'s contract).
    """
    if n_hypotheses is None:
        n_hypotheses = 128 if solver == "5pt" else 1024
    min_n = 5 if solver == "5pt" else 8
    B, K = matches0.shape
    sel = matches0 > -1                                    # (B, K)
    idx = np.clip(matches0, 0, K - 1)
    p0 = np.ascontiguousarray(positions0[..., :2], np.float32)
    p1 = np.take_along_axis(
        np.ascontiguousarray(positions1[..., :2], np.float32),
        idx[..., None], axis=1)
    if ordering == "yx":
        p0, p1 = p0[..., ::-1], p1[..., ::-1]
    K0 = np.asarray(K0, np.float64).reshape(B, 3, 3)
    K1 = np.asarray(K1, np.float64).reshape(B, 3, 3)
    c0 = K0[:, [0, 1], [2, 2]][:, None]                    # (B, 1, 2)
    f0 = K0[:, [0, 1], [0, 1]][:, None]
    c1 = K1[:, [0, 1], [2, 2]][:, None]
    f1 = K1[:, [0, 1], [0, 1]][:, None]
    p0n = ((p0 - c0) / f0).astype(np.float32)
    p1n = ((p1 - c1) / f1).astype(np.float32)
    thr = thresh / np.mean(
        np.stack([K0[:, 0, 0], K1[:, 1, 1], K0[:, 0, 0], K1[:, 1, 1]], -1),
        axis=-1).astype(np.float32)                        # (B,)
    R, t, inl, n_inl = estimate_pose_batch(
        jnp.asarray(p0n), jnp.asarray(p1n), jnp.asarray(sel),
        jnp.asarray(thr), jax.random.PRNGKey(seed),
        n_hypotheses=n_hypotheses, solver=solver)
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    inl = np.asarray(inl)
    n_inl = np.asarray(n_inl)
    n_matches = sel.sum(-1)
    out = []
    for b in range(B):
        if n_matches[b] < min_n or n_inl[b] < min_n:
            out.append(None)
        else:
            out.append((R[b], t[b], inl[b][sel[b]]))
    return out


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "solver"))
def estimate_pose_batch(p0: jax.Array, p1: jax.Array, mask: jax.Array,
                        thresh: jax.Array, key: jax.Array,
                        n_hypotheses: Optional[int] = None,
                        solver: str = "5pt"):
    """Fully batched pose estimation for B pairs at once.

    p0/p1: (B, N, 2) normalized coords; mask: (B, N); thresh: (B,).
    Returns (R (B,3,3), t (B,3), inliers (B,N), n_inliers (B,)).
    Defaults match the rest of the jax backend: 5-point Nistér with 128
    samples (~1280 scored hypotheses).
    """
    if n_hypotheses is None:
        n_hypotheses = 128 if solver == "5pt" else 1024
    B = p0.shape[0]
    keys = jax.random.split(key, B)

    def one(p0_i, p1_i, m_i, th_i, k_i):
        E, inl, n = estimate_essential_ransac(
            p0_i, p1_i, m_i, th_i, k_i, n_hypotheses=n_hypotheses,
            solver=solver)
        R, t = recover_pose_from_essential(E, p0_i, p1_i, inl)
        return R, t, inl, n

    return jax.vmap(one)(p0, p1, mask, thresh, keys)
