"""5-point Nistér minimal solver + RANSAC integration.

The reference's RPE protocol runs cv2.findEssentialMat (5-point inside
RANSAC, matching_metrics.py:427). These tests check: (1) the batched
solver recovers the true essential matrix from exact minimal problems,
(2) solver="5pt" RANSAC recovers pose in the low-match regime (n < 15)
where the 8-point solver's samples are the weak spot, (3) the jax 5pt
pose matches OpenCV's within the protocol noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ei_nexus_tpu.metrics.fivepoint import five_point_candidates
from ei_nexus_tpu.metrics.ransac import estimate_pose_jax


def make_scene(rng, n, noise=0.0, outlier_frac=0.0, depth=4.0):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    # keep the rotation moderate so all points stay in front
    Q = np.eye(3) + 0.3 * (Q - np.eye(3))
    U, _, Vt = np.linalg.svd(Q)
    Q = U @ Vt
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    P = rng.uniform(-1.5, 1.5, (n, 3)) + np.array([0, 0, depth])
    p0 = P[:, :2] / P[:, 2:]
    P1 = P @ Q.T + t
    p1 = P1[:, :2] / P1[:, 2:]
    if noise:
        p0 = p0 + rng.normal(0, noise, p0.shape)
        p1 = p1 + rng.normal(0, noise, p1.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        p1[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ Q
    return (p0.astype(np.float32), p1.astype(np.float32),
            E / np.linalg.norm(E), Q, t)


class TestFivePointMinimal:
    def test_recovers_true_E(self, rng):
        S = 24
        scenes = [make_scene(rng, 5) for _ in range(S)]
        p0 = jnp.asarray(np.stack([s[0] for s in scenes]))
        p1 = jnp.asarray(np.stack([s[1] for s in scenes]))
        E_cand, valid = jax.jit(five_point_candidates)(p0, p1)
        E_cand, valid = np.asarray(E_cand), np.asarray(valid)
        recovered = 0
        for i, (_, _, E_true, _, _) in enumerate(scenes):
            errs = [min(np.abs(E_cand[i, k] - E_true).max(),
                        np.abs(E_cand[i, k] + E_true).max())
                    for k in range(10) if valid[i, k]]
            assert errs, "no valid candidate"
            recovered += min(errs) < 2e-2
        # f32 arithmetic: allow a couple of ill-conditioned misses
        assert recovered >= S - 2, f"{recovered}/{S}"

    def test_candidates_satisfy_epipolar(self, rng):
        p0, p1, *_ = make_scene(rng, 5)
        E, valid = five_point_candidates(jnp.asarray(p0)[None],
                                         jnp.asarray(p1)[None])
        E, valid = np.asarray(E[0]), np.asarray(valid[0])
        p0h = np.concatenate([p0, np.ones((5, 1), np.float32)], 1)
        p1h = np.concatenate([p1, np.ones((5, 1), np.float32)], 1)
        for k in range(10):
            if valid[k]:
                res = np.einsum("ni,ij,nj->n", p1h, E[k], p0h)
                assert np.abs(res).max() < 1e-3

    def test_invalid_on_degenerate(self):
        # all five correspondences identical: no usable candidates may
        # carry non-finite values
        p = jnp.ones((1, 5, 2), jnp.float32)
        E, valid = five_point_candidates(p, p * 0.5)
        assert np.isfinite(np.asarray(E)[np.asarray(valid)]).all()


class TestFivePointRansac:
    @pytest.mark.parametrize("n", [8, 10, 14])
    def test_low_match_regime(self, rng, n):
        """The regime where 8pt diverges from the cv2 protocol: few
        matches, mild noise. 5pt must recover rotation to a few deg
        (estimation error from n noisy points scales like 1/sqrt(n);
        at n=8 the best achievable is ~2 deg)."""
        ok = 0
        for trial in range(6):
            p0, p1, _, R_true, t_true = make_scene(
                rng, n, noise=5e-4)
            ret = estimate_pose_jax(p0.astype(np.float64),
                                    p1.astype(np.float64),
                                    thresh=3e-3, solver="5pt",
                                    seed=trial)
            if ret is None:
                continue
            R, t, _ = ret
            cos = np.clip((np.trace(R.T @ R_true) - 1) / 2, -1, 1)
            r_err = np.degrees(np.arccos(cos))
            t_err = np.degrees(np.arccos(np.clip(
                abs(np.dot(t / np.linalg.norm(t), t_true)), -1, 1)))
            ok += (r_err < 3.0) and (t_err < 8.0)
        assert ok >= 4, f"{ok}/6 recovered"

    def test_matches_opencv_protocol(self, rng):
        """5pt jax vs cv2.findEssentialMat on the same noisy scene."""
        import cv2
        p0, p1, _, R_true, _ = make_scene(rng, 60, noise=1e-3,
                                          outlier_frac=0.15)
        thr = 3e-3
        ret = estimate_pose_jax(p0.astype(np.float64),
                                p1.astype(np.float64), thresh=thr,
                                solver="5pt")
        assert ret is not None
        R_jax = ret[0]
        E, mask = cv2.findEssentialMat(p0.astype(np.float64),
                                       p1.astype(np.float64), np.eye(3),
                                       threshold=thr, prob=0.999,
                                       method=cv2.RANSAC)
        best, R_cv = 0, None
        for _E in np.split(E, len(E) / 3):
            nin, R, t, _ = cv2.recoverPose(_E, p0.astype(np.float64),
                                           p1.astype(np.float64),
                                           np.eye(3), 1e9,
                                           mask=mask.copy())
            if nin > best:
                best, R_cv = nin, R
        for R in (R_jax, R_cv):
            cos = np.clip((np.trace(R.T @ R_true) - 1) / 2, -1, 1)
            assert np.degrees(np.arccos(cos)) < 3.0
