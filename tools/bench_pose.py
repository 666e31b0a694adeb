#!/usr/bin/env python
"""Decompose the on-device pose-RANSAC cost (the pose-inclusive bench gap).

The full reference eval protocol includes per-pair essential RANSAC
(/root/reference/core/metrics/matching_metrics.py:410-450). Our batched
5-point RANSAC adds ~7 ms/pair at 128 samples (96.8 vs 313.5 pairs/s,
BASELINE.md round 2). This tool times `estimate_pose_batch` and ablated
variants with the chained-scan methodology (see bench.py docstring) to
find where the milliseconds live:

  full        - estimate_pose_batch as shipped
  solver      - five_point_candidates only (no scoring / recovery)
  nullspace   - the (S,5,9) SVD nullspace only
  roots       - polynomial assembly + degree-10 real roots only
  score       - epipolar scoring of precomputed hypotheses only
  recover     - cheirality pose recovery only

Usage: python tools/bench_pose.py [B] [N] [S]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

if os.environ.get("EI_NEXUS_POSE_DEVICE") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def timed(fn, *args, n_iter=30, perturb=None):
    """Chained-scan timing: n_iter data-dependent iterations, one fetch."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def chained(*a):
        def body(carry, _):
            aa = list(a)
            if perturb is not None:
                aa = perturb(aa, carry)
            out = fn(*aa)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(x.astype(jnp.float32)) * 1e-9 for x in leaves)
            return carry + s * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_iter)
        return c

    float(chained(*args))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from ei_nexus_tpu.metrics.ransac import (
        estimate_pose_batch, estimate_essential_ransac,
        recover_pose_from_essential, _sym_epi_dist)
    from ei_nexus_tpu.metrics.fivepoint import (
        five_point_candidates, _nullspace_basis, _constraint_matrix,
        _action_polys, _det_poly, _real_roots_deg10, _solve_gj)

    rng = np.random.default_rng(0)
    # synthetic rigid scene: points on a plane-ish cloud, two views
    X = rng.uniform(-1, 1, (B, N, 3)) + np.array([0, 0, 4.0])
    angles = rng.uniform(-0.1, 0.1, (B, 3))

    def rot(a):
        cx, cy, cz = np.cos(a)
        sx, sy, sz = np.sin(a)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return Rz @ Ry @ Rx

    R = np.stack([rot(a) for a in angles])
    t = rng.uniform(-0.3, 0.3, (B, 3))
    X1 = np.einsum("bij,bnj->bni", R, X) + t[:, None]
    p0 = (X[..., :2] / X[..., 2:]).astype(np.float32)
    p1 = (X1[..., :2] / X1[..., 2:]).astype(np.float32)
    p0 += rng.normal(0, 1e-3, p0.shape).astype(np.float32)
    p1 += rng.normal(0, 1e-3, p1.shape).astype(np.float32)
    mask = np.ones((B, N), bool)
    thr = np.full((B,), 3.0 / 200.0, np.float32)

    p0j, p1j = jnp.asarray(p0), jnp.asarray(p1)
    maskj, thrj = jnp.asarray(mask), jnp.asarray(thr)
    key = jax.random.PRNGKey(0)

    def perturb(args, carry):
        args = list(args)
        args[0] = args[0] + carry * 1e-6
        return args

    res = {}

    # full path
    res["full"] = timed(
        lambda a, b: estimate_pose_batch(a, b, maskj, thrj, key,
                                         n_hypotheses=S),
        p0j, p1j, perturb=perturb)

    # sampled 5-subsets shared by the component benches
    keys = jax.random.split(key, B)
    logits = jnp.where(maskj, 0.0, -jnp.inf)
    idx = jax.vmap(lambda k, lg: jax.random.categorical(
        k, lg, shape=(S, 5)))(keys, logits)                 # (B, S, 5)
    q0 = jnp.take_along_axis(p0j[:, :, None, :].repeat(1, 1),
                             idx[..., None], axis=1) \
        if False else jax.vmap(lambda p, i: p[i])(p0j, idx)  # (B, S, 5, 2)
    q1 = jax.vmap(lambda p, i: p[i])(p1j, idx)

    res["solver"] = timed(
        lambda a, b: jax.vmap(five_point_candidates)(a, b),
        q0, q1, perturb=perturb)

    res["nullspace"] = timed(
        lambda a, b: jax.vmap(_nullspace_basis)(a, b),
        q0, q1, perturb=perturb)

    basis = jax.vmap(_nullspace_basis)(q0, q1)

    def roots_only(basis):
        M = jax.vmap(_constraint_matrix)(basis)
        from ei_nexus_tpu.metrics.fivepoint import _PERM
        Mp = M[..., jnp.asarray(_PERM)]
        A_, B_ = Mp[..., :10], Mp[..., 10:]
        C = _solve_gj(A_, B_)
        bx, by, b1 = _action_polys(C)
        n = _det_poly(bx, by, b1)
        z, valid = jax.vmap(_real_roots_deg10)(n)
        return z, valid

    res["roots"] = timed(roots_only, basis,
                         perturb=lambda a, c: [a[0] + c * 1e-9])

    # scoring: S*10 hypotheses x N matches
    E, valid = jax.vmap(five_point_candidates)(q0, q1)      # (B,S,10,3,3)
    Ef = E.reshape(B, -1, 3, 3)

    def score_only(Ef, p0j, p1j):
        d = jax.vmap(_sym_epi_dist)(p0j, p1j, Ef)           # (B, S*10, N)
        inl = (d < thrj[:, None, None]) & maskj[:, None]
        return inl.sum(-1)

    res["score"] = timed(score_only, Ef, p0j, p1j,
                         perturb=lambda a, c: [a[0], a[1] + c * 1e-6, a[2]])

    # recovery from a fixed E
    def recover_only(p0j, p1j):
        return jax.vmap(recover_pose_from_essential)(
            Ef[:, 0], p0j, p1j, maskj)

    res["recover"] = timed(recover_only, p0j, p1j, perturb=perturb)

    print(f"B={B} N={N} S={S} device={jax.devices()[0].platform}")
    for k, v in res.items():
        print(f"  {k:10s} {v * 1e3:8.2f} ms/batch  "
              f"({v * 1e3 / B:6.3f} ms/pair)")


if __name__ == "__main__":
    main()
