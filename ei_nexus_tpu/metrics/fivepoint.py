"""Batched 5-point minimal essential-matrix solver (Nistér 2004), TPU-native.

The reference's RPE protocol estimates E with `cv2.findEssentialMat`
(matching_metrics.py:427), which uses the 5-point Nistér minimal solver
inside RANSAC; our 8-point jax backend diverges from it in the few-match
regime (8 <= n < ~15). This module closes that gap on device.

Design for XLA/TPU (no data-dependent shapes, no nonsymmetric eig — which
TPU/XLA does not provide):

 1. nullspace of the (5, 9) epipolar constraint matrix via SVD ->
    E(x, y, z) = x X + y Y + z Z + W over a 4-dim basis;
 2. the ten cubic constraints det(E) = 0 and
    2 E E^T E - tr(E E^T) E = 0 are expanded into a (10, 20) coefficient
    matrix over trivariate monomials using STATIC multiplication tables
    (deg1*deg1 -> deg2, deg2*deg1 -> deg3) built once in numpy — every
    product is a tiny einsum, batchable over hypothesis sets;
 3. Gauss-Jordan elimination = one batched 10x10 `linalg.solve`;
 4. Nistér's <k>, <l>, <m> rows give a 3x3 matrix B(z) of univariate
    polynomials whose determinant n(z) has degree 10; its REAL roots are
    found by sign changes of the homogenized form
    sum_i c_i sin^i(t) cos^(10-i)(t) on a tan-substitution grid, refined
    by fixed-iteration bisection — branch-free, fully batched;
 5. each real root z gives (x, y) from a least-squares 3x2 solve and a
    candidate E.

All steps are published math (Nistér, "An efficient solution to the
five-point relative pose problem", PAMI 2004); implemented from the paper,
not ported from any solver.
"""

from __future__ import annotations

import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# static monomial bookkeeping (numpy, module-load time)
# ---------------------------------------------------------------------------

# canonical monomial lists by total degree in (x, y, z)
_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]            # x, y, z, 1
_DEG2 = [m for m in itertools.product(range(3), repeat=3) if sum(m) <= 2]
_DEG3 = [m for m in itertools.product(range(4), repeat=3) if sum(m) <= 3]
_I2 = {m: i for i, m in enumerate(_DEG2)}                        # 10
_I3 = {m: i for i, m in enumerate(_DEG3)}                        # 20


def _mul_table(basis_a, basis_b, basis_out):
    """One-hot tensor T s.t. (a outer b).flat @ T = product coefficients."""
    T = np.zeros((len(basis_a) * len(basis_b), len(basis_out)), np.float32)
    idx = {m: i for i, m in enumerate(basis_out)}
    for i, ma in enumerate(basis_a):
        for j, mb in enumerate(basis_b):
            m = tuple(x + y for x, y in zip(ma, mb))
            T[i * len(basis_b) + j, idx[m]] = 1.0
    return T


_T11 = _mul_table(_DEG1, _DEG1, _DEG2)                           # (16, 10)
_T21 = _mul_table(_DEG2, _DEG1, _DEG3)                           # (40, 20)

# Nistér's column order: 10 leading monomials eliminated by Gauss-Jordan,
# 10 trailing ones kept (grouped as x*, y*, const)
_LEAD = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
         (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0)]
_TRAIL = [(1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
          (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]
_PERM = np.array([_I3[m] for m in _LEAD + _TRAIL], np.int32)

# row positions (within _LEAD) of the monomials Nistér pairs up
_ROW_X2Z, _ROW_X2, _ROW_Y2Z, _ROW_Y2, _ROW_XYZ, _ROW_XY = 4, 5, 6, 7, 8, 9


def _conv_table(la: int, lb: int) -> np.ndarray:
    """One-hot tensor for 1-D polynomial multiply of coeff lengths la, lb."""
    T = np.zeros((la * lb, la + lb - 1), np.float32)
    for i in range(la):
        for j in range(lb):
            T[i * lb + j, i + j] = 1.0
    return T


# ---------------------------------------------------------------------------
# batched polynomial helpers
# ---------------------------------------------------------------------------

def _p11(a, b):
    """(..., 4) x (..., 4) -> (..., 10)"""
    o = (a[..., :, None] * b[..., None, :]).reshape(*a.shape[:-1], 16)
    return o @ jnp.asarray(_T11, a.dtype)


def _p21(a, b):
    """(..., 10) x (..., 4) -> (..., 20)"""
    o = (a[..., :, None] * b[..., None, :]).reshape(*a.shape[:-1], 40)
    return o @ jnp.asarray(_T21, a.dtype)


def _polymul(a, b):
    """ascending-coefficient univariate multiply, static lengths."""
    la, lb = a.shape[-1], b.shape[-1]
    o = (a[..., :, None] * b[..., None, :]).reshape(*a.shape[:-1], la * lb)
    return o @ jnp.asarray(_conv_table(la, lb), a.dtype)


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------

def _nullspace_basis(p0, p1):
    """(S, 5, 2) x2 -> (S, 4, 3, 3) nullspace basis (X, Y, Z, W).

    A is 5x9, so its nullspace is EXACTLY the orthogonal complement of
    col(A^T): the trailing 4 columns of a complete QR of A^T span it with
    no rank decision needed. QR (Householder) is ~6x cheaper than the SVD
    it replaces on TPU (the nullspace was the largest single cost of the
    pose path: 13 ms of the 20 ms batch, tools/bench_pose.py)."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, ones], axis=-1)                       # (S, 5, 9)
    Q, _ = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="complete")
    basis = jnp.swapaxes(Q[..., 5:], -1, -2)                     # (S, 4, 9)
    return basis.reshape(*basis.shape[:-1], 3, 3)


def _constraint_matrix(basis):
    """(S, 4, 3, 3) -> (S, 10, 20) cubic-constraint coefficients
    (canonical monomial order _DEG3)."""
    # E entries as degree-1 polynomials over (x, y, z, 1):
    # coefficient of x is X[i,j], ..., of 1 is W[i,j]
    Ep = jnp.moveaxis(basis, -3, -1)                             # (S,3,3,4)

    # EE^T entries (degree 2)
    G = jnp.einsum("...ikp,...jkq,pqm->...ijm", Ep, Ep,
                   jnp.asarray(_T11, Ep.dtype).reshape(4, 4, 10))
    tr = G[..., 0, 0, :] + G[..., 1, 1, :] + G[..., 2, 2, :]     # (S,10)
    T = 2.0 * G - tr[..., None, None, :] * jnp.eye(3, dtype=Ep.dtype
                                                   )[..., :, :, None]
    # (T E) entries (degree 3): nine equations
    TE = jnp.einsum("...ikp,...kjq,pqm->...ijm", T, Ep,
                    jnp.asarray(_T21, Ep.dtype).reshape(10, 4, 20))
    eqs = TE.reshape(*TE.shape[:-3], 9, 20)

    # det(E) (degree 3): cofactor expansion along the first row
    def minor(i0, i1, j0, j1):
        return _p11(Ep[..., i0, j0, :], Ep[..., i1, j1, :]) - \
            _p11(Ep[..., i0, j1, :], Ep[..., i1, j0, :])
    det = (_p21(minor(1, 2, 1, 2), Ep[..., 0, 0, :])
           - _p21(minor(1, 2, 0, 2), Ep[..., 0, 1, :])
           + _p21(minor(1, 2, 0, 1), Ep[..., 0, 2, :]))          # (S, 20)

    return jnp.concatenate([det[..., None, :], eqs], axis=-2)    # (S,10,20)


def _action_polys(C):
    """Reduced trailing block (S, 10, 10) -> B(z) coefficient tensors.

    Returns (bx, by, b1): (S, 3, 4), (S, 3, 4), (S, 3, 5) ascending
    z-coefficients of the 3x3 Nistér matrix rows <k>, <l>, <m>.
    Row identity: for paired rows (a = mono*z row, b = mono row),
    <row> = (C_a - z C_b) . trailing = 0.
    """
    def kx(Ca, Cb):
        # trailing x-group: xz^2, xz, x at indices 0, 1, 2
        return jnp.stack([Ca[..., 2], Ca[..., 1] - Cb[..., 2],
                          Ca[..., 0] - Cb[..., 1], -Cb[..., 0]], axis=-1)

    def ky(Ca, Cb):
        return jnp.stack([Ca[..., 5], Ca[..., 4] - Cb[..., 5],
                          Ca[..., 3] - Cb[..., 4], -Cb[..., 3]], axis=-1)

    def k1(Ca, Cb):
        # const group: z^3, z^2, z, 1 at indices 6..9
        return jnp.stack([Ca[..., 9], Ca[..., 8] - Cb[..., 9],
                          Ca[..., 7] - Cb[..., 8], Ca[..., 6] - Cb[..., 7],
                          -Cb[..., 6]], axis=-1)

    pairs = [(_ROW_X2Z, _ROW_X2), (_ROW_Y2Z, _ROW_Y2), (_ROW_XYZ, _ROW_XY)]
    bx = jnp.stack([kx(C[..., a, :], C[..., b, :]) for a, b in pairs], -2)
    by = jnp.stack([ky(C[..., a, :], C[..., b, :]) for a, b in pairs], -2)
    b1 = jnp.stack([k1(C[..., a, :], C[..., b, :]) for a, b in pairs], -2)
    return bx, by, b1


def _det_poly(bx, by, b1):
    """det of the 3x3 polynomial matrix [bx | by | b1] -> (S, 11)."""
    def m2(c0, c1, r0, r1):
        cols = (bx, by, b1)
        return _polymul(cols[c0][..., r0, :], cols[c1][..., r1, :]) - \
            _polymul(cols[c0][..., r1, :], cols[c1][..., r0, :])
    # expand along the b1 column (degree 4) times 2x2 minors of (bx, by)
    out = (_polymul(b1[..., 0, :], m2(0, 1, 1, 2))
           - _polymul(b1[..., 1, :], m2(0, 1, 0, 2))
           + _polymul(b1[..., 2, :], m2(0, 1, 0, 1)))
    return out                                                   # (S, 11)


def _homog_eval(c, t):
    """h(t) = sum_i c_i sin^i t cos^(10-i) t and dh/dt, branch-free.

    Horner form in whichever of tan t / cot t is <= 1 in magnitude:
      |sin| <= |cos|:  h = cos^10 P(tan t),
                       h' = cos^8 (P'(tan t) - 10 sin cos P(tan t))
      else:            h = sin^10 Q(cot t),   Q = reversed coeffs
                       h' = sin^8 (10 sin cos Q(cot t) - Q'(cot t))
    Two 10-step Horner chains (value + derivative fused) replace the 11
    separate integer_pow term stacks of the original evaluator AND give
    the derivative Newton needs for free. c: (..., 11); t broadcastable.
    """
    s, co = jnp.sin(t), jnp.cos(t)
    use_tan = jnp.abs(s) <= jnp.abs(co)
    denom = jnp.where(use_tan, co, s)
    x = jnp.where(use_tan, s, co) / jnp.where(
        jnp.abs(denom) < 1e-30, 1e-30, denom)

    def horner(coeffs_desc, x):
        # value and derivative in one pass
        p = jnp.zeros_like(x)
        dp = jnp.zeros_like(x)
        for a in coeffs_desc:
            dp = dp * x + p
            p = p * x + a
        return p, dp

    cs = [c[..., i] for i in range(11)]
    p_t, dp_t = horner(cs[::-1], x)          # P(tan t), P'(tan t)
    p_c, dp_c = horner(cs, x)                # Q(cot t), Q'(cot t)
    co2, s2 = co * co, s * s
    co8, s8 = (co2 * co2) ** 2, (s2 * s2) ** 2
    sc = s * co
    h = jnp.where(use_tan, co8 * co2 * p_t, s8 * s2 * p_c)
    dh = jnp.where(use_tan, co8 * (dp_t - 10.0 * sc * p_t),
                   s8 * (10.0 * sc * p_c - dp_c))
    return h, dh


def _real_roots_deg10(coeffs, n_grid: int = 256, n_bisect: int = 10,
                      n_newton: int = 3):
    """Real roots of ascending-coefficient degree-10 polynomials.

    coeffs: (S, 11). Returns (roots (S, 10), valid (S, 10)). Uses the
    homogenized evaluation n(tan t) * cos^10 t = sum c_i sin^i t
    cos^(10-i) t, which is finite and stable over t in (-pi/2, pi/2),
    so arbitrarily large real roots are found without scaling games.

    Round-5: the sequential depth is the measured cost (tools/
    bench_pose.py: 26 bisections = 6.5 of the 7.3 ms/batch RANSAC —
    tiny per-step kernels, latency-bound). Now n_bisect bisections
    shrink the grid bracket to ~3e-6, then n_newton bracket-clamped
    Newton steps (quadratic near a simple root; the grid cell isolates
    one sign change) reach f32 resolution — 13 sequential steps instead
    of 26, same accuracy (tests/test_fivepoint.py unchanged).
    """
    scale = jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True)
    c = coeffs / jnp.maximum(scale, 1e-30)

    def hterms(t):
        # integer_pow keeps negative sin bases exact (float exponents
        # of negative bases would be nan)
        s, co = jnp.sin(t), jnp.cos(t)
        return jnp.stack([s ** i * co ** (10 - i) for i in range(11)], -1)

    eps = 1e-4
    ts = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, n_grid,
                      dtype=coeffs.dtype)
    vals = c @ hterms(ts).T                                      # (S, G)
    sgn = jnp.sign(vals)
    change = (sgn[:, :-1] * sgn[:, 1:]) < 0                      # (S, G-1)

    def per_sample(ch, ci):
        # first <=10 bracketing cells, without jnp.nonzero: the batched
        # nonzero lowering measured 3.3 ms/batch on TPU (round-5
        # decomposition) vs ~0 for this cumsum + slot-argmax form
        pos = jnp.cumsum(ch) - 1                         # (G-1,)
        slot_hit = ch[:, None] & (pos[:, None] ==
                                  jnp.arange(10)[None, :])   # (G-1, 10)
        idx = jnp.argmax(slot_hit, axis=0)       # 0 when the slot is empty
        valid = jnp.any(slot_hit, axis=0)
        lo = ts[idx]
        hi = ts[idx + 1]

        def body(carry, _):
            lo, hi, f_lo = carry
            mid = 0.5 * (lo + hi)
            f_m, _ = _homog_eval(ci, mid)
            left = f_lo * f_m <= 0
            return (jnp.where(left, lo, mid), jnp.where(left, mid, hi),
                    jnp.where(left, f_lo, f_m)), None
        f_lo0, _ = _homog_eval(ci, lo)
        (lo, hi, _), _ = jax.lax.scan(body, (lo, hi, f_lo0), None,
                                      length=n_bisect)

        def newton(t, _):
            f, df = _homog_eval(ci, t)
            step = f / jnp.where(jnp.abs(df) < 1e-30, 1e-30, df)
            # clamp into the isolating bracket: a diverging step (near-
            # multiple root) degrades gracefully to the bracket bound
            return jnp.clip(t - step, lo, hi), None
        t, _ = jax.lax.scan(newton, 0.5 * (lo + hi), None,
                            length=n_newton)
        return jnp.tan(t), valid

    return jax.vmap(per_sample)(change, c)


def _solve_gj(A: jax.Array, B: jax.Array) -> jax.Array:
    """Batched A^{-1} B for tiny systems via unrolled Gauss-Jordan with
    partial pivoting.

    jnp.linalg.solve lowers to a blocked LAPACK-style LU whose control
    flow is hostile to tiny batched systems on TPU: the (B*S, 10, 10)
    solves of the 5-point reduction measured 3.6 ms/batch of the 7.3 ms
    RANSAC (round-5 decomposition). Ten unrolled eliminate steps of
    fully vectorized (batch, 10, 20) elementwise work replace it.
    Pivoting matches LU-pp stability; a singular pivot propagates
    inf/nan into C exactly like linalg.solve, which downstream candidate
    validity already detects. A: (..., n, n), B: (..., n, m).
    """
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)                 # (..., n, n+m)
    rows_done = jnp.zeros(A.shape[:-2] + (n,), bool)
    eye = jnp.eye(n, dtype=A.dtype)
    for k in range(n):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(rows_done, -jnp.inf, col)
        piv = jnp.argmax(col, axis=-1)                   # (...,)
        pk = jax.nn.one_hot(piv, n, dtype=A.dtype)       # (..., n)
        ek = eye[k]
        # swap rows k <-> piv (no-op when piv == k)
        Mk = M[..., k, :]
        Mp = jnp.einsum("...r,...rc->...c", pk, M)
        M = (M + ek[..., :, None] * (Mp - Mk)[..., None, :]
             + pk[..., :, None] * (Mk - Mp)[..., None, :])
        # normalize row k, eliminate everywhere else
        a = M[..., k, k][..., None]
        rowk = M[..., k, :] / a
        f = M[..., :, k] * (1.0 - ek)                    # keep row k
        M = M - f[..., :, None] * rowk[..., None, :]
        M = M + ek[..., :, None] * (rowk - M[..., k, :])[..., None, :]
        rows_done = rows_done | (jnp.arange(n) == k)
    return M[..., :, n:]


def five_point_candidates(p0: jax.Array, p1: jax.Array):
    """(S, 5, 2), (S, 5, 2) normalized correspondences ->
    (E (S, 10, 3, 3), valid (S, 10)): all real-root essential-matrix
    candidates of each minimal problem (unit Frobenius norm)."""
    basis = _nullspace_basis(p0, p1)                             # (S,4,3,3)
    M = _constraint_matrix(basis)                                # (S,10,20)
    Mp = M[..., jnp.asarray(_PERM)]
    A, B = Mp[..., :10], Mp[..., 10:]
    # guard singular leading blocks (degenerate samples): detectable via
    # non-finite C afterwards
    C = _solve_gj(A, B)                                          # (S,10,10)
    bx, by, b1 = _action_polys(C)
    n = _det_poly(bx, by, b1)                                    # (S, 11)
    z, valid = _real_roots_deg10(n)                              # (S, 10)

    # x, y from least squares over the three rows of B(z)
    zp4 = z[..., None] ** jnp.arange(4, dtype=z.dtype)           # (S,10,4)
    zp5 = z[..., None] ** jnp.arange(5, dtype=z.dtype)
    Ax = jnp.einsum("...rc,...kc->...kr", bx, zp4)               # (S,10,3)
    Ay = jnp.einsum("...rc,...kc->...kr", by, zp4)
    bz = -jnp.einsum("...rc,...kc->...kr", b1, zp5)
    # normal equations of the 3x2 system [Ax Ay] [x y]^T = bz
    axx = jnp.sum(Ax * Ax, -1)
    axy = jnp.sum(Ax * Ay, -1)
    ayy = jnp.sum(Ay * Ay, -1)
    bxs = jnp.sum(Ax * bz, -1)
    bys = jnp.sum(Ay * bz, -1)
    det = axx * ayy - axy * axy
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    x = (bxs * ayy - bys * axy) / det
    y = (axx * bys - axy * bxs) / det

    xyz1 = jnp.stack([x, y, z, jnp.ones_like(z)], axis=-1)       # (S,10,4)
    E = jnp.einsum("...kc,...cij->...kij", xyz1, basis)          # (S,10,3,3)
    norm = jnp.sqrt(jnp.sum(E * E, axis=(-2, -1), keepdims=True))
    E = E / jnp.maximum(norm, 1e-30)
    finite = jnp.isfinite(E).all(axis=(-2, -1))
    return E, valid & finite
