"""Rotation parameterizations: Rodrigues exp/log with Taylor guards.

Analog of cvRodrigues2 (reference: calib3d/src/calibration.cpp:251), the
building block of every pose optimizer. Closed forms are written to be
jax-differentiable (jacfwd through them gives the reference's hand-coded
3x9 Jacobians for free); small-angle branches use Taylor series selected
with `jnp.where` so gradients stay finite at theta = 0.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [...,3] -> [...,3,3] with hat(v) @ x = v cross x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [...,3] -> rotation matrix [...,3,3] (exp map).

    R = I + sinc(θ)·K + (1-cos θ)/θ² · K²  with K = hat(rvec).
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(rvec)
    k2 = k @ k
    # guarded coefficients with Taylor fallbacks near 0
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(1e-16))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), k.shape)
    return eye + a * k + b * k2


def rodrigues_inv(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [...,3,3] -> axis-angle [...,3] (log map).

    Stable away from θ = π (good enough for incremental VO poses; the
    reference's cvRodrigues2 has the same practical domain).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # |w| = 2 sin θ, tr - 1 = 2 cos θ  ⇒  θ = atan2(|w|, tr-1).
    # atan2 (unlike arccos) has bounded derivatives near θ = 0, which
    # keeps jacfwd through pose-graph residuals finite. The double-where
    # guards keep the sqrt/divide gradients off the singular branch.
    s2 = jnp.sum(w * w, axis=-1)
    small = s2 < 1e-12
    s_safe = jnp.sqrt(jnp.where(small, 1.0, s2))
    theta = jnp.arctan2(jnp.where(small, 0.0, s_safe), tr - 1.0)
    # rvec = w * θ / |w|;  θ/|w| → 1/2 as θ → 0
    scale = jnp.where(small, 0.5 + s2 / 24.0, theta / jnp.where(small, 1.0, 2.0 * jnp.sin(theta) + 1e-30))
    near_pi = theta > jnp.pi - 1e-3
    # near π: axis from diagonal of (R + I)/2
    axis2 = jnp.clip((jnp.diagonal(R, axis1=-2, axis2=-1) + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    # fix signs using off-diagonal sums
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] < 0, -1.0, 1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] < 0, -1.0, 1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] < 0, -1.0, 1.0)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    pi_vec = axis * theta[..., None]
    return jnp.where(near_pi[..., None], pi_vec, w * scale[..., None])


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of [..., 3, 3] — pure elementwise
    math, so thousands of batched inverses cost microseconds on the VPU
    (jnp.linalg.inv lowers to an LU loop that is ~100x slower for tiny
    batched matrices on TPU)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def solve3(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve via the adjugate inverse. M [...,3,3], b [...,3]."""
    return jnp.einsum("...ij,...j->...i", _inv3(M), b)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
    return r


def project_to_rotation(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation (Frobenius) — R = U diag(1,1,det) Vt — WITHOUT
    an SVD: Horn's quaternion method. The optimal R maximizes tr(R^T M),
    whose solution is the dominant eigenvector of Horn's 4x4 symmetric
    matrix K(M); a shifted power iteration (~25 batched 4x4 matvecs)
    extracts it. Intrinsically proper (det +1) and rank-deficiency-safe
    (Kabsch on 3 centered points is ALWAYS rank 2). Motivation:
    jnp.linalg.svd on [1024,3,3] is a multi-millisecond TPU loop; this
    is pure fused VPU math."""
    dtype = M.dtype
    H = M.astype(jnp.float32)
    sxx, sxy, sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    syx, syy, syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    szx, szy, szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    K = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, szy - syz, sxz - szx, syx - sxy], -1),
            jnp.stack([szy - syz, sxx - syy - szz, sxy + syx, sxz + szx], -1),
            jnp.stack([sxz - szx, sxy + syx, syy - sxx - szz, syz + szy], -1),
            jnp.stack([syx - sxy, sxz + szx, syz + szy, szz - sxx - syy], -1),
        ],
        -2,
    )  # [..., 4, 4] symmetric; R = R(q) for q = dominant eigvec
    # QCP (Theobald) largest-eigenvalue extraction: K is traceless, so
    # char(lambda) = l^4 + c2 l^2 + c1 l + c0 with coefficients from
    # power traces; Newton from the upper bound sqrt(tr(K^2)) converges
    # monotonically to lambda_max (power iteration alone stalls when the
    # top two eigenvalues nearly tie — Newton on the quartic does not).
    K2 = jnp.einsum("...ij,...jk->...ik", K, K)
    p2 = jnp.trace(K2, axis1=-2, axis2=-1)
    K3 = jnp.einsum("...ij,...jk->...ik", K2, K)
    p3 = jnp.trace(K3, axis1=-2, axis2=-1)
    p4 = jnp.trace(
        jnp.einsum("...ij,...jk->...ik", K2, K2), axis1=-2, axis2=-1
    )
    c2 = -0.5 * p2
    c1 = -p3 / 3.0
    c0 = p2 * p2 / 8.0 - p4 / 4.0
    lam = jnp.sqrt(jnp.maximum(p2, 1e-20))
    for _ in range(25):
        f = ((lam * lam + c2) * lam + c1) * lam + c0
        fp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        lam = lam - f / jnp.where(jnp.abs(fp) < 1e-12, 1e-12, fp)

    # eigenvector = dominant column of adj(K - lam I)
    A = K - lam[..., None, None] * jnp.eye(4, dtype=jnp.float32)

    def det3(r0, r1, r2, cs):
        a, b, c = cs
        return (
            A[..., r0, a] * (A[..., r1, b] * A[..., r2, c]
                             - A[..., r1, c] * A[..., r2, b])
            - A[..., r0, b] * (A[..., r1, a] * A[..., r2, c]
                               - A[..., r1, c] * A[..., r2, a])
            + A[..., r0, c] * (A[..., r1, a] * A[..., r2, b]
                               - A[..., r1, b] * A[..., r2, a])
        )

    rows = [0, 1, 2, 3]
    cols = [0, 1, 2, 3]
    adj_cols = []
    for j in range(4):  # adj(A)[:, j] ~ cofactors of row j
        col = []
        rsub = [r for r in rows if r != j]
        for i in range(4):
            csub = [c for c in cols if c != i]
            sign = (-1.0) ** (i + j)
            col.append(sign * det3(rsub[0], rsub[1], rsub[2], tuple(csub)))
        adj_cols.append(jnp.stack(col, -1))  # [..., 4] = column j of adj
    cand = jnp.stack(adj_cols, -1)  # [..., 4(vec), 4(col)]
    nrm2 = jnp.sum(cand * cand, axis=-2)
    best = jnp.argmax(nrm2, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None], -1)[..., 0]
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    # degenerate (H ~ 0 or eigenvalue multiplicity): identity rotation
    q = jnp.where(qn > 1e-12, q / jnp.maximum(qn, 1e-20),
                  jnp.asarray([1.0, 0, 0, 0], jnp.float32))
    return quat_to_matrix(q).astype(dtype)
