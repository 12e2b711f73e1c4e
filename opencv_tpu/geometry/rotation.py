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


def project_to_rotation(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix (Frobenius) via SVD: R = U diag(1,1,det) Vt."""
    u, _, vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(u @ vt)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return u @ (d[..., :, None] * vt)
