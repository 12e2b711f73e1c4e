"""Homography and fundamental-matrix estimation (DLT kernels + RANSAC).

Reference: findHomography with the 4-point DLT kernel + LM refinement
(calib3d/src/fundam.cpp:62-434), findFundamentalMat (:763) with run8Point
(:604). Same Gram-nullspace numerics as epipolar.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core.config import RansacConfig
from opencv_tpu.geometry import ransac as ransac_mod
from opencv_tpu.geometry.epipolar import (
    _hartley_normalize,
    _nullspace,
    eight_point,
    sampson_error,
)

_P32 = lax.Precision.HIGHEST


def dlt_homography(x1: jnp.ndarray, x2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized DLT homography from [N>=4,2] pairs: x2 ~ H x1.
    (HomographyEstimatorCallback::runKernel analog, fundam.cpp:62-213.)"""
    x1n, T1 = _hartley_normalize(x1)
    x2n, T2 = _hartley_normalize(x2)
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    one = jnp.ones_like(u1)
    zero = jnp.zeros_like(u1)
    r1 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([zero, zero, zero, u1, v1, one, -v2 * u1, -v2 * v1, -v2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2N, 9]
    h = _nullspace(A)
    Hn = h.reshape(3, 3)
    # denormalize: x2 = T2^-1 Hn T1 x1
    H = jnp.linalg.inv(T2) @ Hn @ T1
    ok = jnp.abs(H[2, 2]) > 1e-12
    H = H / jnp.where(ok, H[2, 2], 1.0)
    ok &= jnp.all(jnp.isfinite(H))
    return H, ok


def homography_transfer_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared forward transfer error |x2 - H(x1)|^2 (the reference's
    RANSAC cost, fundam.cpp computeError)."""
    ones = jnp.ones_like(x1[..., :1])
    p = jnp.concatenate([x1, ones], axis=-1) @ H.T
    w = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
    proj = p[..., :2] / w[..., None]
    return jnp.sum((proj - x2) ** 2, axis=-1)


def find_homography_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    cfg: RansacConfig = RansacConfig(threshold=3.0),
) -> ransac_mod.RansacResult:
    """findHomography(RANSAC) analog (fundam.cpp:350-434). threshold is
    LINEAR pixel distance; squared internally."""
    n = x1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    cfg2 = RansacConfig(cfg.n_hypotheses, cfg.threshold ** 2, cfg.confidence, cfg.seed)
    return ransac_mod.ransac(
        key, n, valid, 4,
        lambda idx: dlt_homography(x1[idx], x2[idx]),
        lambda H: homography_transfer_error(H, x1, x2),
        cfg2,
    )


def find_fundamental_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    cfg: RansacConfig = RansacConfig(threshold=1.0),
) -> ransac_mod.RansacResult:
    """findFundamentalMat(RANSAC) analog (fundam.cpp:763): 8-point kernel,
    Sampson error, LINEAR pixel threshold."""
    n = x1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    cfg2 = RansacConfig(cfg.n_hypotheses, cfg.threshold ** 2, cfg.confidence, cfg.seed)
    return ransac_mod.ransac(
        key, n, valid, 8,
        lambda idx: eight_point(x1[idx], x2[idx], essential=False),
        lambda F: sampson_error(F, x1, x2),
        cfg2,
    )
