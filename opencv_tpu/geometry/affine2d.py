"""Robust 2D affine / similarity estimation.

Analog of cv::estimateAffine2D / cv::estimateAffinePartial2D
(reference: calib3d/src/ptsetreg.cpp:821 `Affine2DEstimatorCallback`,
:895 `AffinePartial2DEstimatorCallback`), built on the repo's batched
RANSAC driver (geometry/ransac.py — the GPU batch-hypotheses pattern,
not the reference's sequential loop) with a closed-form least-squares
refit on the inlier set (the reference refines with LMSolver; for a
LINEAR model the weighted normal equations give the exact optimum in
one step, so no iteration is needed).

estimate_affine_2d: full 6-dof affine, 3-point minimal sample.
estimate_affine_partial_2d: 4-dof similarity (rotation, uniform scale,
translation), 2-point minimal sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opencv_tpu.core.config import RansacConfig
from opencv_tpu.geometry import ransac as ransac_mod


class Affine2DResult(NamedTuple):
    M: jnp.ndarray  # [2,3] affine matrix (None-analog: ok=False)
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _solve_affine_ls(src, dst, w):
    """Weighted least-squares affine: rows [x y 1] -> dst. Returns
    ([2,3], ok). Normal equations on the 3x3 Gram matrix (shared by
    both output rows — the structure the reference's run() exploits,
    ptsetreg.cpp:900)."""
    ones = jnp.ones_like(src[:, :1])
    A = jnp.concatenate([src, ones], axis=1) * w[:, None]  # [N,3]
    G = A.T @ (jnp.concatenate([src, ones], axis=1))  # [3,3]
    bx = A.T @ dst[:, 0]
    by = A.T @ dst[:, 1]
    det_ok = jnp.abs(jnp.linalg.det(G)) > 1e-8
    Gs = jnp.where(det_ok, 1.0, 0.0) * G + jnp.where(det_ok, 0.0, 1.0) * jnp.eye(3)
    sol = jnp.linalg.solve(Gs, jnp.stack([bx, by], axis=1))  # [3,2]
    return sol.T, det_ok


def _solve_similarity_ls(src, dst, w):
    """Weighted least-squares similarity [[a,-b],[b,a]] + t (4 dof;
    ptsetreg.cpp:939's closed form, batched)."""
    sw = jnp.sum(w) + 1e-12
    mu_s = jnp.sum(src * w[:, None], axis=0) / sw
    mu_d = jnp.sum(dst * w[:, None], axis=0) / sw
    sc = src - mu_s
    dc = dst - mu_d
    denom = jnp.sum(w * jnp.sum(sc * sc, axis=1))
    a = jnp.sum(w * jnp.sum(sc * dc, axis=1))
    b = jnp.sum(w * (sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0]))
    ok = denom > 1e-12
    denom = jnp.where(ok, denom, 1.0)
    a = a / denom
    b = b / denom
    t = mu_d - jnp.array([a * mu_s[0] - b * mu_s[1], b * mu_s[0] + a * mu_s[1]])
    M = jnp.array([[a, -b, t[0]], [b, a, t[1]]])
    return M, ok


def _apply(M, pts):
    return pts @ M[:, :2].T + M[:, 2]


def estimate_affine_2d(
    key: jax.Array,
    src: jnp.ndarray,  # [N,2]
    dst: jnp.ndarray,  # [N,2]
    valid: jnp.ndarray | None = None,
    threshold: float = 3.0,  # pixels (cv default ransacReprojThreshold)
    cfg: RansacConfig | None = None,
) -> Affine2DResult:
    """cv::estimateAffine2D analog (ptsetreg.cpp:821). threshold is the
    LINEAR pixel distance bound; the final model is the least-squares
    refit on the RANSAC consensus set, with the inlier mask recomputed
    against it (matching the reference's refine + mask semantics)."""
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if cfg is None:
        cfg = RansacConfig(n_hypotheses=512, threshold=threshold)
    thr2 = cfg.threshold * cfg.threshold

    def model_fn(idx):
        s, d = src[idx], dst[idx]
        M, ok = _solve_affine_ls(s, d, jnp.ones(idx.shape[0]))
        return M.reshape(-1), ok

    def error_fn(model):
        M = model.reshape(2, 3)
        e = _apply(M, src) - dst
        return jnp.sum(e * e, axis=-1)

    res = ransac_mod.ransac(
        key, n, valid, 3, model_fn, error_fn,
        RansacConfig(cfg.n_hypotheses, thr2, cfg.confidence, cfg.seed),
    )
    w = res.inliers.astype(jnp.float32)
    M, _ = _solve_affine_ls(src, dst, w)
    e = _apply(M, src) - dst
    inl = (jnp.sum(e * e, axis=-1) < thr2) & valid
    return Affine2DResult(
        M=M, inliers=inl, n_inliers=jnp.sum(inl), ok=res.ok
    )


def estimate_affine_partial_2d(
    key: jax.Array,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    threshold: float = 3.0,
    cfg: RansacConfig | None = None,
) -> Affine2DResult:
    """cv::estimateAffinePartial2D analog (ptsetreg.cpp:895): rotation +
    uniform scale + translation only (4 dof)."""
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if cfg is None:
        cfg = RansacConfig(n_hypotheses=512, threshold=threshold)
    thr2 = cfg.threshold * cfg.threshold

    def model_fn(idx):
        s, d = src[idx], dst[idx]
        M, ok = _solve_similarity_ls(s, d, jnp.ones(idx.shape[0]))
        return M.reshape(-1), ok

    def error_fn(model):
        M = model.reshape(2, 3)
        e = _apply(M, src) - dst
        return jnp.sum(e * e, axis=-1)

    res = ransac_mod.ransac(
        key, n, valid, 2, model_fn, error_fn,
        RansacConfig(cfg.n_hypotheses, thr2, cfg.confidence, cfg.seed),
    )
    w = res.inliers.astype(jnp.float32)
    M, _ = _solve_similarity_ls(src, dst, w)
    e = _apply(M, src) - dst
    inl = (jnp.sum(e * e, axis=-1) < thr2) & valid
    return Affine2DResult(
        M=M, inliers=inl, n_inliers=jnp.sum(inl), ok=res.ok
    )
