"""Perspective-n-Point: DLT initialization + Gauss-Newton refinement +
batched RANSAC.

Reference: the solvePnP family (calib3d/src/solvepnp.cpp:115 front door;
EPnP epnp.cpp; P3P p3p.cpp; the ITERATIVE path = DLT/homography init +
CvLevMarq refine, calibration.cpp:969-1170) and the GPU batched-hypothesis
solvePnPRansac (cudalegacy/src/calib3d.cpp:152-260).

TPU-native choices: the minimal RANSAC kernel is a 6-point DLT (a single
batched 12x12 symmetric eigensolve per hypothesis — no polynomial systems
in f32), followed by vmapped Gauss-Newton on the winner's inliers with
jax-autodiff Jacobians (replacing the hand-written ones at
calibration.cpp:520-610).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core.config import RansacConfig
from opencv_tpu.geometry import ransac as ransac_mod
from opencv_tpu.geometry.rotation import project_to_rotation, rodrigues, rodrigues_inv

_P32 = lax.Precision.HIGHEST


def project_points(
    rvec: jnp.ndarray, tvec: jnp.ndarray, obj_pts: jnp.ndarray
) -> jnp.ndarray:
    """World [N,3] -> normalized image coords [N,2] through (rvec, tvec).
    (cvProjectPoints2 analog, calibration.cpp:520, without intrinsics —
    pixel conversion is the caller's affine step.)"""
    R = rodrigues(rvec)
    pc = obj_pts @ R.T + tvec
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    return pc[..., :2] / z[..., None]


def dlt_pnp(obj_pts: jnp.ndarray, img_pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Direct linear transform PnP on [N>=6,3]/[N,2] (normalized coords).

    Returns (rvec, tvec, ok). Solves for P [3,4] via the 12x12 Gram
    nullspace, fixes scale/sign by cheirality, projects onto SO(3).
    """
    n = obj_pts.shape[0]
    X = jnp.concatenate([obj_pts, jnp.ones((n, 1), obj_pts.dtype)], axis=1)  # [N,4]
    u, v = img_pts[:, 0], img_pts[:, 1]
    zeros = jnp.zeros_like(X)
    rows_u = jnp.concatenate([X, zeros, -u[:, None] * X], axis=1)  # [N,12]
    rows_v = jnp.concatenate([zeros, X, -v[:, None] * X], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # [2N,12]
    from opencv_tpu.geometry.epipolar import _nullspace
    p = _nullspace(A).reshape(3, 4)
    # cheirality: majority of depths positive, else flip sign
    depths = X @ p[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths)) >= 0, 1.0, -1.0)
    p = p * sign
    M = p[:, :3]
    scale = jnp.linalg.det(M)
    ok = jnp.abs(scale) > 1e-12
    scale = jnp.sign(scale) * jnp.abs(scale) ** (1.0 / 3.0)
    scale = jnp.where(ok, scale, 1.0)
    R = project_to_rotation(M / scale)
    t = p[:, 3] / scale
    ok &= jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    return rodrigues_inv(R), t, ok


def gn_refine_pose(
    rvec: jnp.ndarray,
    tvec: jnp.ndarray,
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 10,
    damping: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Gauss-Newton on reprojection error (the solvePnPRefineLM
    analog, solvepnp.cpp:476-693). weights: [N] (0 masks a point)."""

    def residuals(params):
        r = project_points(params[:3], params[3:], obj_pts) - img_pts
        return (r * weights[:, None]).reshape(-1)

    params = jnp.concatenate([rvec, tvec])

    def body(_, params):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)  # [2N, 6]
        H = jnp.einsum("ni,nj->ij", J, J, precision=_P32)
        g = J.T @ r
        H = H + damping * jnp.eye(6, dtype=H.dtype)
        step = jnp.linalg.solve(H, g)
        return params - step

    params = lax.fori_loop(0, iters, body, params)
    return params[:3], params[3:]


def refine_pose_vvs(
    rvec: jnp.ndarray,
    tvec: jnp.ndarray,
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    iters: int = 20,
    vvs_lambda: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """solvePnPRefineVVS analog (solvepnp.cpp:679-717): virtual visual
    servoing. Each iteration stacks the 2x6 point-feature interaction
    matrix L (Chaumette/Hutchinson form, solvepnp.cpp:529-566), takes the
    damped pseudo-inverse step dq = -lambda L^+ (s - s*), and composes the
    pose with the INVERSE SE(3) exponential of the twist
    (solvepnp.cpp:576-625, Eade's V-matrix closed form).

    img_pts are normalized (undistorted) coordinates, matching the
    reference's undistortPoints preprocessing. weights: [N] (0 masks).
    """
    from opencv_tpu.geometry.rotation import hat, rodrigues_inv

    n = obj_pts.shape[0]
    w = jnp.ones((n,)) if weights is None else weights
    sd = img_pts  # desired features s*

    def exp_se3_inv(twist):
        u, om = twist[:3], twist[3:]
        th2 = jnp.dot(om, om)
        th = jnp.sqrt(th2)
        small = th < 1e-8
        ths = jnp.where(small, 1.0, th)
        A = jnp.where(small, 1.0, jnp.sin(ths) / ths)
        B = jnp.where(small, 0.5, (1.0 - jnp.cos(ths)) / (ths * ths))
        C = jnp.where(small, 1.0 / 6.0, (1.0 - A) / (ths * ths))
        W = hat(om)
        R = jnp.eye(3) + A * W + B * (W @ W)
        V = jnp.eye(3) + B * W + C * (W @ W)
        R1 = R.T
        t1 = -R1 @ (V @ u)
        return R1, t1

    def body(_, state):
        R, t = state
        pc = obj_pts @ R.T + t  # [N,3]
        Z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        x = pc[:, 0] / Z
        y = pc[:, 1] / Z
        iz = 1.0 / Z
        zero = jnp.zeros_like(x)
        Lx = jnp.stack(
            [-iz, zero, x * iz, x * y, -(1.0 + x * x), y], axis=-1
        )
        Ly = jnp.stack(
            [zero, -iz, y * iz, 1.0 + y * y, -x * y, -x], axis=-1
        )
        L = jnp.stack([Lx, Ly], axis=1).reshape(2 * n, 6) * jnp.repeat(
            w, 2
        )[:, None]
        err = (jnp.stack([x, y], axis=-1) - sd) * w[:, None]
        e = err.reshape(-1)
        # damped pseudo-inverse step via normal equations
        H = jnp.einsum("ni,nj->ij", L, L, precision=_P32)
        H = H + 1e-12 * jnp.eye(6)
        dq = -vvs_lambda * jnp.linalg.solve(H, L.T @ e)
        R1, t1 = exp_se3_inv(dq)
        return R1 @ R, R1 @ t + t1

    R0 = rodrigues(rvec)
    R, t = lax.fori_loop(0, iters, body, (R0, tvec))
    return rodrigues_inv(R), t


class PnPResult(NamedTuple):
    rvec: jnp.ndarray
    tvec: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def solve_pnp_ransac(
    key: jax.Array,
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    cfg: RansacConfig = RansacConfig(threshold=2e-3),
    refine_iters: int = 10,
    kernel: str = "p3p",
    adaptive: bool = True,
) -> PnPResult:
    """solvePnPRansac analog (solvepnp.cpp:196; GPU shape
    cudalegacy/src/calib3d.cpp:211). Normalized image coords; threshold is
    LINEAR reprojection distance in normalized units (px / focal).
    Final pose is Gauss-Newton-refined on all inliers (solvepnp.cpp:312
    re-solves on the inlier set the same way).

    kernel: "p3p" (default; 4-point minimal sample — 3-point Grunert +
    disambiguation point, planar-safe, needs far fewer all-inlier samples
    at low inlier ratios), "epnp" (5-point samples through the O(n)
    solver, matching the reference solvePnPRansac's SOLVEPNP_EPNP model,
    solvepnp.cpp:233), or "dlt" (6-point, degenerate on coplanar samples
    — kept for comparison/tests)."""
    from opencv_tpu.geometry.p3p import p3p_kernel

    n = obj_pts.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    thr2 = cfg.threshold * cfg.threshold
    cfg2 = RansacConfig(
        n_hypotheses=cfg.n_hypotheses, threshold=thr2, confidence=cfg.confidence,
        seed=cfg.seed,
    )

    if kernel == "p3p":
        subset = 4

        def model_fn(idx):
            return p3p_kernel(obj_pts[idx], img_pts[idx])
    elif kernel == "epnp":
        from opencv_tpu.geometry.epnp import epnp_kernel

        subset = 5

        def model_fn(idx):
            return epnp_kernel(obj_pts[idx], img_pts[idx])
    else:
        subset = 6

        def model_fn(idx):
            rv, tv, ok = dlt_pnp(obj_pts[idx], img_pts[idx])
            return jnp.concatenate([rv, tv]), ok

    def error_fn(model):
        d = project_points(model[:3], model[3:], obj_pts) - img_pts
        return jnp.sum(d * d, axis=-1)

    driver = ransac_mod.ransac_adaptive if adaptive else ransac_mod.ransac
    res = driver(key, n, valid, subset, model_fn, error_fn, cfg2)
    rvec, tvec = res.model[:3], res.model[3:]
    w = res.inliers.astype(jnp.float32)
    rvec, tvec = gn_refine_pose(rvec, tvec, obj_pts, img_pts, w, refine_iters)
    # recompute inliers after refinement
    d = project_points(rvec, tvec, obj_pts) - img_pts
    err = jnp.sum(d * d, axis=-1)
    inliers = (err < thr2) & valid
    return PnPResult(
        rvec=rvec,
        tvec=tvec,
        inliers=inliers,
        n_inliers=jnp.sum(inliers),
        ok=res.ok,
    )
