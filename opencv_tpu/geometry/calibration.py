"""Camera calibration: Zhang closed-form init + joint LM refinement.

Reference: cvCalibrateCamera2Internal (calib3d/src/calibration.cpp:1298)
— per-view extrinsic init (:1557) then a global CvLevMarq over
intrinsics + all extrinsics (:1568-1614); distortion model of
cvProjectPoints2 (:520-610, radial k1..k3 + tangential p1 p2).

TPU-native: the projection model is one differentiable function; the
joint refinement jacfwd's through it (replacing ~600 lines of hand-coded
Jacobians), and all views' residuals evaluate as one batched call.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.geometry.homography import dlt_homography
from opencv_tpu.geometry.rotation import project_to_rotation, rodrigues, rodrigues_inv
from opencv_tpu.optim.levmarq import levmarq

_P32 = lax.Precision.HIGHEST


def distort(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply (k1, k2, p1, p2, k3) distortion to normalized coords [...,2]
    (cvProjectPoints2 model, calibration.cpp:520)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xt = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yt = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xt, yt], axis=-1)


def project_points_full(
    rvec: jnp.ndarray, tvec: jnp.ndarray, K4: jnp.ndarray, dist: jnp.ndarray,
    obj_pts: jnp.ndarray,
) -> jnp.ndarray:
    """World [N,3] -> pixel coords [N,2]. K4 = (fx, fy, cx, cy)."""
    R = rodrigues(rvec)
    pc = obj_pts @ R.T + tvec
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    xy = pc[..., :2] / z[..., None]
    xd = distort(xy, dist)
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    return jnp.stack([xd[..., 0] * fx + cx, xd[..., 1] * fy + cy], axis=-1)


def undistort_points(
    pts: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Pixel coords -> undistorted normalized coords (cv::undistortPoints,
    fixed-point inversion of the distortion model)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = jnp.stack([(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1)

    def body(_, x):
        # invert radial/tangential by fixed-point: x = (xd - tang(x)) / radial(x)
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        r2 = jnp.sum(x * x, axis=-1)
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
        dx = jnp.stack(
            [
                2.0 * p1 * x[..., 0] * x[..., 1] + p2 * (r2 + 2.0 * x[..., 0] ** 2),
                p1 * (r2 + 2.0 * x[..., 1] ** 2) + 2.0 * p2 * x[..., 0] * x[..., 1],
            ],
            axis=-1,
        )
        return (xd - dx) / radial[..., None]

    return lax.fori_loop(0, iters, body, xd)


def _zhang_intrinsics(homographies: list[np.ndarray]) -> np.ndarray:
    """Closed-form K init from planar-target homographies (Zhang 2000;
    the role of cvCalibrateCamera2's init path)."""

    def v(h, i, j):
        return np.array(
            [
                h[0, i] * h[0, j],
                h[0, i] * h[1, j] + h[1, i] * h[0, j],
                h[1, i] * h[1, j],
                h[2, i] * h[0, j] + h[0, i] * h[2, j],
                h[2, i] * h[1, j] + h[1, i] * h[2, j],
                h[2, i] * h[2, j],
            ]
        )

    rows = []
    for h in homographies:
        rows.append(v(h, 0, 1))
        rows.append(v(h, 0, 0) - v(h, 1, 1))
    V = np.stack(rows)
    _, _, vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return np.array([fx, fy, cx, cy], np.float32)


def _extrinsics_from_h(h: np.ndarray, K4: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    Kinv = np.linalg.inv(
        np.array([[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1]], np.float64)
    )
    a = Kinv @ h
    s = 1.0 / np.linalg.norm(a[:, 0])
    if a[2, 2] * s < 0:  # keep target in front of the camera
        s = -s
    r1 = a[:, 0] * s
    r2 = a[:, 1] * s
    t = a[:, 2] * s
    r3 = np.cross(r1, r2)
    R = np.asarray(
        project_to_rotation(jnp.asarray(np.stack([r1, r2, r3], 1), jnp.float32))
    )
    rv = np.asarray(rodrigues_inv(jnp.asarray(R)))
    return rv.astype(np.float32), t.astype(np.float32)


class CalibrationResult(NamedTuple):
    K: np.ndarray  # [3,3]
    dist: np.ndarray  # [5]
    rvecs: np.ndarray  # [V,3]
    tvecs: np.ndarray  # [V,3]
    rms: float  # RMS reprojection error (px)


def calibrate_camera(
    obj_pts: np.ndarray,  # [V, N, 3] planar target points (z = 0)
    img_pts: np.ndarray,  # [V, N, 2] observed pixels
    refine_iters: int = 40,
) -> CalibrationResult:
    """cv::calibrateCamera analog for a planar target."""
    V, N, _ = obj_pts.shape
    homs = []
    for v_ in range(V):
        H, ok = dlt_homography(
            jnp.asarray(obj_pts[v_, :, :2]), jnp.asarray(img_pts[v_])
        )
        homs.append(np.asarray(H, np.float64))
    K4 = _zhang_intrinsics(homs)
    rvecs, tvecs = zip(*[_extrinsics_from_h(h, K4) for h in homs])
    rvecs = np.stack(rvecs)
    tvecs = np.stack(tvecs)

    obj_j = jnp.asarray(obj_pts)
    img_j = jnp.asarray(img_pts)

    def residual(params):
        K4_ = params[:4]
        dist_ = params[4:9]
        rv = params[9 : 9 + 3 * V].reshape(V, 3)
        tv = params[9 + 3 * V :].reshape(V, 3)
        proj = jax.vmap(
            lambda r, t, o: project_points_full(r, t, K4_, dist_, o)
        )(rv, tv, obj_j)
        return (proj - img_j).reshape(-1)

    x0 = jnp.concatenate(
        [
            jnp.asarray(K4),
            jnp.zeros(5),
            jnp.asarray(rvecs).reshape(-1),
            jnp.asarray(tvecs).reshape(-1),
        ]
    )
    res = levmarq(residual, x0, iters=refine_iters)
    p = np.asarray(res.params)
    rms = float(np.sqrt(2.0 * float(res.cost) / (V * N)))
    K = np.array(
        [[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1]], np.float32
    )
    return CalibrationResult(
        K=K,
        dist=p[4:9].astype(np.float32),
        rvecs=p[9 : 9 + 3 * V].reshape(V, 3).astype(np.float32),
        tvecs=p[9 + 3 * V :].reshape(V, 3).astype(np.float32),
        rms=rms,
    )


# ------------------------------------------------------------- fisheye


def fisheye_distort(xy: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Equidistant fisheye model (cv::fisheye, calib3d/src/fisheye.cpp):
    normalized pinhole coords -> distorted normalized coords.
    th_d = th (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)."""
    r = jnp.sqrt(jnp.sum(xy * xy, axis=-1))
    th = jnp.arctan(r)
    th2 = th * th
    th_d = th * (
        1.0 + k[0] * th2 + k[1] * th2**2 + k[2] * th2**3 + k[3] * th2**4
    )
    scale = jnp.where(r > 1e-9, th_d / jnp.maximum(r, 1e-9), 1.0)
    return xy * scale[..., None]


def fisheye_undistort(
    xy_d: jnp.ndarray, k: jnp.ndarray, iters: int = 10
) -> jnp.ndarray:
    """Invert fisheye_distort by Newton on theta (fisheye.cpp
    undistortPoints's fixed-point loop)."""
    r_d = jnp.sqrt(jnp.sum(xy_d * xy_d, axis=-1))

    def body(_, th):
        th2 = th * th
        f = th * (
            1.0 + k[0] * th2 + k[1] * th2**2 + k[2] * th2**3 + k[3] * th2**4
        ) - r_d
        df = (
            1.0 + 3 * k[0] * th2 + 5 * k[1] * th2**2
            + 7 * k[2] * th2**3 + 9 * k[3] * th2**4
        )
        return th - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)

    th = lax.fori_loop(0, iters, body, r_d)
    scale = jnp.where(r_d > 1e-9, jnp.tan(th) / jnp.maximum(r_d, 1e-9), 1.0)
    return xy_d * scale[..., None]


def fisheye_project_points(
    rvec: jnp.ndarray, tvec: jnp.ndarray, K4: jnp.ndarray, k: jnp.ndarray,
    obj_pts: jnp.ndarray,
) -> jnp.ndarray:
    """World [N,3] -> fisheye pixel coords [N,2]."""
    R = rodrigues(rvec)
    pc = obj_pts @ R.T + tvec
    z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    xy = pc[..., :2] / z[..., None]
    xd = fisheye_distort(xy, k)
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    return jnp.stack([xd[..., 0] * fx + cx, xd[..., 1] * fy + cy], axis=-1)


def calibrate_fisheye(
    obj_pts: np.ndarray,  # [V, N, 3] planar target (z = 0)
    img_pts: np.ndarray,  # [V, N, 2]
    refine_iters: int = 60,
) -> CalibrationResult:
    """cv::fisheye::calibrate analog: Zhang init on the (mildly wrong)
    pinhole homographies, then joint autodiff LM over (fx fy cx cy,
    k1..k4, all extrinsics) through the equidistant model — the same
    one-residual-function design as calibrate_camera, different lens
    map. Returns dist of length 4 (k1..k4)."""
    V, N, _ = obj_pts.shape
    homs = []
    for v_ in range(V):
        H, ok = dlt_homography(
            jnp.asarray(obj_pts[v_, :, :2]), jnp.asarray(img_pts[v_])
        )
        homs.append(np.asarray(H, np.float64))
    K4 = _zhang_intrinsics(homs)
    rvecs, tvecs = zip(*[_extrinsics_from_h(h, K4) for h in homs])

    obj_j = jnp.asarray(obj_pts)
    img_j = jnp.asarray(img_pts)

    def residual(params):
        K4_ = params[:4]
        k_ = params[4:8]
        rv = params[8 : 8 + 3 * V].reshape(V, 3)
        tv = params[8 + 3 * V :].reshape(V, 3)
        proj = jax.vmap(
            lambda r, t, o: fisheye_project_points(r, t, K4_, k_, o)
        )(rv, tv, obj_j)
        return (proj - img_j).reshape(-1)

    x0 = jnp.concatenate(
        [
            jnp.asarray(K4),
            jnp.zeros(4),
            jnp.asarray(np.stack(rvecs)).reshape(-1),
            jnp.asarray(np.stack(tvecs)).reshape(-1),
        ]
    )
    res = levmarq(residual, x0, iters=refine_iters)
    p = np.asarray(res.params)
    rms = float(np.sqrt(2.0 * float(res.cost) / (V * N)))
    K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1]], np.float32)
    return CalibrationResult(
        K=K,
        dist=p[4:8].astype(np.float32),
        rvecs=p[8 : 8 + 3 * V].reshape(V, 3).astype(np.float32),
        tvecs=p[8 + 3 * V :].reshape(V, 3).astype(np.float32),
        rms=rms,
    )
