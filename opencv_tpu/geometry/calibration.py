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


# ------------------------------------------------- stereo calibration


class StereoCalibrationResult(NamedTuple):
    R: np.ndarray  # [3,3] rotation cam1 -> cam2
    T: np.ndarray  # [3] translation cam1 -> cam2
    E: np.ndarray  # [3,3] essential matrix
    F: np.ndarray  # [3,3] fundamental matrix
    rvecs: np.ndarray  # [V,3] per-view cam1 extrinsics
    tvecs: np.ndarray  # [V,3]
    rms: float  # RMS reprojection error over both cameras (px)


def stereo_calibrate(
    obj_pts: np.ndarray,  # [V, N, 3] planar target points (z = 0)
    img_pts1: np.ndarray,  # [V, N, 2] pixels in camera 1
    img_pts2: np.ndarray,  # [V, N, 2] pixels in camera 2
    K1: np.ndarray, dist1: np.ndarray,
    K2: np.ndarray, dist2: np.ndarray,
    refine_iters: int = 60,
) -> StereoCalibrationResult:
    """cv::stereoCalibrate analog with fixed intrinsics (the
    CALIB_FIX_INTRINSIC mode — intrinsics come from per-camera
    `calibrate_camera`; reference: calib3d/src/calibration.cpp:2234,
    impl :1759).

    Jointly estimates the fixed rig transform (R, T): cam2 = R·cam1 + T,
    plus per-view cam1 extrinsics, by LM over the stacked two-camera
    reprojection residual — the TPU-first replacement for the
    reference's CvLevMarq loop with numeric Jacobians (autodiff J, one
    batched residual over all views·points·cameras).

    Initialization: per-view planar extrinsics for each camera from the
    undistorted-normalized homography (Zhang), then the chordal mean of
    the per-view relative rotations (projected back to SO(3)) and the
    mean relative translation — the same averaging idea as the
    reference's per-view accumulation (calibration.cpp:1852-1905).
    """
    obj_pts = np.asarray(obj_pts, np.float32)
    V, N, _ = obj_pts.shape
    K1 = np.asarray(K1, np.float32)
    K2 = np.asarray(K2, np.float32)
    dist1 = np.zeros(5, np.float32) if dist1 is None else np.asarray(dist1, np.float32)
    dist2 = np.zeros(5, np.float32) if dist2 is None else np.asarray(dist2, np.float32)

    def view_extrinsics(img_pts, K, dist):
        rvs, tvs = [], []
        norm = np.asarray(
            undistort_points(jnp.asarray(img_pts), jnp.asarray(K), jnp.asarray(dist))
        )
        for v in range(V):
            H, _ = dlt_homography(
                jnp.asarray(obj_pts[v, :, :2]), jnp.asarray(norm[v])
            )
            rv, tv = _extrinsics_from_h(
                np.asarray(H, np.float64), np.array([1.0, 1.0, 0.0, 0.0])
            )
            rvs.append(rv)
            tvs.append(tv)
        return np.stack(rvs), np.stack(tvs)

    rv1, tv1 = view_extrinsics(img_pts1, K1, dist1)
    rv2, tv2 = view_extrinsics(img_pts2, K2, dist2)
    # per-view relative pose, chordal-averaged
    R1s = np.asarray(_np_batch_rodrigues(rv1))
    R2s = np.asarray(_np_batch_rodrigues(rv2))
    R_rels = np.einsum("vij,vkj->vik", R2s, R1s)  # R2 R1^T
    R0 = np.asarray(
        project_to_rotation(jnp.asarray(R_rels.mean(axis=0), jnp.float32))
    )
    T0 = (tv2 - np.einsum("ij,vj->vi", R0, tv1)).mean(axis=0)

    K4_1 = jnp.asarray([K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2]])
    K4_2 = jnp.asarray([K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2]])
    d1 = jnp.asarray(dist1)
    d2 = jnp.asarray(dist2)
    obj_j = jnp.asarray(obj_pts)
    img1_j = jnp.asarray(img_pts1, jnp.float32)
    img2_j = jnp.asarray(img_pts2, jnp.float32)

    def residual(params):
        rel_rv = params[:3]
        rel_tv = params[3:6]
        rv = params[6 : 6 + 3 * V].reshape(V, 3)
        tv = params[6 + 3 * V :].reshape(V, 3)
        R_rel = rodrigues(rel_rv)

        def one(rv_v, tv_v, obj_v, i1_v, i2_v):
            p1 = project_points_full(rv_v, tv_v, K4_1, d1, obj_v)
            R2 = R_rel @ rodrigues(rv_v)
            t2 = R_rel @ tv_v + rel_tv
            p2 = project_points_full(rodrigues_inv(R2), t2, K4_2, d2, obj_v)
            return jnp.concatenate([p1 - i1_v, p2 - i2_v], axis=0)

        return jax.vmap(one)(rv, tv, obj_j, img1_j, img2_j).reshape(-1)

    x0 = jnp.concatenate(
        [
            jnp.asarray(rodrigues_inv(jnp.asarray(R0))),
            jnp.asarray(T0, jnp.float32),
            jnp.asarray(rv1, jnp.float32).reshape(-1),
            jnp.asarray(tv1, jnp.float32).reshape(-1),
        ]
    )
    res = levmarq(residual, x0, iters=refine_iters)
    p = np.asarray(res.params)
    rms = float(np.sqrt(2.0 * float(res.cost) / (2 * V * N)))
    R = np.asarray(rodrigues(jnp.asarray(p[:3])), np.float32)
    T = p[3:6].astype(np.float32)
    tx = np.array(
        [[0, -T[2], T[1]], [T[2], 0, -T[0]], [-T[1], T[0], 0]], np.float32
    )
    E = tx @ R
    F = np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)
    F = F / (F[2, 2] if abs(F[2, 2]) > 1e-12 else 1.0)
    return StereoCalibrationResult(
        R=R, T=T, E=E, F=F.astype(np.float32),
        rvecs=p[6 : 6 + 3 * V].reshape(V, 3).astype(np.float32),
        tvecs=p[6 + 3 * V :].reshape(V, 3).astype(np.float32),
        rms=rms,
    )


def _np_batch_rodrigues(rvecs: np.ndarray) -> np.ndarray:
    return np.asarray(jax.vmap(rodrigues)(jnp.asarray(rvecs, jnp.float32)))


# --------------------------------------- undistortion map / whole image


def init_undistort_rectify_map(
    K: jnp.ndarray,
    dist: jnp.ndarray,
    R: jnp.ndarray | None,
    new_K: jnp.ndarray,
    size: tuple[int, int],
) -> jnp.ndarray:
    """cv::initUndistortRectifyMap analog (reference:
    imgproc/src/undistort.simd.hpp:60): build the [H, W, 2] (x, y) map
    that, fed to core.imgproc.remap, produces the undistorted (and
    optionally rectified) image.

    For every destination pixel (u, v): back-project through new_K,
    rotate by R^-1 (rectification), apply the distortion model, and
    project through K. Pure fused VPU math over the pixel grid — the
    reference's row loop becomes one [H, W] batch.
    """
    h, w = size
    K = jnp.asarray(K, jnp.float32)
    new_K = jnp.asarray(new_K, jnp.float32)
    dist = jnp.zeros(5, jnp.float32) if dist is None else jnp.asarray(dist, jnp.float32)
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    x = (xs - new_K[0, 2]) / new_K[0, 0]
    y = (ys - new_K[1, 2]) / new_K[1, 1]
    if R is not None:
        Rinv = jnp.linalg.inv(jnp.asarray(R, jnp.float32))
        X = Rinv[0, 0] * x + Rinv[0, 1] * y + Rinv[0, 2]
        Y = Rinv[1, 0] * x + Rinv[1, 1] * y + Rinv[1, 2]
        Wc = Rinv[2, 0] * x + Rinv[2, 1] * y + Rinv[2, 2]
        x = X / Wc
        y = Y / Wc
    xd = distort(jnp.stack([x, y], axis=-1), dist)
    map_x = xd[..., 0] * K[0, 0] + K[0, 2]
    map_y = xd[..., 1] * K[1, 1] + K[1, 2]
    return jnp.stack([map_x, map_y], axis=-1)


def undistort_image(
    img: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray,
    new_K: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """cv::undistort analog: whole-image undistortion = the rectify map
    with R = I composed with bilinear remap (undistort.simd.hpp's
    public entry is exactly initUndistortRectifyMap + remap)."""
    from opencv_tpu.core.imgproc import remap

    h, w = img.shape[-2:]
    m = init_undistort_rectify_map(
        K, dist, None, K if new_K is None else new_K, (h, w)
    )
    return remap(img, m)
