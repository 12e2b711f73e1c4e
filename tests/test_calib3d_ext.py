"""cv2-gold tests for the round-5 calib3d surface additions:
stereo_calibrate (calibration.cpp:2234), init_undistort_rectify_map +
undistort_image (undistort.simd.hpp:60), estimate_affine_2d /
estimate_affine_partial_2d (ptsetreg.cpp:821,895)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_tpu.geometry import affine2d, calibration

cv2 = pytest.importorskip("cv2")


# ------------------------------------------------------------- helpers


def chessboard_views(n_views, rng, K, dist, R_stereo=None, T_stereo=None):
    """Render exact pixel observations of a planar 7x9 grid from random
    poses (and optionally through a second, rigidly-attached camera)."""
    gx, gy = np.meshgrid(np.arange(9, dtype=np.float32),
                         np.arange(7, dtype=np.float32))
    obj = np.stack([gx.ravel() * 0.03, gy.ravel() * 0.03,
                    np.zeros(63, np.float32)], axis=1)
    views_obj, views_1, views_2 = [], [], []
    for _ in range(n_views):
        rvec = rng.normal(0, 0.25, 3)
        tvec = np.array([rng.normal(0, 0.05), rng.normal(0, 0.05),
                         rng.uniform(0.5, 0.9)])
        p1, _ = cv2.projectPoints(obj.astype(np.float64), rvec, tvec,
                                  K.astype(np.float64),
                                  dist.astype(np.float64))
        views_obj.append(obj)
        views_1.append(p1.reshape(-1, 2).astype(np.float32))
        if R_stereo is not None:
            R1 = cv2.Rodrigues(rvec)[0]
            rv2 = cv2.Rodrigues(R_stereo @ R1)[0].ravel()
            tv2 = R_stereo @ tvec + T_stereo
            p2, _ = cv2.projectPoints(obj.astype(np.float64), rv2, tv2,
                                      K.astype(np.float64),
                                      dist.astype(np.float64))
            views_2.append(p2.reshape(-1, 2).astype(np.float32))
    return (np.stack(views_obj), np.stack(views_1),
            np.stack(views_2) if views_2 else None)


# ------------------------------------------------------ stereoCalibrate


def test_stereo_calibrate_recovers_rig_transform():
    rng = np.random.default_rng(3)
    K = np.array([[420.0, 0, 160], [0, 420.0, 120], [0, 0, 1]], np.float32)
    dist = np.array([-0.05, 0.01, 0.0, 0.0, 0.0], np.float32)
    R_gt = cv2.Rodrigues(np.array([0.02, -0.35, 0.015]))[0]
    T_gt = np.array([-0.12, 0.004, 0.008])
    obj, p1, p2 = chessboard_views(8, rng, K, dist, R_gt, T_gt)
    res = calibration.stereo_calibrate(obj, p1, p2, K, dist, K, dist)
    assert res.rms < 0.25, res.rms
    assert np.abs(res.R - R_gt).max() < 2e-3
    assert np.abs(res.T - T_gt).max() < 2e-3
    # E/F consistency: epipolar constraint on undistorted points
    x1 = np.asarray(calibration.undistort_points(
        jnp.asarray(p1[0]), jnp.asarray(K), jnp.asarray(dist)))
    x2 = np.asarray(calibration.undistort_points(
        jnp.asarray(p2[0]), jnp.asarray(K), jnp.asarray(dist)))
    h1 = np.concatenate([x1, np.ones((63, 1))], axis=1)
    h2 = np.concatenate([x2, np.ones((63, 1))], axis=1)
    epi = np.abs(np.einsum("ni,ij,nj->n", h2, res.E, h1))
    assert epi.max() < 1e-4


def test_stereo_calibrate_matches_cv2():
    rng = np.random.default_rng(7)
    K = np.array([[380.0, 0, 150], [0, 380.0, 110], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)
    R_gt = cv2.Rodrigues(np.array([-0.01, 0.25, 0.03]))[0]
    T_gt = np.array([-0.10, 0.01, -0.01])
    obj, p1, p2 = chessboard_views(6, rng, K, dist, R_gt, T_gt)
    # noise so neither solver is exact
    p1n = p1 + rng.normal(0, 0.15, p1.shape).astype(np.float32)
    p2n = p2 + rng.normal(0, 0.15, p2.shape).astype(np.float32)
    res = calibration.stereo_calibrate(obj, p1n, p2n, K, dist, K, dist)
    rms_cv, _, _, _, _, R_cv, T_cv, _, _ = cv2.stereoCalibrate(
        obj.astype(np.float32), p1n, p2n,
        K.astype(np.float64), dist.astype(np.float64),
        K.astype(np.float64), dist.astype(np.float64), (320, 240),
        flags=cv2.CALIB_FIX_INTRINSIC,
    )
    assert np.abs(res.R - R_cv).max() < 5e-3
    assert np.abs(res.T - T_cv.ravel()).max() < 5e-3
    assert res.rms < 1.5 * rms_cv + 0.05


# --------------------------------------------- initUndistortRectifyMap


def test_init_undistort_rectify_map_matches_cv2():
    K = np.array([[300.0, 0, 81.0], [0, 305.0, 60.5], [0, 0, 1]])
    dist = np.array([-0.2, 0.05, 1e-3, -2e-3, 0.0])
    R = cv2.Rodrigues(np.array([0.01, -0.02, 0.005]))[0]
    newK = np.array([[280.0, 0, 80.0], [0, 285.0, 58.0], [0, 0, 1]])
    m = np.asarray(calibration.init_undistort_rectify_map(
        jnp.asarray(K, jnp.float32), jnp.asarray(dist, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(newK, jnp.float32),
        (120, 160),
    ))
    mx, my = cv2.initUndistortRectifyMap(
        K, dist, R, newK, (160, 120), cv2.CV_32FC1
    )
    assert np.abs(m[..., 0] - mx).max() < 2e-2
    assert np.abs(m[..., 1] - my).max() < 2e-2


def test_undistort_image_matches_cv2():
    rng = np.random.default_rng(0)
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w]
    img = (60 * np.sin(xx / 9.0) + 60 * np.cos(yy / 7.0) + 120).astype(np.float32)
    K = np.array([[250.0, 0, 80.0], [0, 250.0, 60.0], [0, 0, 1]])
    dist = np.array([-0.25, 0.08, 0.0, 0.0, 0.0])
    out = np.asarray(calibration.undistort_image(
        jnp.asarray(img), jnp.asarray(K, jnp.float32),
        jnp.asarray(dist, jnp.float32),
    ))
    gold = cv2.undistort(img, K, dist)
    # interiors agree (border extrapolation conventions differ)
    core_ours = out[10:-10, 10:-10]
    core_gold = gold[10:-10, 10:-10]
    assert np.abs(core_ours - core_gold).mean() < 0.5
    assert np.abs(core_ours - core_gold).max() < 6.0


# ----------------------------------------------------- estimateAffine2D


def _affine_points(rng, n=120, n_out=25):
    M = np.array([[1.2, -0.3, 14.0], [0.25, 0.9, -7.0]], np.float32)
    src = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    dst = src @ M[:, :2].T + M[:, 2]
    dst += rng.normal(0, 0.3, dst.shape).astype(np.float32)
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] += rng.uniform(30, 90, (n_out, 2)).astype(np.float32)
    return M, src, dst


def test_estimate_affine_2d_matches_cv2():
    rng = np.random.default_rng(11)
    M_gt, src, dst = _affine_points(rng)
    res = affine2d.estimate_affine_2d(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
        threshold=3.0,
    )
    assert bool(res.ok)
    M = np.asarray(res.M)
    M_cv, inl_cv = cv2.estimateAffine2D(src, dst, ransacReprojThreshold=3.0)
    assert np.abs(M - M_gt).max() < 0.15  # translation err ~ noise level
    assert np.abs(M - M_cv).max() < 0.15
    # inlier masks broadly agree (same model, same threshold)
    agree = (np.asarray(res.inliers) == inl_cv.ravel().astype(bool)).mean()
    assert agree > 0.95


def test_estimate_affine_partial_2d_is_similarity():
    rng = np.random.default_rng(5)
    th, s = 0.4, 1.3
    M_gt = np.array(
        [[s * np.cos(th), -s * np.sin(th), 5.0],
         [s * np.sin(th), s * np.cos(th), -3.0]], np.float32)
    src = rng.uniform(0, 100, (80, 2)).astype(np.float32)
    dst = src @ M_gt[:, :2].T + M_gt[:, 2]
    dst += rng.normal(0, 0.2, dst.shape).astype(np.float32)
    dst[:12] += 50.0
    res = affine2d.estimate_affine_partial_2d(
        jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst),
        threshold=3.0,
    )
    M = np.asarray(res.M)
    # similarity structure: M[0,0]==M[1,1], M[0,1]==-M[1,0]
    assert abs(M[0, 0] - M[1, 1]) < 1e-4
    assert abs(M[0, 1] + M[1, 0]) < 1e-4
    assert np.abs(M - M_gt).max() < 0.15  # translation err ~ noise level
    M_cv, _ = cv2.estimateAffinePartial2D(src, dst, ransacReprojThreshold=3.0)
    assert np.abs(M - M_cv).max() < 0.15
