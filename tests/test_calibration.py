"""Camera calibration on synthetic chessboard views (mirrors
calib3d/test/test_cameracalibration_artificial.cpp strategy)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.geometry import calibration
from opencv_tpu.geometry.rotation import rodrigues


FX, FY, CX, CY = 600.0, 590.0, 320.0, 240.0
K_TRUE = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
DIST_TRUE = np.array([-0.15, 0.05, 0.001, -0.0015, 0.0], np.float32)


def board_points(nx=7, ny=5, square=0.03):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny))
    pts = np.stack([xs.ravel() * square, ys.ravel() * square, np.zeros(nx * ny)], 1)
    return pts.astype(np.float32)


def make_views(rng, n_views=10, noise=0.1):
    obj = board_points()
    objs, imgs = [], []
    for _ in range(n_views):
        rvec = np.concatenate(
            [rng.uniform(-0.3, 0.3, 2), rng.uniform(-0.5, 0.5, 1)]
        ).astype(np.float32)
        tvec = np.array(
            [rng.uniform(-0.1, 0.02), rng.uniform(-0.08, 0.02), rng.uniform(0.35, 0.7)],
            np.float32,
        )
        proj = np.asarray(
            calibration.project_points_full(
                jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray([FX, FY, CX, CY]),
                jnp.asarray(DIST_TRUE), jnp.asarray(obj),
            )
        )
        proj = proj + rng.normal(0, noise, proj.shape)
        objs.append(obj)
        imgs.append(proj.astype(np.float32))
    return np.stack(objs), np.stack(imgs)


def test_distort_undistort_roundtrip(rng):
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)).astype(np.float32))
    xd = calibration.distort(xy, jnp.asarray(DIST_TRUE))
    px = np.stack(
        [np.asarray(xd)[:, 0] * FX + CX, np.asarray(xd)[:, 1] * FY + CY], 1
    ).astype(np.float32)
    back = np.asarray(
        calibration.undistort_points(jnp.asarray(px), jnp.asarray(K_TRUE),
                                     jnp.asarray(DIST_TRUE))
    )
    np.testing.assert_allclose(back, np.asarray(xy), atol=2e-4)


def test_calibrate_camera_recovers_parameters(rng):
    objs, imgs = make_views(rng, n_views=12, noise=0.1)
    res = calibration.calibrate_camera(objs, imgs)
    assert res.rms < 0.3  # px, at 0.1 px injected noise
    assert abs(res.K[0, 0] - FX) / FX < 0.01
    assert abs(res.K[1, 1] - FY) / FY < 0.01
    assert abs(res.K[0, 2] - CX) < 5.0
    assert abs(res.K[1, 2] - CY) < 5.0
    # individual radial coefficients trade off (k2 vs k3) at this FOV;
    # what matters is the distortion FUNCTION over the working range
    xy = jnp.asarray(
        np.stack(np.meshgrid(np.linspace(-0.4, 0.4, 9),
                             np.linspace(-0.3, 0.3, 7)), -1).reshape(-1, 2)
    ).astype(jnp.float32)
    d_true = np.asarray(calibration.distort(xy, jnp.asarray(DIST_TRUE)))
    d_est = np.asarray(calibration.distort(xy, jnp.asarray(res.dist)))
    assert np.abs(d_true - d_est).max() * FX < 0.5  # < 0.5 px everywhere


def test_calibrate_camera_noiseless_is_exact(rng):
    objs, imgs = make_views(rng, n_views=8, noise=0.0)
    res = calibration.calibrate_camera(objs, imgs)
    assert res.rms < 1e-2
    assert abs(res.K[0, 0] - FX) < 1.0
    np.testing.assert_allclose(res.dist, DIST_TRUE, atol=5e-3)
