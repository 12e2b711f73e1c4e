"""IPPE planar PnP (geometry/ippe.py) vs ground truth and cv2 gold.
Reference: calib3d/src/ippe.cpp (SOLVEPNP_IPPE)."""

import numpy as np
import pytest
import jax.numpy as jnp

from opencv_tpu.geometry.ippe import solve_pnp_ippe
from opencv_tpu.geometry.rotation import rodrigues


def make_planar_scene(rng, n=24, noise=0.0):
    obj = np.zeros((n, 3), np.float32)
    obj[:, 0] = rng.uniform(-1, 1, n)
    obj[:, 1] = rng.uniform(-0.7, 0.7, n)
    rvec = np.array([0.25, -0.35, 0.1], np.float32)
    tvec = np.array([0.1, -0.05, 4.0], np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    pc = obj @ R.T + tvec
    img = pc[:, :2] / pc[:, 2:3]
    img += rng.normal(0, noise, img.shape).astype(np.float32)
    return obj, img.astype(np.float32), rvec, tvec


def test_ippe_recovers_exact_pose():
    rng = np.random.default_rng(0)
    obj, img, rvec, tvec = make_planar_scene(rng)
    res = solve_pnp_ippe(jnp.asarray(obj), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(res.rvecs[0]), rvec, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.tvecs[0]), tvec, atol=1e-3)
    # the second solution is the plane-flip ambiguity: valid rotation,
    # clearly worse reprojection on a non-degenerate view
    assert float(res.errors[0]) < 1e-8
    assert float(res.errors[1]) > float(res.errors[0])


def test_ippe_noisy_and_masked():
    rng = np.random.default_rng(1)
    obj, img, rvec, tvec = make_planar_scene(rng, n=40, noise=1e-3)
    valid = np.ones(40, bool)
    valid[30:] = False
    img[30:] = 99.0  # garbage in masked rows must not matter
    res = solve_pnp_ippe(jnp.asarray(obj), jnp.asarray(img),
                         jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(res.rvecs[0]), rvec, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.tvecs[0]), tvec, atol=5e-2)
    # masking garbage rows must behave like solving the valid subset
    clean = solve_pnp_ippe(jnp.asarray(obj[:30]),
                           jnp.asarray((img - 0)[:30]))
    np.testing.assert_allclose(
        np.asarray(res.rvecs[0]), np.asarray(clean.rvecs[0]), atol=5e-3
    )


def test_ippe_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    obj, img, rvec, tvec = make_planar_scene(rng, n=16, noise=5e-4)
    res = solve_pnp_ippe(jnp.asarray(obj), jnp.asarray(img))
    n_sol, rvecs_cv, tvecs_cv, err_cv = cv2.solvePnPGeneric(
        obj.reshape(-1, 1, 3), img.reshape(-1, 1, 2), np.eye(3),
        np.zeros(5), flags=cv2.SOLVEPNP_IPPE,
    )
    assert n_sol >= 1
    np.testing.assert_allclose(
        np.asarray(res.rvecs[0]), rvecs_cv[0].ravel(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.tvecs[0]), tvecs_cv[0].ravel(), atol=5e-3
    )
