"""AP3P algebraic P3P (geometry/ap3p.py) and the VVS pose refiner
(geometry/pnp.refine_pose_vvs) vs ground truth and cv2 gold.
Reference: calib3d/src/ap3p.cpp (SOLVEPNP_AP3P) and
solvepnp.cpp:679-717 (solvePnPRefineVVS)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opencv_tpu.geometry.ap3p import ap3p_kernel, ap3p_solutions
from opencv_tpu.geometry.pnp import refine_pose_vvs
from opencv_tpu.geometry.rotation import rodrigues


def make_scene(rng, n=4, planar=False):
    obj = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    if planar:
        obj[:, 2] = 0.0
    rvec = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    tvec = np.array([0.1, -0.2, 4.0], np.float32) + rng.uniform(
        -0.3, 0.3, 3
    ).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    pc = obj @ R.T + tvec
    img = (pc[:, :2] / pc[:, 2:3]).astype(np.float32)
    return obj, img, rvec, tvec, R


def test_ap3p_solution_set_contains_truth():
    rng = np.random.default_rng(0)
    for trial in range(20):
        obj, img, rvec, tvec, R_gt = make_scene(rng, n=3)
        rays = np.concatenate([img, np.ones((3, 1), np.float32)], axis=1)
        rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        R, t, valid = jax.jit(ap3p_solutions)(
            jnp.asarray(obj), jnp.asarray(rays)
        )
        R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
        assert valid.any(), f"trial {trial}: no valid AP3P solution"
        errs = [
            np.abs(R[i] - R_gt).max() + np.abs(t[i] - tvec).max()
            for i in range(4)
            if valid[i]
        ]
        assert min(errs) < 5e-3, f"trial {trial}: best err {min(errs)}"


def test_ap3p_kernel_recovers_pose():
    rng = np.random.default_rng(1)
    for trial in range(10):
        obj, img, rvec, tvec, _ = make_scene(rng, n=4)
        model, ok = jax.jit(ap3p_kernel)(jnp.asarray(obj), jnp.asarray(img))
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(model[:3]), rvec, atol=2e-3)
        np.testing.assert_allclose(np.asarray(model[3:]), tvec, atol=5e-3)


def test_ap3p_kernel_planar_safe():
    # P3P-class kernels must not degenerate on coplanar points
    rng = np.random.default_rng(2)
    obj, img, rvec, tvec, _ = make_scene(rng, n=4, planar=True)
    model, ok = ap3p_kernel(jnp.asarray(obj), jnp.asarray(img))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(model[:3]), rvec, atol=5e-3)
    np.testing.assert_allclose(np.asarray(model[3:]), tvec, atol=1e-2)


def test_ap3p_matches_cv2_solution_set():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    obj, img, rvec, tvec, _ = make_scene(rng, n=3)
    rays = np.concatenate([img, np.ones((3, 1), np.float32)], axis=1)
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    R, t, valid = ap3p_solutions(jnp.asarray(obj), jnp.asarray(rays))
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)

    n_sol, rvecs_cv, tvecs_cv = cv2.solveP3P(
        obj.astype(np.float64),
        img.astype(np.float64).reshape(-1, 1, 2),
        np.eye(3),
        None,
        flags=cv2.SOLVEPNP_AP3P,
    )
    assert n_sol >= 1
    # every cv2 solution must appear in our candidate set
    for rv_cv, tv_cv in zip(rvecs_cv, tvecs_cv):
        R_cv, _ = cv2.Rodrigues(rv_cv)
        best = min(
            np.abs(R[i] - R_cv).max() + np.abs(t[i] - tv_cv.ravel()).max()
            for i in range(4)
            if valid[i]
        )
        assert best < 1e-2, f"cv2 solution missing from ours (err {best})"


def test_vvs_refiner_converges_to_truth():
    rng = np.random.default_rng(4)
    obj, img, rvec, tvec, _ = make_scene(rng, n=24)
    r0 = rvec + rng.normal(0, 0.05, 3).astype(np.float32)
    t0 = tvec + rng.normal(0, 0.1, 3).astype(np.float32)
    r1, t1 = jax.jit(refine_pose_vvs)(
        jnp.asarray(r0), jnp.asarray(t0), jnp.asarray(obj), jnp.asarray(img)
    )
    np.testing.assert_allclose(np.asarray(r1), rvec, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), tvec, atol=5e-4)


def test_vvs_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    obj, img, rvec, tvec, _ = make_scene(rng, n=16)
    img_noisy = img + rng.normal(0, 2e-3, img.shape).astype(np.float32)
    r0 = (rvec + np.array([0.03, -0.02, 0.04], np.float32)).astype(np.float64)
    t0 = (tvec + np.array([0.05, 0.02, -0.08], np.float32)).astype(np.float64)

    rv_cv = r0.reshape(3, 1).copy()
    tv_cv = t0.reshape(3, 1).copy()
    cv2.solvePnPRefineVVS(
        obj.astype(np.float64),
        img_noisy.astype(np.float64).reshape(-1, 1, 2),
        np.eye(3),
        None,
        rv_cv,
        tv_cv,
    )
    r1, t1 = refine_pose_vvs(
        jnp.asarray(r0, dtype=jnp.float32),
        jnp.asarray(t0, dtype=jnp.float32),
        jnp.asarray(obj),
        jnp.asarray(img_noisy),
    )
    np.testing.assert_allclose(np.asarray(r1), rv_cv.ravel(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t1), tv_cv.ravel(), atol=5e-3)


def test_vvs_weights_mask_points():
    rng = np.random.default_rng(6)
    obj, img, rvec, tvec, _ = make_scene(rng, n=20)
    img = img.copy()
    img[15:] = 7.5  # garbage that the mask must ignore
    w = np.ones(20, np.float32)
    w[15:] = 0.0
    r0 = rvec + np.float32([0.04, 0.01, -0.03])
    t0 = tvec + np.float32([-0.06, 0.04, 0.09])
    r1, t1 = refine_pose_vvs(
        jnp.asarray(r0), jnp.asarray(t0), jnp.asarray(obj),
        jnp.asarray(img), jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(r1), rvec, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), tvec, atol=5e-4)
