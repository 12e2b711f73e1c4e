"""Synthetic-geometry tests (mirrors calib3d's strategy: random poses,
noise, inlier-ratio asserts — test_solvepnp_ransac.cpp, test_fundam.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.core.config import RansacConfig
from opencv_tpu.geometry import epipolar, homography, pnp
from opencv_tpu.geometry.rotation import (
    hat,
    project_to_rotation,
    rodrigues,
    rodrigues_inv,
)


def make_scene(rng, n=100, rot_deg=8.0, t=(0.4, 0.1, 0.15)):
    """Random 3D points + two views. Returns normalized coords and truth."""
    pts = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(4, 12, n),
        ],
        axis=1,
    )
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    rvec = axis * np.deg2rad(rot_deg)
    R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
    t = np.asarray(t, np.float32)
    p2 = pts @ R.T + t
    x1 = (pts[:, :2] / pts[:, 2:3]).astype(np.float32)
    x2 = (p2[:, :2] / p2[:, 2:3]).astype(np.float32)
    return pts.astype(np.float32), x1, x2, R.astype(np.float32), t


def angle_between(a, b):
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    return np.arccos(np.clip(abs(a @ b), -1, 1))


def rot_angle(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.arccos(np.clip(c, -1, 1))


# ---------- rotation ----------

def test_rodrigues_roundtrip(rng):
    rv = rng.normal(0, 0.8, size=(32, 3)).astype(np.float32)
    R = rodrigues(jnp.asarray(rv))
    back = np.asarray(rodrigues_inv(R))
    np.testing.assert_allclose(back, rv, atol=1e-4)
    # orthonormality
    RtR = np.asarray(R @ jnp.swapaxes(R, -1, -2))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)


def test_rodrigues_zero():
    R = np.asarray(rodrigues(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_rodrigues_autodiff_finite():
    g = jax.jacfwd(lambda r: rodrigues(r))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    # at identity, d R / d r = hat basis (generators)
    gen = np.asarray(g)  # [3,3,3] -> dR/dr_k = hat(e_k)
    for k in range(3):
        e = np.zeros(3)
        e[k] = 1.0
        np.testing.assert_allclose(gen[:, :, k], np.asarray(hat(jnp.asarray(e))), atol=1e-4)


def test_project_to_rotation():
    rng = np.random.default_rng(3)
    M = np.asarray(rodrigues(jnp.asarray(rng.normal(size=3)))) * 2.3  # scaled rotation
    R = np.asarray(project_to_rotation(jnp.asarray(M, jnp.float32)))
    np.testing.assert_allclose(R, M / 2.3, atol=1e-5)


# ---------- epipolar ----------

def test_eight_point_perfect(rng):
    _, x1, x2, R, t = make_scene(rng, n=60)
    E, ok = epipolar.eight_point(jnp.asarray(x1), jnp.asarray(x2))
    assert bool(ok)
    err = np.asarray(epipolar.sampson_error(E, jnp.asarray(x1), jnp.asarray(x2)))
    assert err.max() < 1e-7
    # compare to ground-truth E = [t]x R up to sign/scale
    Et = np.asarray(hat(jnp.asarray(t))) @ R
    Et /= np.linalg.norm(Et)
    Eg = np.asarray(E)
    assert min(np.abs(Eg - Et).max(), np.abs(Eg + Et).max()) < 1e-3


def test_find_essential_ransac_with_outliers(rng):
    _, x1, x2, R, t = make_scene(rng, n=200)
    # corrupt 30% of matches
    n_bad = 60
    x2c = x2.copy()
    x2c[:n_bad] += rng.uniform(-0.3, 0.3, size=(n_bad, 2)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    res = epipolar.find_essential_ransac(
        key, jnp.asarray(x1), jnp.asarray(x2c),
        cfg=RansacConfig(n_hypotheses=512, threshold=2e-3),
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[n_bad:].mean() > 0.95  # true inliers kept
    assert inl[:n_bad].mean() < 0.15  # outliers rejected
    rec = epipolar.recover_pose(res.model, jnp.asarray(x1), jnp.asarray(x2c), res.inliers)
    assert rot_angle(np.asarray(rec.R), R) < np.deg2rad(1.0)
    assert angle_between(np.asarray(rec.t), t) < np.deg2rad(2.0)


def test_triangulate_reprojection(rng):
    pts, x1, x2, R, t = make_scene(rng, n=50)
    X = np.asarray(
        epipolar.triangulate_normalized(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(x1), jnp.asarray(x2)
        )
    )
    np.testing.assert_allclose(X, pts, rtol=5e-3, atol=5e-3)


def test_recover_pose_cheirality(rng):
    _, x1, x2, R, t = make_scene(rng, n=80)
    E, _ = epipolar.eight_point(jnp.asarray(x1), jnp.asarray(x2))
    rec = epipolar.recover_pose(E, jnp.asarray(x1), jnp.asarray(x2))
    assert int(rec.n_good) > 70
    assert rot_angle(np.asarray(rec.R), R) < np.deg2rad(0.5)
    assert angle_between(np.asarray(rec.t), t) < np.deg2rad(1.0)


# ---------- PnP ----------

def test_dlt_pnp_exact(rng):
    pts, x1, x2, R, t = make_scene(rng, n=30)
    rv, tv, ok = pnp.dlt_pnp(jnp.asarray(pts), jnp.asarray(x2))
    assert bool(ok)
    assert rot_angle(np.asarray(rodrigues(rv)), R) < np.deg2rad(0.2)
    np.testing.assert_allclose(np.asarray(tv), t, atol=5e-3)


def test_solve_pnp_ransac_noise_outliers(rng):
    pts, x1, x2, R, t = make_scene(rng, n=150)
    x2n = x2 + rng.normal(0, 5e-4, x2.shape).astype(np.float32)  # ~0.35px at f=700
    x2n[:40] += rng.uniform(-0.2, 0.2, size=(40, 2)).astype(np.float32)
    res = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(x2n),
        cfg=RansacConfig(n_hypotheses=512, threshold=3e-3),
    )
    assert bool(res.ok)
    assert int(res.n_inliers) > 100
    assert rot_angle(np.asarray(rodrigues(res.rvec)), R) < np.deg2rad(0.5)
    np.testing.assert_allclose(np.asarray(res.tvec), t, atol=2e-2)


def test_project_points_identity():
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.5, -0.4, 4.0]])
    uv = np.asarray(pnp.project_points(jnp.zeros(3), jnp.zeros(3), pts))
    np.testing.assert_allclose(uv, [[0.0, 0.0], [0.125, -0.1]], atol=1e-6)


# ---------- homography / fundamental ----------

def test_homography_ransac_plane(rng):
    n = 120
    x1 = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    H = np.array(
        [[0.9, 0.05, 0.1], [-0.04, 1.1, -0.2], [0.02, -0.01, 1.0]], np.float32
    )
    p = np.concatenate([x1, np.ones((n, 1), np.float32)], axis=1) @ H.T
    x2 = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    x2c = x2.copy()
    x2c[:30] += rng.uniform(-0.5, 0.5, size=(30, 2)).astype(np.float32)
    res = homography.find_homography_ransac(
        jax.random.PRNGKey(2), jnp.asarray(x1), jnp.asarray(x2c),
        cfg=RansacConfig(n_hypotheses=512, threshold=0.01),
    )
    assert bool(res.ok)
    Hg = np.asarray(res.model)
    np.testing.assert_allclose(Hg / Hg[2, 2], H / H[2, 2], atol=5e-3)
    inl = np.asarray(res.inliers)
    assert inl[30:].mean() > 0.95 and inl[:30].mean() < 0.2


def test_fundamental_ransac(rng):
    # pixel-scale points: scale normalized scene by a focal length
    _, x1, x2, R, t = make_scene(rng, n=150)
    f, c = 700.0, 320.0
    p1 = x1 * f + c
    p2 = x2 * f + c
    p2c = p2.copy()
    p2c[:40] += rng.uniform(-60, 60, size=(40, 2)).astype(np.float32)
    res = homography.find_fundamental_ransac(
        jax.random.PRNGKey(3), jnp.asarray(p1), jnp.asarray(p2c),
        cfg=RansacConfig(n_hypotheses=512, threshold=1.5),
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[40:].mean() > 0.9 and inl[:40].mean() < 0.2
