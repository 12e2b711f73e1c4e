"""EPnP solver + optimal two-view correction tests.

Mirrors the reference's synthetic-geometry style (calib3d/test/
test_solvepnp_ransac.cpp random-pose recovery; correctMatches semantics
from triangulate.cpp:371)."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_tpu.geometry import epipolar, epnp, pnp
from opencv_tpu.geometry.rotation import rodrigues


def _random_pose(rng):
    rvec = rng.normal(0, 0.4, 3).astype(np.float32)
    tvec = np.array([0.2, -0.1, 4.0], np.float32) + rng.normal(0, 0.2, 3).astype(
        np.float32
    )
    return rvec, tvec


def _project(rvec, tvec, pts):
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    pc = pts @ R.T + tvec
    return pc[:, :2] / pc[:, 2:3]


def test_epnp_exact_recovery(rng):
    pts = rng.uniform(-1, 1, (24, 3)).astype(np.float32)
    pts[:, 2] += 0.5
    rvec, tvec = _random_pose(rng)
    img = _project(rvec, tvec, pts).astype(np.float32)
    rv, tv, ok = epnp.epnp(jnp.asarray(pts), jnp.asarray(img))
    assert bool(ok)
    reproj = _project(np.asarray(rv), np.asarray(tv), pts)
    err = np.linalg.norm(reproj - img, axis=1).max()
    assert err < 1e-3, err


def test_epnp_planar_scene(rng):
    """EPnP handles coplanar points (the DLT kernel's failure mode)."""
    pts = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    pts[:, 2] = 0.0
    rvec, tvec = _random_pose(rng)
    img = _project(rvec, tvec, pts).astype(np.float32)
    rv, tv, ok = epnp.epnp(jnp.asarray(pts), jnp.asarray(img))
    reproj = _project(np.asarray(rv), np.asarray(tv), pts)
    err = np.linalg.norm(reproj - img, axis=1).max()
    assert err < 5e-3, err


def test_epnp_ransac_low_inlier_ratio(rng):
    n, n_out = 60, 28
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pts[:, 2] += 0.5
    rvec, tvec = _random_pose(rng)
    img = _project(rvec, tvec, pts).astype(np.float32)
    img[:n_out] += rng.uniform(-0.4, 0.4, (n_out, 2)).astype(np.float32)
    res = pnp.solve_pnp_ransac(
        jax.random.PRNGKey(3), jnp.asarray(pts), jnp.asarray(img), kernel="epnp"
    )
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.2


def test_correct_matches_constraint_and_proximity(rng):
    """Corrected points satisfy x2' F x1 = 0 and stay near the inputs."""
    n = 40
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    R = np.asarray(rodrigues(jnp.asarray([0.03, -0.1, 0.02])))
    t = np.array([0.5, 0.05, 0.02], np.float32)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    x2 = pc2[:, :2] / pc2[:, 2:3]
    # E = [t]x R; for normalized coords F == E
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], np.float32
    )
    F = tx @ R
    noise = 2e-3
    x1n = x1 + rng.normal(0, noise, x1.shape).astype(np.float32)
    x2n = x2 + rng.normal(0, noise, x2.shape).astype(np.float32)

    c1, c2 = epipolar.correct_matches(
        jnp.asarray(F), jnp.asarray(x1n), jnp.asarray(x2n)
    )
    c1, c2 = np.asarray(c1), np.asarray(c2)

    def epi(a, b):
        ah = np.concatenate([a, np.ones((n, 1))], 1)
        bh = np.concatenate([b, np.ones((n, 1))], 1)
        return np.abs(np.einsum("ni,ij,nj->n", bh, F, ah))

    before = epi(x1n, x2n)
    after = epi(c1, c2)
    assert np.median(after) < 1e-5
    assert np.median(after) < 0.01 * np.median(before)
    # the correction must not move points further than a few noise sigmas
    move = np.linalg.norm(c1 - x1n, axis=1) + np.linalg.norm(c2 - x2n, axis=1)
    assert np.median(move) < 6 * noise
    # corrected points stay close to the noise-free ground truth
    assert np.median(np.linalg.norm(c1 - x1, axis=1)) < 3 * noise
