"""Five-point minimal solver tests (reference five-point.cpp parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.core.config import RansacConfig
from opencv_tpu.geometry import epipolar, five_point
from opencv_tpu.geometry.rotation import hat, rodrigues

from test_geometry import angle_between, make_scene, rot_angle


def test_five_point_exact_recovery(rng):
    for trial in range(5):
        _, x1, x2, R, t = make_scene(rng, n=5, rot_deg=rng.uniform(2, 15))
        res = five_point.five_point(jnp.asarray(x1), jnp.asarray(x2))
        Et = np.asarray(hat(jnp.asarray(t))) @ R
        Et /= np.linalg.norm(Et)
        valid = np.asarray(res.valid)
        assert valid.any(), trial
        best = np.inf
        for i in np.flatnonzero(valid):
            E = np.asarray(res.E[i])
            best = min(best, np.abs(E - Et).max(), np.abs(E + Et).max())
        assert best < 5e-3, (trial, best)


def test_five_point_candidates_satisfy_constraints(rng):
    _, x1, x2, R, t = make_scene(rng, n=5)
    res = five_point.five_point(jnp.asarray(x1), jnp.asarray(x2))
    for i in np.flatnonzero(np.asarray(res.valid)):
        E = np.asarray(res.E[i]).astype(np.float64)
        # epipolar constraint on all 5 points
        err = np.asarray(
            epipolar.sampson_error(jnp.asarray(E, jnp.float32),
                                   jnp.asarray(x1), jnp.asarray(x2))
        )
        assert err.max() < 1e-6
        # essential-matrix internal constraints (complex64 Durand-Kerner
        # root precision leaves ~1e-4..1e-3 residuals; the RANSAC polish
        # refit restores full accuracy downstream)
        assert abs(np.linalg.det(E)) < 2e-3
        C = 2 * E @ E.T @ E - np.trace(E @ E.T) * E
        assert np.abs(C).max() < 5e-3


def test_five_point_ransac_low_inlier_ratio(rng):
    """At a 45% inlier ratio the 5-point kernel must still find the
    model (the regime where the 8-point sample struggles)."""
    _, x1, x2, R, t = make_scene(rng, n=200)
    x2c = x2.copy()
    n_bad = 110
    x2c[:n_bad] = rng.uniform(-0.5, 0.5, size=(n_bad, 2)).astype(np.float32)
    res = epipolar.find_essential_ransac_5pt(
        jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2c),
        cfg=RansacConfig(n_hypotheses=256, threshold=2e-3),
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[n_bad:].mean() > 0.9
    assert inl[:n_bad].mean() < 0.15
    rec = epipolar.recover_pose(res.model, jnp.asarray(x1), jnp.asarray(x2c), res.inliers)
    assert rot_angle(np.asarray(rec.R), R) < np.deg2rad(1.0)
    assert angle_between(np.asarray(rec.t), t) < np.deg2rad(3.0)
