"""Shape module tests: Hausdorff, shape context, TPS."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import shape


def circle_pts(n=40, r=1.0, cx=0.0, cy=0.0):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], 1).astype(np.float32)


def test_hausdorff_identical_zero():
    a = circle_pts()
    assert float(shape.hausdorff_distance(jnp.asarray(a), jnp.asarray(a))) < 1e-6


def test_hausdorff_translation():
    a = circle_pts()
    b = a + np.array([0.3, 0.0], np.float32)
    d = float(shape.hausdorff_distance(jnp.asarray(a), jnp.asarray(b)))
    assert 0.05 < d <= 0.31


def test_shape_context_translation_invariant():
    a = circle_pts()
    b = a + np.array([5.0, -3.0], np.float32)
    ha = np.asarray(shape.shape_context(jnp.asarray(a)))
    hb = np.asarray(shape.shape_context(jnp.asarray(b)))
    # f32 rounding can flip a pair across a bin edge (angle exactly pi for
    # diametrically opposite circle points) — allow one bin's mass
    assert np.abs(ha - hb).sum(axis=1).max() < 0.08


def test_shape_context_distance_discriminates(rng):
    a = circle_pts(40)
    a2 = circle_pts(40) + rng.normal(0, 0.02, (40, 2)).astype(np.float32)
    sq = np.stack(
        [
            np.concatenate([np.linspace(-1, 1, 10), np.ones(10), np.linspace(1, -1, 10), -np.ones(10)]),
            np.concatenate([np.ones(10), np.linspace(1, -1, 10), -np.ones(10), np.linspace(-1, 1, 10)]),
        ],
        axis=1,
    ).astype(np.float32)
    d_same = shape.shape_context_distance(jnp.asarray(a), jnp.asarray(a2))
    d_diff = shape.shape_context_distance(jnp.asarray(a), jnp.asarray(sq))
    assert d_same < d_diff * 0.6


def test_tps_exact_at_control_points(rng):
    src = rng.uniform(-1, 1, size=(12, 2)).astype(np.float32)
    dst = src + rng.normal(0, 0.2, src.shape).astype(np.float32)
    tps = shape.fit_tps(jnp.asarray(src), jnp.asarray(dst))
    out = np.asarray(shape.apply_tps(tps, jnp.asarray(src)))
    np.testing.assert_allclose(out, dst, atol=1e-3)


def test_tps_affine_reproduced(rng):
    """With an affine src->dst relation, TPS must reproduce it everywhere
    (the bending energy of an affine map is zero)."""
    src = rng.uniform(-1, 1, size=(10, 2)).astype(np.float32)
    A = np.array([[1.2, 0.1], [-0.2, 0.9]], np.float32)
    t = np.array([0.3, -0.1], np.float32)
    dst = src @ A.T + t
    tps = shape.fit_tps(jnp.asarray(src), jnp.asarray(dst))
    q = rng.uniform(-1, 1, size=(30, 2)).astype(np.float32)
    out = np.asarray(shape.apply_tps(tps, jnp.asarray(q)))
    np.testing.assert_allclose(out, q @ A.T + t, atol=1e-3)
