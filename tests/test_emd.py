"""EMD-L1 tests (shape/src/emdL1.cpp analog)."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.ops import shape


def test_emd_1d_exact():
    a = jnp.asarray([1.0, 0, 0, 0])
    b = jnp.asarray([0.0, 0, 0, 1.0])
    assert abs(float(shape.emd_l1(a, b)) - 3.0) < 1e-6
    c = jnp.asarray([0.5, 0.5, 0, 0])
    d = jnp.asarray([0, 0, 0.5, 0.5])
    assert abs(float(shape.emd_l1(c, d)) - 2.0) < 1e-6


def test_emd_2d_translation_and_metric(rng):
    h = np.zeros((8, 8), np.float32)
    h[2, 2] = 1.0
    g = np.zeros((8, 8), np.float32)
    g[2, 5] = 1.0  # moved 3 cells in x -> EMD-L1 = 3
    val = float(shape.emd_l1(jnp.asarray(h), jnp.asarray(g)))
    assert abs(val - 3.0) < 0.15, val

    # identity ~ 0, symmetry
    r = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    r /= r.sum()
    z = float(shape.emd_l1(jnp.asarray(r), jnp.asarray(r)))
    assert z < 0.1
    q = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    q /= q.sum()
    ab = float(shape.emd_l1(jnp.asarray(r), jnp.asarray(q)))
    ba = float(shape.emd_l1(jnp.asarray(q), jnp.asarray(r)))
    assert abs(ab - ba) / max(ab, 1e-6) < 0.05
    assert ab > 0
