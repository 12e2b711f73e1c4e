"""Pallas FAST kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import fast
from opencv_tpu.ops.pallas import fast_kernel


def test_pallas_fast_matches_xla(rng):
    img = rng.integers(0, 255, size=(70, 150)).astype(np.float32)
    want = np.asarray(fast.fast_score(jnp.asarray(img)))
    got = np.asarray(
        fast_kernel.fast_score_pallas(jnp.asarray(img), strip=32, interpret=True)
    )
    # identical on the valid interior; border sentinel values also equal
    interior = (slice(3, -3), slice(3, -3))
    np.testing.assert_array_equal(got[interior], want[interior])
    assert got[0, 0] <= -1e8 and want[0, 0] <= -1e8


def test_pallas_fast_arc12(rng):
    img = rng.integers(0, 255, size=(40, 140)).astype(np.float32)
    want = np.asarray(fast.fast_score(jnp.asarray(img), arc_length=12))
    got = np.asarray(
        fast_kernel.fast_score_pallas(
            jnp.asarray(img), arc_length=12, strip=8, interpret=True
        )
    )
    interior = (slice(3, -3), slice(3, -3))
    np.testing.assert_array_equal(got[interior], want[interior])


def test_fused_corners_matches_xla(rng):
    img = rng.integers(0, 255, size=(64, 140)).astype(np.float32)
    score_x, corner_x = fast.fast_corners(jnp.asarray(img), 20.0, use_pallas=False)
    score_p, nmsed = fast_kernel.fast_corners_pallas(
        jnp.asarray(img), 20.0, strip=16, interpret=True
    )
    corner_p = np.asarray(nmsed) > -1e8
    interior = (slice(3, -3), slice(3, -3))
    np.testing.assert_array_equal(
        np.asarray(score_p)[interior], np.asarray(score_x)[interior]
    )
    np.testing.assert_array_equal(corner_p[interior], np.asarray(corner_x)[interior])
