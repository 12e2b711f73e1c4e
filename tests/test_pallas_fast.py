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


def test_fast_pallas_vmap_batched_parity(rng):
    """vmap over images must equal per-image results exactly: the
    custom_vmap rule folds the batch into the strip grid (images-major),
    so batching may not perturb any pixel's stencil."""
    import jax

    imgs = rng.uniform(0, 255, size=(3, 64, 96)).astype(np.float32)
    single = [
        fast_kernel.fast_corners_pallas(
            jnp.asarray(im), threshold=18.0, interpret=True
        )
        for im in imgs
    ]
    batched = jax.vmap(
        lambda im: fast_kernel.fast_corners_pallas(
            im, threshold=18.0, interpret=True
        )
    )(jnp.asarray(imgs))
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(batched[0][b]),
                                      np.asarray(single[b][0]))
        np.testing.assert_array_equal(np.asarray(batched[1][b]),
                                      np.asarray(single[b][1]))

    sc_single = [
        fast_kernel.fast_score_pallas(jnp.asarray(im), interpret=True)
        for im in imgs
    ]
    sc_batched = jax.vmap(
        lambda im: fast_kernel.fast_score_pallas(im, interpret=True)
    )(jnp.asarray(imgs))
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(sc_batched[b]),
                                      np.asarray(sc_single[b]))
