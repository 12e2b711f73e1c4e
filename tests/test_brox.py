"""Brox variational flow tests (cuda::BroxOpticalFlow /
NCVBroxOpticalFlow.cu analog) on synthetic motion."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import brox


def smooth_texture(rng, h=80, w=104):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    return np.asarray(imgproc.gaussian_blur(jnp.asarray(img), 7, 2.0))


def test_brox_translation(rng):
    img = smooth_texture(rng)
    moved = np.roll(img, (2, 3), axis=(0, 1))
    flow = np.asarray(
        brox.brox_flow(jnp.asarray(img), jnp.asarray(moved), n_levels=4)
    )
    interior = flow[16:-16, 16:-16]
    assert abs(np.median(interior[..., 0]) - 3.0) < 0.5
    assert abs(np.median(interior[..., 1]) - 2.0) < 0.5


def test_brox_zero_motion(rng):
    img = smooth_texture(rng)
    flow = np.asarray(
        brox.brox_flow(jnp.asarray(img), jnp.asarray(img), n_levels=3)
    )
    assert np.abs(flow[8:-8, 8:-8]).max() < 0.2


def test_brox_illumination_robustness(rng):
    """Gradient constancy: a global brightness offset must not break the
    flow (the property Brox adds over plain brightness constancy)."""
    img = smooth_texture(rng)
    moved = np.roll(img, 2, axis=1) + 20.0
    flow = np.asarray(
        brox.brox_flow(jnp.asarray(img), jnp.asarray(moved), n_levels=4)
    )
    interior = flow[16:-16, 16:-16]
    assert abs(np.median(interior[..., 0]) - 2.0) < 0.6
