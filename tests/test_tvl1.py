"""DualTVL1 dense flow tests (mirrors video/test/test_tvl1optflow.cpp
strategy on synthetic motion)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import tvl1


def smooth_texture(rng, h=96, w=128):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    return np.asarray(imgproc.gaussian_blur(jnp.asarray(img), 7, 2.0))


def test_tvl1_translation(rng):
    img = smooth_texture(rng)
    moved = np.roll(img, (2, 3), axis=(0, 1))
    flow = np.asarray(
        tvl1.calc_optical_flow_tvl1(jnp.asarray(img), jnp.asarray(moved), n_levels=3)
    )
    interior = flow[20:-20, 20:-20]
    assert abs(np.median(interior[..., 0]) - 3.0) < 0.4
    assert abs(np.median(interior[..., 1]) - 2.0) < 0.4


def test_tvl1_zero_motion(rng):
    img = smooth_texture(rng)
    flow = np.asarray(
        tvl1.calc_optical_flow_tvl1(jnp.asarray(img), jnp.asarray(img), n_levels=3)
    )
    assert np.abs(flow[10:-10, 10:-10]).max() < 0.15


def test_tvl1_piecewise_motion(rng):
    """TV regularization: two regions moving differently stay sharp."""
    img = smooth_texture(rng, 96, 128)
    moved = img.copy()
    moved[:, :64] = np.roll(img[:, :64], 3, axis=1)
    moved[:, 64:] = np.roll(img[:, 64:], -2, axis=1)
    flow = np.asarray(
        tvl1.calc_optical_flow_tvl1(jnp.asarray(img), jnp.asarray(moved), n_levels=3)
    )
    left = flow[30:-30, 15:45, 0]
    right = flow[30:-30, 85:115, 0]
    assert abs(np.median(left) - 3.0) < 0.8
    assert abs(np.median(right) + 2.0) < 0.8
