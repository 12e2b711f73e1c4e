"""ECC alignment and Farneback dense-flow tests on synthetic motion."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import ecc, farneback


def smooth_texture(rng, h=96, w=128):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    return np.asarray(imgproc.gaussian_blur(jnp.asarray(img), 7, 2.0))


def test_ecc_translation(rng):
    img = smooth_texture(rng)
    tmpl = np.asarray(
        imgproc.warp_affine(
            jnp.asarray(img), jnp.asarray([[1.0, 0.0, 3.5], [0.0, 1.0, -2.0]]), 96, 128
        )
    )
    warp, rho = ecc.find_transform_ecc(jnp.asarray(tmpl), jnp.asarray(img), "translation")
    warp = np.asarray(warp)
    assert abs(warp[0, 2] - 3.5) < 0.1
    assert abs(warp[1, 2] + 2.0) < 0.1
    assert float(rho) > 0.98


def test_ecc_affine(rng):
    img = smooth_texture(rng)
    m_true = np.array([[1.02, 0.03, 2.0], [-0.02, 0.98, 1.5]], np.float32)
    tmpl = np.asarray(imgproc.warp_affine(jnp.asarray(img), jnp.asarray(m_true), 96, 128))
    warp, rho = ecc.find_transform_ecc(jnp.asarray(tmpl), jnp.asarray(img), "affine", iters=80)
    np.testing.assert_allclose(np.asarray(warp), m_true, atol=0.05)
    assert float(rho) > 0.95


def test_farneback_uniform_translation(rng):
    img = smooth_texture(rng, 128, 160)
    moved = np.roll(img, (2, 4), axis=(0, 1))
    flow = np.asarray(
        farneback.calc_optical_flow_farneback(jnp.asarray(img), jnp.asarray(moved))
    )
    interior = flow[24:-24, 24:-24]
    assert abs(np.median(interior[..., 0]) - 4.0) < 0.5
    assert abs(np.median(interior[..., 1]) - 2.0) < 0.5


def test_farneback_zero_motion(rng):
    img = smooth_texture(rng, 96, 128)
    flow = np.asarray(
        farneback.calc_optical_flow_farneback(jnp.asarray(img), jnp.asarray(img))
    )
    assert np.abs(flow[16:-16, 16:-16]).max() < 0.1


def test_poly_expansion_fits_quadratic():
    # image that IS a quadratic: coefficients should be recovered exactly
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = 32.0, 32.0
    u, v = xx - cx, yy - cy
    img = 5.0 + 0.3 * u - 0.2 * v + 0.01 * u * u + 0.02 * v * v + 0.005 * u * v
    r = np.asarray(farneback.poly_expansion(jnp.asarray(img)))
    # at center pixel, local coords == (u, v) so coefficients match directly
    np.testing.assert_allclose(
        r[32, 32], [5.0, 0.3, -0.2, 0.01, 0.02, 0.005], atol=1e-3
    )
