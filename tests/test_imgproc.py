"""Accuracy tests for core imgproc vs naive NumPy references.

Follows the reference's CPU-as-gold strategy (SURVEY.md §4): every TPU op
is checked against a trusted naive implementation on small images.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_tpu.core import imgproc, pyramid


def ref_sepconv(img, ky, kx):
    """Naive reflect-101 separable correlation."""
    ry, rx = len(ky) // 2, len(kx) // 2
    pad = np.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    h, w = img.shape
    out = np.zeros((h, w), np.float64)
    for y in range(h):
        for x in range(w):
            acc = 0.0
            for i, kyv in enumerate(ky):
                for j, kxv in enumerate(kx):
                    acc += kyv * kxv * pad[y + i, x + j]
            out[y, x] = acc
    return out


def test_sep_filter2d_matches_naive(rng):
    img = rng.normal(size=(12, 15)).astype(np.float32)
    ky = np.array([0.25, 0.5, 0.25])
    kx = np.array([-1.0, 0.0, 1.0])
    got = np.asarray(imgproc.sep_filter2d(jnp.asarray(img), jnp.asarray(ky), jnp.asarray(kx)))
    want = ref_sepconv(img, ky, kx)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gaussian_kernel_normalized():
    k = np.asarray(imgproc.gaussian_kernel1d(7, 2.0))
    assert abs(k.sum() - 1.0) < 1e-6
    assert np.all(k > 0)
    np.testing.assert_allclose(k, k[::-1], rtol=1e-6)  # symmetric


def test_gaussian_blur_constant_invariant():
    img = jnp.full((32, 40), 7.0)
    out = imgproc.gaussian_blur(img, 7, 2.0)
    np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-5)


def test_scharr_on_linear_ramp():
    # /32 normalization makes Scharr return the true gradient on a ramp:
    # smooth weight (3+10+3)/32 = 0.5 times diff span 2 = 1.0
    h, w = 16, 20
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 3.0 * xx + 5.0 * yy
    dx, dy = imgproc.scharr_derivatives(jnp.asarray(img))
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(np.asarray(dx)[interior], 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy)[interior], 5.0, atol=1e-4)


def test_resize_bilinear_identity_and_downscale(rng):
    img = rng.normal(size=(24, 30)).astype(np.float32)
    same = imgproc.resize_bilinear(jnp.asarray(img), 24, 30)
    np.testing.assert_allclose(np.asarray(same), img, rtol=1e-5, atol=1e-5)
    # downscale of a constant stays constant
    const = jnp.full((24, 30), 3.5)
    down = imgproc.resize_bilinear(const, 11, 13)
    np.testing.assert_allclose(np.asarray(down), 3.5, rtol=1e-5)


def test_resize_bilinear_ramp_preserved():
    h, w = 20, 26
    xx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    out = np.asarray(imgproc.resize_bilinear(jnp.asarray(xx), 10, 13))
    # a linear ramp resampled bilinearly stays linear with scaled slope
    col_means = out.mean(axis=0)
    diffs = np.diff(col_means)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-3)


def test_bilinear_sample_exact_on_grid(rng):
    img = rng.normal(size=(9, 11)).astype(np.float32)
    ys, xs = np.mgrid[0:9, 0:11]
    pts = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)
    got = np.asarray(imgproc.bilinear_sample(jnp.asarray(img), jnp.asarray(pts)))
    np.testing.assert_allclose(got, img.ravel(), rtol=1e-6)


def test_bilinear_sample_midpoint():
    img = jnp.asarray([[0.0, 2.0], [4.0, 6.0]])
    val = imgproc.bilinear_sample(img, jnp.asarray([0.5, 0.5]))
    assert abs(float(val) - 3.0) < 1e-6


def test_nms_2d_isolated_peak():
    score = np.zeros((10, 10), np.float32)
    score[4, 5] = 10.0
    score[4, 6] = 9.0
    keep = np.asarray(imgproc.nms_2d(jnp.asarray(score)))
    assert keep[4, 5]
    assert not keep[4, 6]


def test_nms_2d_tie_breaks_to_topleft():
    score = np.zeros((8, 8), np.float32)
    score[3, 3] = 5.0
    score[3, 4] = 5.0
    keep = np.asarray(imgproc.nms_2d(jnp.asarray(score)))
    assert keep[3, 3] and not keep[3, 4]


def test_warp_affine_identity(rng):
    img = rng.normal(size=(14, 17)).astype(np.float32)
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(imgproc.warp_affine(jnp.asarray(img), m, 14, 17))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)


def test_warp_affine_translation(rng):
    img = rng.normal(size=(14, 17)).astype(np.float32)
    # output->input map: shift content left/up by 2,3
    m = jnp.asarray([[1.0, 0.0, 3.0], [0.0, 1.0, 2.0]])
    out = np.asarray(imgproc.warp_affine(jnp.asarray(img), m, 14, 17))
    np.testing.assert_allclose(out[:-2, :-3], img[2:, 3:], rtol=1e-5, atol=1e-6)


def test_pyr_down_up_shapes(rng):
    img = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    down = pyramid.pyr_down(img)
    assert down.shape == (16, 24)
    up = pyramid.pyr_up(down)
    assert up.shape == (32, 48)
    # pyr_down of constant is constant
    const = jnp.full((32, 48), 2.0)
    np.testing.assert_allclose(np.asarray(pyramid.pyr_down(const)), 2.0, rtol=1e-5)


def test_build_pyramid_scales(checker_image):
    pyr = pyramid.build_pyramid(jnp.asarray(checker_image), n_levels=4, scale_factor=1.2)
    assert pyr.num_levels == 4
    assert pyr.levels[0].shape == checker_image.shape
    for lvl in range(1, 4):
        s = 1.2 ** lvl
        h, w = checker_image.shape
        assert pyr.levels[lvl].shape == (round(h / s), round(w / s))


def test_harris_response_corner_vs_flat(checker_image):
    resp = np.asarray(imgproc.harris_response(jnp.asarray(checker_image)))
    # corners of the checkerboard (multiples of 16) should beat flat regions
    corner_vals = [abs(resp[y, x]) for y in (16, 32, 48) for x in (16, 32, 48)]
    flat_vals = [abs(resp[y + 8, x + 8]) for y in (16, 32) for x in (16, 32)]
    assert min(corner_vals) > max(flat_vals)
