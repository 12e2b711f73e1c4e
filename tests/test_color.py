"""Color conversion tests vs known values and round-trips."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import color


def test_rgb_gray_weights():
    img = jnp.asarray([[[255.0, 0.0, 0.0], [0.0, 255.0, 0.0], [0.0, 0.0, 255.0]]])
    g = np.asarray(color.rgb_to_gray(img))[0]
    np.testing.assert_allclose(g, [76.245, 149.685, 29.07], atol=0.01)


def test_hsv_known_colors():
    img = jnp.asarray(
        [[[255.0, 0.0, 0.0], [0.0, 255.0, 0.0], [0.0, 0.0, 255.0],
          [255.0, 255.0, 255.0], [0.0, 0.0, 0.0]]]
    )
    hsv = np.asarray(color.rgb_to_hsv(img))[0]
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(hsv[1], [120.0, 1.0, 1.0], atol=1e-4)
    np.testing.assert_allclose(hsv[2], [240.0, 1.0, 1.0], atol=1e-4)
    np.testing.assert_allclose(hsv[3], [0.0, 0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(hsv[4], [0.0, 0.0, 0.0], atol=1e-5)


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(8, 9, 3)).astype(np.float32))
    back = np.asarray(color.hsv_to_rgb(color.rgb_to_hsv(img)))
    np.testing.assert_allclose(back, np.asarray(img), atol=0.01)


def test_ycrcb_roundtrip(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(8, 9, 3)).astype(np.float32))
    back = np.asarray(color.ycrcb_to_rgb(color.rgb_to_ycrcb(img)))
    np.testing.assert_allclose(back, np.asarray(img), atol=0.05)


def test_lab_white_and_black():
    img = jnp.asarray([[[255.0, 255.0, 255.0], [0.0, 0.0, 0.0]]])
    lab = np.asarray(color.rgb_to_lab(img))[0]
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.5)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.5)


def test_demosaic_constant(rng):
    raw = jnp.full((16, 16), 128.0)
    rgb = np.asarray(color.demosaic_bilinear(raw, "RGGB"))
    np.testing.assert_allclose(rgb, 128.0, atol=0.01)


def test_demosaic_recovers_flat_channels():
    # Bayer mosaic of a constant-color image: R=200, G=100, B=50
    h, w = 16, 16
    raw = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    raw[(yy % 2 == 0) & (xx % 2 == 0)] = 200.0  # R
    raw[(yy % 2 == 0) & (xx % 2 == 1)] = 100.0  # G
    raw[(yy % 2 == 1) & (xx % 2 == 0)] = 100.0  # G
    raw[(yy % 2 == 1) & (xx % 2 == 1)] = 50.0  # B
    rgb = np.asarray(color.demosaic_bilinear(jnp.asarray(raw), "RGGB"))
    interior = rgb[2:-2, 2:-2]
    np.testing.assert_allclose(interior[..., 0], 200.0, atol=0.5)
    np.testing.assert_allclose(interior[..., 1], 100.0, atol=0.5)
    np.testing.assert_allclose(interior[..., 2], 50.0, atol=0.5)
