"""Tests for morphology, histograms/CLAHE, template matching, threshold,
integral images — each against naive NumPy references."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import histogram, morphology, template


# ---------- integral / box sums ----------

def test_integral_matches_cumsum(rng):
    img = rng.uniform(0, 10, size=(9, 12)).astype(np.float32)
    ii = np.asarray(imgproc.integral(jnp.asarray(img)))
    assert ii.shape == (10, 13)
    want = img.cumsum(0).cumsum(1)
    np.testing.assert_allclose(ii[1:, 1:], want, rtol=1e-5)
    assert ii[0].sum() == 0 and ii[:, 0].sum() == 0


def test_box_sum_integral_interior(rng):
    img = rng.uniform(0, 5, size=(16, 18)).astype(np.float32)
    got = np.asarray(imgproc.box_sum_integral(jnp.asarray(img), 5))
    for y in range(2, 14):
        for x in range(2, 16):
            want = img[y - 2 : y + 3, x - 2 : x + 3].sum()
            assert abs(got[y, x] - want) < 1e-2


# ---------- threshold ----------

def test_threshold_kinds():
    img = jnp.asarray([[10.0, 100.0, 200.0]])
    assert np.asarray(imgproc.threshold(img, 50.0)).tolist() == [[0.0, 255.0, 255.0]]
    assert np.asarray(imgproc.threshold(img, 50.0, kind="binary_inv")).tolist() == [[255.0, 0.0, 0.0]]
    assert np.asarray(imgproc.threshold(img, 50.0, kind="trunc")).tolist() == [[10.0, 50.0, 50.0]]
    assert np.asarray(imgproc.threshold(img, 50.0, kind="tozero")).tolist() == [[0.0, 100.0, 200.0]]


def test_otsu_bimodal(rng):
    img = np.concatenate(
        [rng.normal(50, 5, 500), rng.normal(200, 5, 500)]
    ).reshape(20, 50)
    t = float(imgproc.otsu_threshold(jnp.asarray(np.clip(img, 0, 255))))
    # between-class variance is flat across the inter-mode gap; any
    # threshold separating the modes is a valid argmax
    assert 60 < t < 190
    assert abs(int((img < t).sum()) - 500) <= 5  # separates the two classes


# ---------- morphology ----------

def test_erode_dilate_rect(rng):
    img = rng.uniform(0, 10, size=(12, 14)).astype(np.float32)
    er = np.asarray(morphology.erode(jnp.asarray(img), 3))
    di = np.asarray(morphology.dilate(jnp.asarray(img), 3))
    for y in range(1, 11):
        for x in range(1, 13):
            win = img[y - 1 : y + 2, x - 1 : x + 2]
            assert er[y, x] == win.min()
            assert di[y, x] == win.max()


def test_open_removes_speckles():
    img = np.zeros((20, 20), np.float32)
    img[5:15, 5:15] = 255.0  # big blob survives
    img[2, 17] = 255.0  # single-pixel speckle dies
    out = np.asarray(morphology.morphology_open(jnp.asarray(img), 3))
    assert out[2, 17] == 0.0
    assert out[9, 9] == 255.0


def test_median_blur_removes_salt(rng):
    img = np.full((16, 16), 100.0, np.float32)
    img[8, 8] = 255.0
    out = np.asarray(morphology.median_blur(jnp.asarray(img), 3))
    assert out[8, 8] == 100.0


# ---------- histogram ----------

def test_calc_hist_matches_numpy(rng):
    img = rng.integers(0, 256, size=(32, 32)).astype(np.float32)
    got = np.asarray(histogram.calc_hist(jnp.asarray(img)))
    want = np.histogram(img, bins=256, range=(0, 256))[0]
    np.testing.assert_array_equal(got, want)


def test_equalize_hist_flattens(rng):
    img = np.clip(rng.normal(100, 10, size=(64, 64)), 0, 255).astype(np.float32)
    out = np.asarray(histogram.equalize_hist(jnp.asarray(img)))
    assert out.min() <= 5 and out.max() >= 250
    # equalized histogram is flatter: higher std of the input mapped away
    assert np.std(out) > np.std(img) * 2


def test_clahe_improves_local_contrast(rng):
    img = np.clip(
        50 + 8 * rng.standard_normal((64, 64)), 0, 255
    ).astype(np.float32)
    out = np.asarray(histogram.clahe(jnp.asarray(img), clip_limit=10.0, tile_grid=(4, 4)))
    assert out.shape == img.shape
    assert np.std(out) > np.std(img)
    assert 0 <= out.min() and out.max() <= 255


# ---------- template matching ----------

def test_match_template_finds_location(rng):
    img = rng.uniform(0, 50, size=(60, 80)).astype(np.float32)
    tmpl = rng.uniform(100, 200, size=(12, 10)).astype(np.float32)
    img[20:32, 30:40] = tmpl
    for method in ("ccoeff_normed", "ccorr_normed", "sqdiff_normed"):
        sm = np.asarray(template.match_template(jnp.asarray(img), jnp.asarray(tmpl), method))
        if method.startswith("sqdiff"):
            y, x = np.unravel_index(np.argmin(sm), sm.shape)
        else:
            y, x = np.unravel_index(np.argmax(sm), sm.shape)
        assert (y, x) == (20, 30), (method, y, x)
    # ccoeff_normed peak value ~1 at exact match
    sm = np.asarray(template.match_template(jnp.asarray(img), jnp.asarray(tmpl)))
    assert abs(sm[20, 30] - 1.0) < 1e-3


def test_match_template_sqdiff_zero_at_match(rng):
    img = rng.uniform(0, 255, size=(40, 40)).astype(np.float32)
    tmpl = img[10:20, 15:25].copy()
    sm = np.asarray(template.match_template(jnp.asarray(img), jnp.asarray(tmpl), "sqdiff"))
    # exact match is the global minimum; absolute value limited by f32
    # cancellation of ~1e7-magnitude integral terms
    assert np.unravel_index(np.argmin(sm), sm.shape) == (10, 15)
    assert abs(sm[10, 15]) < 1e-5 * sm.mean()


def test_bilateral_preserves_edges_smooths_noise(rng):
    img = np.zeros((48, 48), np.float32)
    img[:, 24:] = 150.0
    noisy = img + rng.normal(0, 6.0, img.shape).astype(np.float32)
    out = np.asarray(morphology.bilateral_filter(jnp.asarray(noisy), 9, 30.0, 3.0))
    # noise reduced in flat regions
    assert out[:, 4:20].std() < noisy[:, 4:20].std() * 0.5
    # edge step preserved
    assert (out[:, 30] - out[:, 18]).mean() > 130.0
