"""GrabCut / watershed / phaseCorrelate vs cv2 gold.

Reference: imgproc/src/{grabcut.cpp:1,segmentation.cpp:1,phasecorr.cpp:513}.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import grabcut, phasecorr, watershed

cv2 = pytest.importorskip("cv2")


# ------------------------------------------------------- phaseCorrelate


def test_phase_correlate_matches_cv2(rng):
    base = rng.uniform(0, 255, (128, 128)).astype(np.float32)
    base = cv2.GaussianBlur(base, (7, 7), 2.0)
    M = np.float32([[1, 0, 3.6], [0, 1, -2.2]])
    shifted = cv2.warpAffine(base, M, (128, 128))
    win = cv2.createHanningWindow((128, 128), cv2.CV_32F)
    (dx_cv, dy_cv), resp_cv = cv2.phaseCorrelate(
        base.astype(np.float64), shifted.astype(np.float64),
        win.astype(np.float64),
    )
    (dx, dy), resp = phasecorr.phase_correlate(
        jnp.asarray(base), jnp.asarray(shifted),
        phasecorr.create_hanning_window(128, 128),
    )
    # warpAffine resampling is not an exact Fourier shift, and cv2 runs
    # the pipeline in f64 vs our f32 — so compare BOTH estimators to the
    # true displacement instead of to each other bit-for-bit
    assert abs(dx_cv - 3.6) < 0.15 and abs(dy_cv - (-2.2)) < 0.15
    assert abs(float(dx) - 3.6) < 0.15, float(dx)
    assert abs(float(dy) - (-2.2)) < 0.15, float(dy)
    assert abs(float(dx) - dx_cv) < 0.15 and abs(float(dy) - dy_cv) < 0.15
    assert abs(float(resp) - resp_cv) < 0.05


def test_hanning_window_matches_cv2():
    want = cv2.createHanningWindow((40, 30), cv2.CV_32F)
    got = np.asarray(phasecorr.create_hanning_window(30, 40))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_phase_correlate_integer_shift(rng):
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    moved = np.roll(img, (5, -7), axis=(0, 1))
    (dx, dy), resp = phasecorr.phase_correlate(
        jnp.asarray(img), jnp.asarray(moved)
    )
    # circular shift is the FFT-exact case
    assert abs(float(dx) - (-7)) < 0.01
    assert abs(float(dy) - 5) < 0.01
    assert float(resp) > 0.9


# ------------------------------------------------------------ watershed


def test_watershed_basins_match_cv2(rng):
    """Two dark basins separated by a bright ridge: basin bodies must
    agree with cv2.watershed (lines themselves may differ by a pixel)."""
    h, w = 60, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # ridge along x=40; basins at x=20 and x=60
    surface = 100 - 80 * np.exp(-((xx - 20) ** 2) / 200) \
        - 80 * np.exp(-((xx - 60) ** 2) / 200)
    surface += rng.normal(0, 1.0, (h, w)).astype(np.float32)
    img8 = np.clip(surface, 0, 255).astype(np.uint8)
    img3 = cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)

    markers = np.zeros((h, w), np.int32)
    markers[28:32, 16:24] = 1
    markers[28:32, 56:64] = 2

    m_cv = markers.copy()
    cv2.watershed(img3, m_cv)
    m_us = np.asarray(watershed.watershed(jnp.asarray(surface), markers))

    interior = np.zeros((h, w), bool)
    interior[1:-1, 1:-1] = True
    both_labeled = (m_cv > 0) & (m_us > 0) & interior
    agree = (m_cv == m_us) & both_labeled
    frac = agree.sum() / max(both_labeled.sum(), 1)
    assert frac > 0.95, frac
    # the dam must separate the basins: basin 1 and 2 never 4-adjacent
    for dy, dx in ((0, 1), (1, 0)):
        a = m_us[max(dy, 0):h + min(dy, 0), max(dx, 0):w + min(dx, 0)]
        b = m_us[max(-dy, 0):h + min(-dy, 0), max(-dx, 0):w + min(-dx, 0)]
        assert not np.any((a == 1) & (b == 2))
        assert not np.any((a == 2) & (b == 1))


# -------------------------------------------------------------- grabcut


def _blob_scene(rng, h=70, w=90):
    img = np.zeros((h, w, 3), np.float32)
    img[..., 1] = 120  # green background
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((xx - 45) ** 2 / 400 + (yy - 35) ** 2 / 250) < 1
    img[blob] = [40, 40, 200]  # red-ish blob (BGR-agnostic test)
    img += rng.normal(0, 6.0, img.shape).astype(np.float32)
    return np.clip(img, 0, 255), blob


def test_grabcut_rect_matches_cv2(rng):
    img, blob = _blob_scene(rng)
    rect = (18, 10, 58, 52)

    m_cv = np.zeros(img.shape[:2], np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img.astype(np.uint8), m_cv, rect, bgd, fgd, 5,
                cv2.GC_INIT_WITH_RECT)
    fg_cv = (m_cv % 2 == 1)

    m_us = np.asarray(grabcut.grab_cut(jnp.asarray(img), rect=rect,
                                       iter_count=5))
    fg_us = (m_us % 2 == 1)

    inter = (fg_cv & fg_us).sum()
    union = (fg_cv | fg_us).sum()
    assert union > 0
    iou_cv = inter / union
    # also score both against the true blob
    iou_true = (fg_us & blob).sum() / max((fg_us | blob).sum(), 1)
    assert iou_true > 0.85, iou_true
    assert iou_cv > 0.80, iou_cv


def test_grabcut_respects_hard_labels(rng):
    img, blob = _blob_scene(rng)
    mask = np.full(img.shape[:2], grabcut.GC_PR_BGD, np.int32)
    mask[30:40, 40:50] = grabcut.GC_FGD
    mask[:5, :] = grabcut.GC_BGD
    out = np.asarray(grabcut.grab_cut(jnp.asarray(img), mask=mask,
                                      iter_count=3))
    assert (out[30:40, 40:50] == grabcut.GC_FGD).all()
    assert (out[:5, :] == grabcut.GC_BGD).all()
    fg = out % 2 == 1
    # the hard-FG seed grows to cover most of the blob
    assert (fg & blob).sum() / blob.sum() > 0.7
