"""calcHist/calcBackProject + meanShift/CamShift vs cv2 gold.

Reference: modules/video/src/camshift.cpp:44,110;
modules/imgproc/src/histogram.cpp:1519."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import camshift

cv2 = pytest.importorskip("cv2")


def blob_frame(cx, cy, h=120, w=160, r=14, val=200, rng=None):
    """Gray frame with a bright blob at (cx, cy) over textured noise."""
    img = (rng.uniform(20, 60, (h, w)) if rng is not None
           else np.full((h, w), 40.0))
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
    img = np.where(mask, float(val), img)
    return img.astype(np.float32)


def test_calc_hist_matches_cv2(rng):
    img = (rng.uniform(0, 256, (60, 80))).astype(np.float32)
    want = cv2.calcHist([img.astype(np.uint8)], [0], None, [32], [0, 256])
    got = np.asarray(
        camshift.calc_hist([jnp.asarray(np.floor(img))], [32], [(0, 256)])
    )
    np.testing.assert_allclose(got, want.ravel())


def test_calc_hist_2d_matches_cv2(rng):
    a = rng.uniform(0, 256, (40, 50)).astype(np.uint8)
    b = rng.uniform(0, 180, (40, 50)).astype(np.uint8)
    want = cv2.calcHist([a, b], [0, 1], None, [16, 12], [0, 256, 0, 180])
    got = np.asarray(
        camshift.calc_hist(
            [jnp.asarray(a.astype(np.float32)),
             jnp.asarray(b.astype(np.float32))],
            [16, 12],
            [(0, 256), (0, 180)],
        )
    )
    np.testing.assert_allclose(got, want)


def test_back_project_matches_cv2(rng):
    img = rng.uniform(0, 256, (60, 80)).astype(np.uint8)
    tmpl = rng.uniform(0, 256, (20, 20)).astype(np.uint8)
    hist = cv2.calcHist([tmpl], [0], None, [32], [0, 256])
    want = cv2.calcBackProject([img], [0], hist, [0, 256], scale=1)
    got = np.asarray(
        camshift.calc_back_project(
            [jnp.asarray(img.astype(np.float32))],
            jnp.asarray(hist.ravel()),
            [(0, 256)],
        )
    )
    # cv2 saturates the u8 output at 255; compare with the same clamp
    np.testing.assert_allclose(np.minimum(got, 255), want.astype(np.float32))


def test_mean_shift_matches_cv2(rng):
    prob = blob_frame(100, 70, rng=None)  # clean blob, prob = intensity
    prob_u8 = prob.astype(np.uint8)
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 20, 1.0)
    for win in [(30, 20, 40, 36), (80, 50, 50, 40), (0, 0, 30, 30)]:
        n_cv, w_cv = cv2.meanShift(prob_u8, win, crit)
        n_us, w_us = camshift.mean_shift(
            jnp.asarray(prob_u8.astype(np.float32)), win, max_iter=20, eps=1.0
        )
        w_us = tuple(int(v) for v in w_us)
        assert w_us == tuple(w_cv), (win, w_us, tuple(w_cv))
        assert int(n_us) == n_cv, (win, int(n_us), n_cv)


def test_cam_shift_matches_cv2():
    # elongated rotated blob: exercises the orientation/size path
    h, w = 140, 180
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cx, cy, th = 95.0, 60.0, np.deg2rad(30)
    u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
    v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
    prob = ((u / 30) ** 2 + (v / 12) ** 2 < 1).astype(np.uint8) * 220
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 1.0)
    win = (60, 30, 60, 50)
    box_cv, w_cv = cv2.CamShift(prob, win, crit)
    (c_us, size_us, ang_us), w_us = camshift.cam_shift(
        jnp.asarray(prob.astype(np.float32)), win, max_iter=30, eps=1.0
    )
    w_us = tuple(int(v) for v in w_us)
    assert w_us == tuple(w_cv), (w_us, tuple(w_cv))
    np.testing.assert_allclose(
        [float(c_us[0]), float(c_us[1])], list(box_cv[0]), atol=1.0
    )
    np.testing.assert_allclose(
        [float(size_us[0]), float(size_us[1])], list(box_cv[1]), rtol=0.02
    )
    assert abs(float(ang_us) - box_cv[2]) < 1.5 or \
        abs(abs(float(ang_us) - box_cv[2]) - 180) < 1.5


def test_camshift_tracks_moving_blob(rng):
    """End-to-end: histogram from frame 0's window, CamShift follows the
    blob across frames (the camshiftdemo loop)."""
    centers = [(40 + 8 * i, 50 + 4 * i) for i in range(8)]
    frames = [blob_frame(cx, cy, rng=rng) for cx, cy in centers]
    win = (40 - 15, 50 - 15, 30, 30)
    tmpl = frames[0][win[1]:win[1] + win[3], win[0]:win[0] + win[2]]
    hist = camshift.calc_hist([jnp.asarray(tmpl)], [32], [(0, 256)],
                              density=True)
    hist = hist * 255.0
    out = camshift.track_window_sequence(
        [[jnp.asarray(f)] for f in frames[1:]], hist, [(0, 256)], win
    )
    for (box, w), (cx, cy) in zip(out, centers[1:]):
        assert abs(box[0][0] - cx) < 6 and abs(box[0][1] - cy) < 6, (
            box[0], (cx, cy)
        )
