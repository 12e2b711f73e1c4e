"""Canny / Hough / GFTT tests on synthetic shapes (the lane-detection
pipeline of samples/gpu/lane_detection.cpp: Canny -> HoughSegments)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import edges, gftt, hough


def draw_line(img, x0, y0, x1, y1, value=255.0):
    n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2 + 1)
    t = np.linspace(0, 1, n)
    xs = np.round(x0 + t * (x1 - x0)).astype(int)
    ys = np.round(y0 + t * (y1 - y0)).astype(int)
    img[ys, xs] = value
    return img


def test_canny_finds_step_edge():
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200.0
    e = np.asarray(edges.canny(jnp.asarray(img), 40, 100))
    # a vertical edge near column 31/32, nothing elsewhere
    cols = np.flatnonzero(e.any(axis=0))
    assert len(cols) > 0
    assert set(cols) <= {30, 31, 32}
    assert e[:, 31].mean() > 0.9 or e[:, 32].mean() > 0.9


def test_canny_hysteresis_connects_weak():
    # gradient edge strong in the middle, weak at the ends, connected
    img = np.zeros((64, 64), np.float32)
    ramp = np.concatenate([np.full(20, 60.0), np.full(24, 200.0), np.full(20, 60.0)])
    img[:, 32:] = ramp[:, None]  # step height varies per row
    e = np.asarray(edges.canny(jnp.asarray(img), 20, 100))
    rows = np.flatnonzero(e.any(axis=1))
    # weak rows (step 60) connected to strong rows (step 200) survive
    assert len(rows) >= 60


def test_canny_rejects_noise_below_threshold(rng):
    img = rng.normal(0, 2.0, size=(64, 64)).astype(np.float32)
    e = np.asarray(edges.canny(jnp.asarray(img), 40, 100))
    assert e.sum() == 0


def test_hough_lines_detects_known_lines():
    img = np.zeros((100, 100), np.float32)
    draw_line(img, 10, 80, 90, 80)  # horizontal y=80
    draw_line(img, 40, 5, 40, 95)  # vertical x=40
    e = img > 100
    lines, valid = hough.hough_lines(jnp.asarray(e), threshold=50.0, max_lines=8)
    lines = np.asarray(lines)[np.asarray(valid)]
    assert len(lines) >= 2
    found_h = any(
        abs(abs(th) - np.pi / 2) < 0.05 and abs(abs(r) - 80) < 2 for r, th in lines
    )
    found_v = any(abs(th) < 0.05 and abs(r - 40) < 2 for r, th in lines)
    assert found_h and found_v, lines


def test_hough_segments_endpoints():
    img = np.zeros((100, 100), np.float32)
    draw_line(img, 20, 30, 70, 30)  # horizontal segment x in [20,70]
    e = img > 100
    segs = hough.hough_segments(
        jnp.asarray(e), threshold=30.0, min_line_length=30, max_line_gap=3
    )
    xyxy = np.asarray(segs.xyxy)[np.asarray(segs.valid)]
    assert len(xyxy) >= 1
    # best segment endpoints near (20,30)-(70,30)
    seg = xyxy[0]
    x_lo, x_hi = sorted([seg[0], seg[2]])
    assert abs(seg[1] - 30) < 2 and abs(seg[3] - 30) < 2
    assert abs(x_lo - 20) < 4 and abs(x_hi - 70) < 4


def test_hough_segments_bridges_gaps():
    img = np.zeros((100, 100), np.float32)
    draw_line(img, 10, 50, 40, 50)
    draw_line(img, 44, 50, 80, 50)  # 4px gap
    e = img > 100
    segs = hough.hough_segments(
        jnp.asarray(e), threshold=30.0, min_line_length=50, max_line_gap=6
    )
    xyxy = np.asarray(segs.xyxy)[np.asarray(segs.valid)]
    assert len(xyxy) >= 1
    seg = xyxy[0]
    assert abs(min(seg[0], seg[2]) - 10) < 4
    assert abs(max(seg[0], seg[2]) - 80) < 4


def test_gftt_checkerboard(checker_image):
    kp = gftt.good_features_to_track(
        jnp.asarray(checker_image), max_corners=64, min_distance=8.0
    )
    n = int(kp.count())
    assert n > 10
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    # pairwise min distance respected (cell suppression: >= cell separation
    # for same-cell, so check nothing closer than 4px)
    d = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 4.0
    # corners lie near checker grid intersections (multiples of 16)
    offs_x = np.minimum(xy[:, 0] % 16, 16 - xy[:, 0] % 16)
    offs_y = np.minimum(xy[:, 1] % 16, 16 - xy[:, 1] % 16)
    assert np.median(offs_x) <= 2.5 and np.median(offs_y) <= 2.5
