"""LSD line-segment detector vs known geometry + cv2 gold.

Reference: modules/imgproc/src/lsd.cpp:1."""

import numpy as np
import pytest

from opencv_tpu.ops import lsd

cv2 = pytest.importorskip("cv2")


def _seg_dist(seg, x1, y1, x2, y2):
    """Endpoint distance up to direction flip."""
    a = np.hypot(seg[0] - x1, seg[1] - y1) + np.hypot(seg[2] - x2, seg[3] - y2)
    b = np.hypot(seg[0] - x2, seg[1] - y2) + np.hypot(seg[2] - x1, seg[3] - y1)
    return min(a, b) / 2


def _draw_scene(rng):
    img = np.full((120, 160), 40, np.float32)
    img += rng.normal(0, 2.0, img.shape).astype(np.float32)
    img8 = img.astype(np.uint8)
    cv2.line(img8, (20, 30), (130, 30), 220, 2)     # horizontal
    cv2.line(img8, (30, 100), (120, 55), 220, 2)    # diagonal
    cv2.line(img8, (145, 15), (145, 105), 220, 2)   # vertical
    return img8


GT = [
    (20, 30, 130, 30),
    (30, 100, 120, 55),
    (145, 15, 145, 105),
]


def test_lsd_finds_drawn_segments(rng):
    img8 = _draw_scene(rng)
    segs = lsd.detect_lines(img8.astype(np.float32))
    assert len(segs) >= 3, len(segs)
    for gt in GT:
        d = min(_seg_dist(s, *gt) for s in segs)
        assert d < 6.0, (gt, d)


def test_lsd_parity_with_cv2(rng):
    """cv2's LSD on the same scene: we must find every segment cv2
    finds that is >= 25 px long, to within endpoint tolerance."""
    img8 = _draw_scene(rng)
    det = cv2.createLineSegmentDetector()
    out = det.detect(img8)[0]
    cv_segs = out.reshape(-1, 4) if out is not None else np.zeros((0, 4))
    long_cv = [
        s for s in cv_segs if np.hypot(s[2] - s[0], s[3] - s[1]) >= 25
    ]
    assert long_cv, "cv2 LSD found nothing long — scene broken"
    ours = lsd.detect_lines(img8.astype(np.float32))
    for s in long_cv:
        d = min(_seg_dist(o, s[0], s[1], s[2], s[3]) for o in ours)
        assert d < 8.0, (s, d)


def test_lsd_empty_on_flat(rng):
    flat = np.full((60, 80), 90.0, np.float32)
    flat += rng.normal(0, 0.5, flat.shape).astype(np.float32)
    segs = lsd.detect_lines(flat)
    assert len(segs) == 0
