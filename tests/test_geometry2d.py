"""rotatedRectangleIntersection + minEnclosingTriangle + exact EMD vs
cv2 gold. Reference: imgproc/src/{intersection.cpp:1,
min_enclosing_triangle.cpp:1,emd.cpp:1}."""

import numpy as np
import pytest

from opencv_tpu.ops import contours as ct
from opencv_tpu.ops.shape import emd_exact

cv2 = pytest.importorskip("cv2")


def _hull_area(pts):
    if pts is None or len(pts) == 0:
        return 0.0
    return cv2.contourArea(
        cv2.convexHull(np.asarray(pts, np.float32).reshape(-1, 1, 2))
    )


@pytest.mark.parametrize(
    "r1,r2,want_status",
    [
        (((50., 50.), (40., 20.), 30.), ((60., 55.), (30., 30.), -10.),
         cv2.INTERSECT_PARTIAL),
        (((50., 50.), (40., 20.), 30.), ((50., 50.), (8., 8.), 0.),
         cv2.INTERSECT_FULL),
        (((50., 50.), (40., 20.), 30.), ((200., 200.), (10., 10.), 0.),
         cv2.INTERSECT_NONE),
        (((0., 0.), (20., 20.), 45.), ((10., 0.), (20., 20.), 0.),
         cv2.INTERSECT_PARTIAL),
    ],
)
def test_rotated_rect_intersection_matches_cv2(r1, r2, want_status):
    st_cv, pts_cv = cv2.rotatedRectangleIntersection(r1, r2)
    st_us, pts_us = ct.rotated_rect_intersection(r1, r2)
    assert st_cv == want_status
    assert st_us == st_cv
    assert abs(_hull_area(pts_us) - _hull_area(pts_cv)) < 1e-3


def test_rotated_rect_intersection_random(rng):
    for _ in range(25):
        r1 = (tuple(rng.uniform(30, 70, 2)), tuple(rng.uniform(5, 40, 2)),
              float(rng.uniform(-90, 90)))
        r2 = (tuple(rng.uniform(30, 70, 2)), tuple(rng.uniform(5, 40, 2)),
              float(rng.uniform(-90, 90)))
        st_cv, pts_cv = cv2.rotatedRectangleIntersection(r1, r2)
        st_us, pts_us = ct.rotated_rect_intersection(r1, r2)
        assert st_us == st_cv, (r1, r2)
        a_cv, a_us = _hull_area(pts_cv), _hull_area(pts_us)
        assert abs(a_us - a_cv) <= 1e-3 * max(a_cv, 1.0), (r1, r2)


def test_min_enclosing_triangle_near_optimal(rng):
    """Area within 0.1% of cv2's exact O'Rourke optimum, and the
    triangle actually contains every point."""
    for _ in range(5):
        pts = (rng.normal(0, 10, (25, 2)) * [2, 1] + 50).astype(np.float32)
        a_cv, _ = cv2.minEnclosingTriangle(pts.reshape(-1, 1, 2))
        tri, a_us = ct.min_enclosing_triangle(pts)
        assert a_us <= 1.001 * a_cv + 1e-6, (a_us, a_cv)
        # containment (sign of cross products, either orientation)
        v = tri.astype(np.float64)
        signs = []
        for i in range(3):
            e = v[(i + 1) % 3] - v[i]
            d = pts - v[i]
            signs.append(e[0] * d[:, 1] - e[1] * d[:, 0])
        signs = np.stack(signs)
        inside = (signs >= -1e-3).all(0) | (signs <= 1e-3).all(0)
        assert inside.all()


def test_emd_exact_matches_cv2(rng):
    for _ in range(8):
        m, n = int(rng.integers(3, 9)), int(rng.integers(3, 9))
        w1 = rng.uniform(0.1, 2.0, m).astype(np.float32)
        w2 = rng.uniform(0.1, 2.0, n).astype(np.float32)
        p1 = rng.uniform(0, 10, (m, 2)).astype(np.float32)
        p2 = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        sig1 = np.hstack([w1[:, None], p1]).astype(np.float32)
        sig2 = np.hstack([w2[:, None], p2]).astype(np.float32)
        want, _, _ = cv2.EMD(sig1, sig2, cv2.DIST_L2)
        got = emd_exact(w1, w2, pos1=p1, pos2=p2, metric="l2")
        assert abs(got - want) < 2e-4 * max(1.0, want)


def test_emd_exact_l1_and_explicit_cost(rng):
    w1 = np.array([0.5, 0.5], np.float32)
    w2 = np.array([1.0], np.float32)
    p1 = np.array([[0.0], [2.0]], np.float32)
    p2 = np.array([[1.0]], np.float32)
    got = emd_exact(w1, w2, pos1=p1, pos2=p2, metric="l1")
    assert abs(got - 1.0) < 1e-9  # both halves move distance 1
    cost = np.array([[3.0, 1.0], [1.0, 3.0]], np.float32)
    got = emd_exact(np.array([1.0, 1.0]), np.array([1.0, 1.0]), cost=cost)
    assert abs(got - 1.0) < 1e-9  # cross assignment, cost 2 over mass 2
