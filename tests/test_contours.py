"""Contours + shape analysis vs cv2 gold (when importable) and invariants.

Reference slots: imgproc/src/{contours,moments,shapedescr,convhull,approx,
rotcalipers,matchcontours,geometry}.cpp.
"""

import numpy as np
import pytest

from opencv_tpu.ops import contours as ct

cv2 = pytest.importorskip("cv2", reason="cv2 gold unavailable")


@pytest.fixture(scope="module")
def blob_mask():
    """Two blobs, one with a hole."""
    m = np.zeros((96, 128), np.uint8)
    yy, xx = np.mgrid[:96, :128]
    m[(yy - 30) ** 2 + (xx - 40) ** 2 < 20 ** 2] = 255  # disk
    m[(yy - 30) ** 2 + (xx - 40) ** 2 < 8 ** 2] = 0  # hole in it
    m[60:85, 80:120] = 255  # rectangle
    return m


@pytest.fixture(scope="module")
def noisy_poly(rng_mod=np.random.default_rng(7)):
    """Points scattered near an ellipse for fitting tests."""
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    x = 64 + 30 * np.cos(t) * np.cos(0.4) - 14 * np.sin(t) * np.sin(0.4)
    y = 48 + 30 * np.cos(t) * np.sin(0.4) + 14 * np.sin(t) * np.cos(0.4)
    pts = np.stack([x, y], 1).astype(np.float32)
    return pts + rng_mod.normal(0, 0.15, pts.shape).astype(np.float32)


def _cv_contours(mask):
    res = cv2.findContours(mask, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE)
    cs, hier = res[-2], res[-1]
    return [c.reshape(-1, 2) for c in cs], hier[0]


def test_find_contours_matches_cv2_point_sets(blob_mask):
    ours = ct.find_contours(blob_mask)
    gold, hier = _cv_contours(blob_mask)
    n_ours = int(ours.valid.sum())
    assert n_ours == len(gold)
    # compare as unordered point SETS per contour, matched by max overlap
    gold_sets = [{(int(p[0]), int(p[1])) for p in g} for g in gold]
    for i in range(n_ours):
        k = int(ours.lengths[i])
        oset = {(int(p[0]), int(p[1])) for p in ours.points[i, :k]}
        gset = max(gold_sets, key=lambda g: len(g & oset))
        inter = len(gset & oset)
        assert inter / max(len(gset), len(oset)) > 0.95, (
            f"contour {i}: {inter}/{len(gset)} vs {len(oset)}"
        )


def test_find_contours_hierarchy(blob_mask):
    ours = ct.find_contours(blob_mask)
    n = int(ours.valid.sum())
    holes = [i for i in range(n) if ours.is_hole[i]]
    outers = [i for i in range(n) if not ours.is_hole[i]]
    assert len(holes) == 1 and len(outers) == 2
    # the hole's parent is the disk (the outer contour with ~20px radius)
    hp = int(ours.parent[holes[0]])
    assert hp in outers


def test_contour_moments_match_cv2(blob_mask):
    gold, _ = _cv_contours(blob_mask)
    big = max(gold, key=cv2.contourArea)
    m_cv = cv2.moments(big)
    m = ct.contour_moments(np.asarray(big, np.float32))
    for name in ["m00", "m10", "m01", "m20", "m11", "m02", "m30", "m21", "m12", "m03"]:
        ref = m_cv[name]
        got = float(getattr(m, name))
        assert got == pytest.approx(ref, rel=1e-5, abs=1e-3), name
    for name in ["mu20", "mu11", "mu02", "mu30", "mu21", "mu12", "mu03"]:
        assert float(getattr(m, name)) == pytest.approx(
            m_cv[name], rel=1e-4, abs=1e-2
        ), name


def test_image_moments_match_cv2(blob_mask):
    m_cv = cv2.moments(blob_mask, binaryImage=False)
    m = ct.image_moments(blob_mask.astype(np.float64))
    for name in ["m00", "m10", "m01", "m20", "m02", "mu20", "mu02", "mu11"]:
        assert float(getattr(m, name)) == pytest.approx(m_cv[name], rel=1e-6), name


def test_hu_moments_match_cv2(blob_mask):
    gold, _ = _cv_contours(blob_mask)
    big = max(gold, key=cv2.contourArea)
    hu_cv = cv2.HuMoments(cv2.moments(big)).ravel()
    hu = np.asarray(ct.hu_moments(ct.contour_moments(np.asarray(big, np.float32))))
    np.testing.assert_allclose(hu, hu_cv, rtol=1e-4, atol=1e-12)


def test_hu_rotation_invariance(noisy_poly):
    theta = 0.9
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        np.float32,
    )
    hu1 = np.asarray(ct.hu_moments(ct.contour_moments(noisy_poly)))
    hu2 = np.asarray(ct.hu_moments(ct.contour_moments(noisy_poly @ R.T + 5.0)))
    np.testing.assert_allclose(hu1[:4], hu2[:4], rtol=1e-3, atol=1e-12)


def test_area_arclength_match_cv2(blob_mask):
    gold, _ = _cv_contours(blob_mask)
    for g in gold:
        g32 = np.asarray(g, np.float32)
        assert float(ct.contour_area(g32)) == pytest.approx(
            cv2.contourArea(g), abs=0.5
        )
        assert float(ct.arc_length(g32, closed=True)) == pytest.approx(
            cv2.arcLength(g.reshape(-1, 1, 2), True), rel=1e-5
        )


def test_bounding_rect_matches_cv2(blob_mask):
    gold, _ = _cv_contours(blob_mask)
    for g in gold:
        x, y, w, h = cv2.boundingRect(g.reshape(-1, 1, 2))
        got = np.asarray(ct.bounding_rect(np.asarray(g, np.float32)))
        np.testing.assert_array_equal(got, [x, y, w, h])


def test_convex_hull_matches_cv2(noisy_poly):
    hull_cv = cv2.convexHull(noisy_poly.reshape(-1, 1, 2)).reshape(-1, 2)
    hull = ct.convex_hull(noisy_poly)
    assert hull.shape[0] == hull_cv.shape[0]
    # same point set (cyclic order may start elsewhere)
    sa = {tuple(np.round(p, 3)) for p in hull}
    sb = {tuple(np.round(p, 3)) for p in hull_cv}
    assert sa == sb


def test_is_contour_convex():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    concave = np.array([[0, 0], [10, 0], [5, 3], [5, 10]], np.float32)
    assert bool(ct.is_contour_convex(square))
    assert not bool(ct.is_contour_convex(concave))


def test_approx_poly_dp_recovers_square():
    # a densely-sampled square simplifies to exactly 4 corners
    side = np.linspace(0, 20, 21)
    sq = np.concatenate(
        [
            np.stack([side, np.zeros_like(side)], 1),
            np.stack([np.full_like(side, 20), side], 1),
            np.stack([side[::-1], np.full_like(side, 20)], 1),
            np.stack([np.zeros_like(side), side[::-1]], 1),
        ]
    )
    out = ct.approx_poly_dp(sq, epsilon=1.0, closed=True)
    assert out.shape[0] == 4
    gold = cv2.approxPolyDP(sq.astype(np.float32).reshape(-1, 1, 2), 1.0, True)
    assert gold.reshape(-1, 2).shape[0] == 4


def test_fit_ellipse_recovers_parameters(noisy_poly):
    center, axes, ang = ct.fit_ellipse(noisy_poly)
    (cx, cy), (w, h), ang_cv = cv2.fitEllipse(noisy_poly.reshape(-1, 1, 2))
    assert float(center[0]) == pytest.approx(cx, abs=0.3)
    assert float(center[1]) == pytest.approx(cy, abs=0.3)
    assert sorted([float(axes[0]), float(axes[1])]) == pytest.approx(
        sorted([w, h]), rel=0.03
    )


def test_fit_line_l2_matches_cv2():
    rng = np.random.default_rng(3)
    t = rng.uniform(-10, 10, 120).astype(np.float32)
    pts = np.stack([2 + 0.6 * t, -1 + 0.8 * t], 1)
    pts += rng.normal(0, 0.05, pts.shape).astype(np.float32)
    ours = np.asarray(ct.fit_line(pts, dist_type="l2"))
    gold = cv2.fitLine(pts.reshape(-1, 1, 2), cv2.DIST_L2, 0, 0.01, 0.01).ravel()
    # direction up to sign
    d = abs(ours[0] * gold[0] + ours[1] * gold[1])
    assert d == pytest.approx(1.0, abs=1e-4)


def test_fit_line_huber_rejects_outliers():
    rng = np.random.default_rng(4)
    t = rng.uniform(-10, 10, 200).astype(np.float32)
    pts = np.stack([0.6 * t, 0.8 * t], 1)
    pts[:20] = rng.uniform(-30, 30, (20, 2))  # 10% gross outliers
    v = np.asarray(ct.fit_line(pts, dist_type="huber"))
    d = abs(v[0] * 0.6 + v[1] * 0.8)
    assert d == pytest.approx(1.0, abs=5e-3)


def test_min_area_rect_matches_cv2(noisy_poly):
    c_cv, s_cv, a_cv = cv2.minAreaRect(noisy_poly.reshape(-1, 1, 2))
    c, s, a = ct.min_area_rect(noisy_poly)
    assert float(s[0]) * float(s[1]) == pytest.approx(s_cv[0] * s_cv[1], rel=1e-3)
    np.testing.assert_allclose(np.asarray(c), c_cv, atol=0.2)
    corners = ct.box_points(c, s, a)
    gold = cv2.boxPoints((c_cv, s_cv, a_cv))
    # corner sets equal up to cyclic order
    da = np.linalg.norm(
        np.sort(corners, axis=0) - np.sort(gold, axis=0), axis=1
    ).max()
    assert da < 0.35


def test_min_enclosing_circle_matches_cv2(noisy_poly):
    (cx, cy), r = cv2.minEnclosingCircle(noisy_poly.reshape(-1, 1, 2))
    c, rr = ct.min_enclosing_circle(noisy_poly)
    assert float(rr) == pytest.approx(r, rel=2e-3)
    np.testing.assert_allclose(np.asarray(c), [cx, cy], atol=0.15)
    # certification: all points inside, >=2 points on the boundary
    d = np.linalg.norm(noisy_poly - np.asarray(c), axis=1)
    assert d.max() <= float(rr) * (1 + 1e-5)
    assert (d > float(rr) - 1e-2).sum() >= 2


def test_match_shapes_agrees_with_cv2(blob_mask):
    gold, _ = _cv_contours(blob_mask)
    a, b = gold[0], gold[-1]
    hu = lambda g: ct.hu_moments(ct.contour_moments(np.asarray(g, np.float32)))
    for method in (1, 2, 3):
        ours = float(ct.match_shapes(hu(a), hu(b), method))
        ref = cv2.matchShapes(a, b, method, 0)
        assert ours == pytest.approx(ref, rel=1e-3, abs=1e-6), method


def test_point_polygon_test_matches_cv2(blob_mask):
    gold, _ = _cv_contours(blob_mask)
    poly = max(gold, key=cv2.contourArea).astype(np.float32)
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, [128, 96], (50, 2)).astype(np.float32)
    ours_sign = np.asarray(ct.point_polygon_test(poly, pts))
    ours_dist = np.asarray(ct.point_polygon_test(poly, pts, measure_dist=True))
    for i, p in enumerate(pts):
        ref = cv2.pointPolygonTest(poly.reshape(-1, 1, 2), tuple(p), False)
        refd = cv2.pointPolygonTest(poly.reshape(-1, 1, 2), tuple(p), True)
        if abs(refd) > 0.75:  # skip razor-edge cases where conventions differ
            assert np.sign(ours_sign[i]) == np.sign(ref), (i, p, refd)
            assert ours_dist[i] == pytest.approx(refd, abs=0.51)


def test_mser_style_usage_region_stats(blob_mask):
    """The family composes: contours -> moments -> ellipse, the region
    path MSER/blob had to hand-roll before this module existed."""
    cs = ct.find_contours(blob_mask, min_points=8)
    n = int(cs.valid.sum())
    assert n >= 2
    for i in range(n):
        k = int(cs.lengths[i])
        pts = cs.points[i, :k].astype(np.float32)
        area = float(ct.contour_area(pts))
        if area < 50 or k < 10:
            continue
        center, axes, _ = ct.fit_ellipse(pts)
        # ellipse center inside the bounding rect
        x, y, w, h = np.asarray(ct.bounding_rect(pts))
        assert x - 1 <= float(center[0]) <= x + w + 1
        assert y - 1 <= float(center[1]) <= y + h + 1
