"""Detector-breadth tests: AGAST, MSER, BRISK, AKAZE.

Mirrors the reference's detector test style (features2d/test/
test_detectors_invariance.cpp etc.): brute-force gold checks on tiny
images, plus rotation-consistency sanity on synthetic corners.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import agast, akaze, brisk, matching, mser


def _segment_score_ref(img, ring, arc):
    """Brute-force AGAST/FAST corner score (gold)."""
    h, w = img.shape
    out = np.full((h, w), -1e9, np.float32)
    r = max(max(abs(dx), abs(dy)) for dx, dy in ring)
    n = len(ring)
    for y in range(r, h - r):
        for x in range(r, w - r):
            taps = np.array([img[y + dy, x + dx] for dx, dy in ring], np.float32)
            best = -1e9
            for s in range(n):
                seg = taps[(np.arange(s, s + arc)) % n]
                best = max(best, (seg - img[y, x]).min(), (img[y, x] - seg).min())
            out[y, x] = best
    return out


@pytest.mark.parametrize("kind", [agast.AGAST_5_8, agast.AGAST_7_12d,
                                  agast.AGAST_7_12s, agast.OAST_9_16])
def test_agast_score_matches_bruteforce(rng, kind):
    img = rng.uniform(0, 255, (24, 26)).astype(np.float32)
    got = np.asarray(agast.agast_score(jnp.asarray(img), kind))
    ring, arc, radius = agast._TYPES[kind]
    want = _segment_score_ref(img, ring, arc)
    inner = (slice(radius, -radius), slice(radius, -radius))
    np.testing.assert_allclose(got[inner], want[inner], atol=1e-4)


def test_agast_detects_corner(checker_image):
    kp = agast.agast_detect(jnp.asarray(checker_image), 128, threshold=20.0)
    assert int(np.sum(np.asarray(kp.valid))) > 10


def test_mser_finds_planted_dark_blobs():
    img = np.full((96, 120), 200.0, np.float32)
    blobs = [(20, 24, 9), (60, 40, 7), (40, 90, 11)]  # (cy, cx, radius)
    yy, xx = np.mgrid[0:96, 0:120]
    for cy, cx, r in blobs:
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 40.0
    regions = mser.mser_detect(jnp.asarray(img), max_regions=16,
                               min_area=30.0, max_area=2000.0)
    xy = np.asarray(regions.xy)
    valid = np.asarray(regions.valid)
    assert valid.sum() >= 3
    for cy, cx, r in blobs:
        d = np.linalg.norm(xy[valid] - np.array([cx, cy]), axis=1)
        assert d.min() < 3.0, f"blob at {(cx, cy)} not found"
    # areas near pi*r^2
    area = np.asarray(regions.area)[valid]
    for cy, cx, r in blobs:
        d = np.linalg.norm(xy[valid] - np.array([cx, cy]), axis=1)
        a = area[np.argmin(d)]
        assert abs(a - np.pi * r * r) / (np.pi * r * r) < 0.5


def test_brisk_descriptor_rotation_consistency(rng):
    """Descriptors of the same keypoints should match across a small
    in-plane rotation (the invariance property BRISK exists for).

    Texture: blurred random noise — locally asymmetric, so orientations
    are well-defined (a checkerboard's 90-degree symmetry makes the
    long-pair orientation vote ambiguous by construction)."""
    from opencv_tpu.core import imgproc

    raw = rng.uniform(0, 255, (128, 160)).astype(np.float32)
    img = imgproc.gaussian_blur(jnp.asarray(raw), ksize=7, sigma=1.2)
    checker_image = np.asarray(img)
    kp, desc = brisk.brisk_detect_and_compute(img, max_keypoints=64,
                                              threshold=8.0, n_levels=3)
    assert desc.shape[1] == 16  # 512 bits
    nvalid = int(np.sum(np.asarray(kp.valid)))
    assert nvalid > 8

    # rotate image 12 degrees about center, re-describe at mapped positions
    h, w = checker_image.shape
    th = np.deg2rad(12.0)
    c, s = np.cos(th), np.sin(th)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    m = jnp.asarray([[c, -s, cx - c * cx + s * cy],
                     [s, c, cy - s * cx - c * cy]], jnp.float32)
    rot = imgproc.warp_affine(img, m, h, w)
    xy = np.asarray(kp.xy)
    # warp_affine's m maps output->input, so source keypoints land at the
    # INVERSE rotation of their coordinates in the output image
    fwd = np.stack([c * (xy[:, 0] - cx) + s * (xy[:, 1] - cy) + cx,
                    -s * (xy[:, 0] - cx) + c * (xy[:, 1] - cy) + cy], 1)
    inside = ((fwd[:, 0] > 20) & (fwd[:, 0] < w - 20)
              & (fwd[:, 1] > 20) & (fwd[:, 1] < h - 20))
    kp2 = type(kp)(
        xy=jnp.asarray(fwd), response=kp.response, angle=kp.angle,
        level=kp.level, size=kp.size,
        valid=kp.valid & jnp.asarray(inside),
    )
    desc2, _ = brisk.brisk_compute(rot, kp2)
    dist = np.asarray(matching.hamming_matrix(desc, desc2))
    ok = np.asarray(kp.valid) & inside
    # same-keypoint distance should beat the row median by a wide margin
    diag = np.diag(dist)[ok]
    med = np.median(dist[ok], axis=1)
    assert np.mean(diag < 0.75 * med) > 0.7


def test_akaze_detect_and_compute(checker_image):
    kp, desc = akaze.akaze_detect_and_compute(
        jnp.asarray(checker_image), max_keypoints=128, n_levels=4
    )
    assert desc.shape == (128, 16)
    nvalid = int(np.sum(np.asarray(kp.valid)))
    assert nvalid > 10
    # descriptors of valid keypoints are not all identical
    d = np.asarray(desc)[np.asarray(kp.valid)]
    assert np.unique(d, axis=0).shape[0] > nvalid // 2


def test_fed_taus_sum_to_time():
    for T in (0.5, 2.0, 7.3):
        taus = akaze.fed_taus(T)
        assert abs(float(taus.sum()) - T) < 1e-3
        assert (taus > 0).all()
