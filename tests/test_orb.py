"""ORB pipeline tests: orientation/rotation invariance and end-to-end
detect_and_compute (mirrors features2d/test/test_detectors_invariance.cpp
and test_descriptors_invariance.cpp strategy)."""

import numpy as np
import pytest
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import ORBConfig
from opencv_tpu.ops import matching, orb


def make_textured(rng, h=160, w=200, blobs=150):
    img = np.zeros((h, w), np.float32)
    ys = rng.integers(10, h - 10, blobs)
    xs = rng.integers(10, w - 10, blobs)
    vs = rng.uniform(50, 255, blobs)
    for y, x, v in zip(ys, xs, vs):
        img[y - 2 : y + 3, x - 2 : x + 3] += v * rng.uniform(0.5, 1.0)
    return np.clip(img, 0, 255)


def test_level_budgets_sum():
    b = orb.level_budgets(500, 8, 1.2)
    assert sum(b) == 500
    assert all(x >= 0 for x in b)
    assert b[0] > b[1] > b[2]  # geometric decay


def test_brief_pattern_deterministic():
    p1 = orb.brief_pattern()
    p2 = orb.brief_pattern()
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (256, 4)
    assert np.abs(p1).max() <= orb.PATTERN_RADIUS


def test_extract_patches_center_value(rng):
    img = rng.normal(size=(40, 50)).astype(np.float32)
    xy = np.array([[10.0, 20.0], [30.0, 15.0]], np.float32)
    p = np.asarray(orb.extract_patches(jnp.asarray(img), jnp.asarray(xy), 3))
    assert p.shape == (2, 7, 7)
    assert p[0, 3, 3] == img[20, 10]
    assert p[1, 3, 3] == img[15, 30]


def test_ic_angle_gradient_direction():
    # intensity increasing to the right -> centroid to the right -> angle 0
    h, w = 64, 64
    xx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    ang = np.asarray(orb.ic_angles(jnp.asarray(xx), jnp.asarray([[32.0, 32.0]])))
    assert abs(ang[0]) < 0.05
    # increasing downward -> angle pi/2
    yy = xx.T.copy()
    ang = np.asarray(orb.ic_angles(jnp.asarray(yy), jnp.asarray([[32.0, 32.0]])))
    assert abs(ang[0] - np.pi / 2) < 0.05


def test_ic_angle_rotates_with_image(rng):
    img = make_textured(rng, 128, 128)
    c = 64.0
    theta = np.deg2rad(30.0)
    # rotate image about center by theta (output->input map uses -theta... the
    # inverse rotation inside warp_affine maps output coords to input coords)
    cos, sin = np.cos(theta), np.sin(theta)
    m = np.array(
        [[cos, -sin, c - cos * c + sin * c], [sin, cos, c - sin * c - cos * c]],
        np.float32,
    )
    rot = imgproc.warp_affine(jnp.asarray(img), jnp.asarray(m), 128, 128)
    a0 = float(orb.ic_angles(jnp.asarray(img), jnp.asarray([[c, c]]))[0])
    a1 = float(orb.ic_angles(rot, jnp.asarray([[c, c]]))[0])
    # warp with inverse map rotates content by -theta; random blob
    # patches track it to within interpolation/mask-edge noise
    diff = (a1 - a0 + theta + np.pi) % (2 * np.pi) - np.pi
    assert abs(diff) < 0.3


def test_descriptor_rotation_invariance(rng):
    """Descriptors computed with IC angles should survive image rotation
    (the whole point of the oriented BRIEF construction)."""
    img = make_textured(rng, 160, 160)
    c = 80.0
    theta = np.deg2rad(25.0)
    cos, sin = np.cos(theta), np.sin(theta)
    m = np.array(
        [[cos, -sin, c - cos * c + sin * c], [sin, cos, c - sin * c - cos * c]],
        np.float32,
    )
    rot = imgproc.warp_affine(jnp.asarray(img), jnp.asarray(m), 160, 160)

    pts = np.array([[70.0, 75.0], [90.0, 85.0], [80.0, 70.0]], np.float32)
    # map the same physical points into the rotated image: content rotated
    # by -theta about center => p' = R(-theta) (p - c) + c
    r_inv = np.array([[cos, sin], [-sin, cos]], np.float32)
    pts_rot = (pts - c) @ r_inv.T + c

    def describe(image, xy):
        im = jnp.asarray(image)
        ang = orb.ic_angles(im, jnp.asarray(xy))
        blur = imgproc.gaussian_blur(im, 7, 2.0)
        return orb.brief_descriptors(blur, jnp.asarray(xy), ang)

    d0 = describe(img, pts)
    d1 = describe(np.asarray(rot), pts_rot)
    dist = np.asarray(matching.hamming_matrix(d0, d1))
    # same-point distances far below the ~128 random-pair expectation
    same = np.diag(dist)
    assert same.max() < 70, same
    # and each point matches itself best
    assert (dist.argmin(axis=1) == np.arange(3)).all()


@pytest.mark.slow
def test_detect_and_compute_end_to_end(rng):
    img = make_textured(rng, 160, 200)
    cfg = ORBConfig(n_features=200, n_levels=4)
    kp, desc = orb.detect_and_compute(jnp.asarray(img), cfg)
    n = int(kp.count())
    assert n > 50
    assert desc.shape == (kp.capacity, 8)
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 200
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 160
    # multiple levels populated
    assert len(np.unique(np.asarray(kp.level)[v])) >= 2


def test_detect_and_compute_matches_across_shift(rng):
    """Detect on an image and a 6px-shifted copy; matched keypoints should
    differ by exactly the shift (end-to-end front-end sanity)."""
    img = make_textured(rng, 160, 200)
    shifted = np.roll(img, (4, 6), axis=(0, 1))
    cfg = ORBConfig(n_features=300, n_levels=4)
    kp0, d0 = orb.detect_and_compute(jnp.asarray(img), cfg)
    kp1, d1 = orb.detect_and_compute(jnp.asarray(shifted), cfg)
    m = matching.knn_match(d0, d1, query_valid=kp0.valid, train_valid=kp1.valid)
    v = np.asarray(m.valid)
    assert v.sum() > 30
    p0 = np.asarray(kp0.xy)[np.asarray(m.query_idx)[v]]
    p1 = np.asarray(kp1.xy)[np.asarray(m.train_idx)[v]]
    d = p1 - p0
    med = np.median(d, axis=0)
    assert abs(med[0] - 6.0) < 1.0 and abs(med[1] - 4.0) < 1.0
    inlier = (np.abs(d - [6, 4]) < 2).all(1).mean()
    assert inlier > 0.7


def test_binned_descriptors_close_to_exact(rng):
    """The TPU matmul path (angle-binned rotation) must agree with the
    exact gather path up to quantization noise."""
    img = make_textured(rng, 128, 128)
    from opencv_tpu.core import imgproc as ip

    blur = ip.gaussian_blur(jnp.asarray(img), 7, 2.0)
    xy = np.array([[40.0, 50.0], [70.0, 60.0], [55.0, 80.0], [64.0, 40.0]], np.float32)
    ang = np.asarray(orb.ic_angles(jnp.asarray(img), jnp.asarray(xy)))
    d_exact = orb.brief_descriptors(blur, jnp.asarray(xy), jnp.asarray(ang), method="gather")
    d_binned = orb.brief_descriptors(blur, jnp.asarray(xy), jnp.asarray(ang), method="binned")
    dist = np.asarray(matching.hamming_matrix(d_exact, d_binned))
    assert np.diag(dist).max() <= 40, np.diag(dist)
