"""FAST detector vs a naive NumPy segment-test reference (CPU-gold pattern,
mirrors the reference's CUDA-FAST-vs-cv::FAST tests,
cudafeatures2d/test/test_features2d.cpp:76-96)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import fast


def naive_fast_mask(img, threshold, arc=9):
    """Direct per-pixel segment test."""
    h, w = img.shape
    out = np.zeros((h, w), bool)
    offs = fast.CIRCLE16
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            taps = np.array([img[y + dy, x + dx] for (dx, dy) in offs])
            bright = taps > c + threshold
            dark = taps < c - threshold
            for b in (bright, dark):
                ext = np.concatenate([b, b])
                run = 0
                best = 0
                for v in ext:
                    run = run + 1 if v else 0
                    best = max(best, run)
                if best >= arc:
                    out[y, x] = True
                    break
    return out


def test_fast_score_mask_matches_naive(rng):
    img = rng.integers(0, 255, size=(24, 28)).astype(np.float32)
    t = 20.0
    score = np.asarray(fast.fast_score(jnp.asarray(img)))
    got = score > t
    want = naive_fast_mask(img, t)
    np.testing.assert_array_equal(got, want)


def test_fast_score_synthetic_corner():
    # bright dot on dark background: clearly a corner, score = contrast
    img = np.zeros((16, 16), np.float32)
    img[8, 8] = 100.0
    # a single pixel: all 16 taps are 0, center 100 -> dark arc min = 100
    score = np.asarray(fast.fast_score(jnp.asarray(img)))
    assert score[8, 8] == 100.0


def test_fast_detect_returns_strongest(rng):
    img = rng.normal(0, 2.0, size=(40, 50)).astype(np.float32)
    # plant three corners of different strengths
    for (y, x, v) in [(10, 10, 200.0), (20, 30, 150.0), (30, 15, 120.0)]:
        img[y, x] += v
    kp = fast.fast_detect(jnp.asarray(img), max_keypoints=8, threshold=50.0)
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    resp = np.asarray(kp.response)[np.asarray(kp.valid)]
    assert len(xy) == 3
    # sorted by score descending
    assert resp[0] >= resp[1] >= resp[2]
    assert tuple(xy[0]) == (10.0, 10.0)
    got = {tuple(p) for p in xy}
    assert got == {(10.0, 10.0), (30.0, 20.0), (15.0, 30.0)}


def test_fast_detect_border_excluded(rng):
    img = np.zeros((20, 20), np.float32)
    img[1, 1] = 200.0  # too close to border for a full circle
    kp = fast.fast_detect(jnp.asarray(img), max_keypoints=4, threshold=20.0)
    assert int(kp.count()) == 0


def test_fast_nonmax_suppression(rng):
    img = np.zeros((20, 20), np.float32)
    img[10, 10] = 100.0
    img[10, 11] = 90.0  # weaker neighbour corner must be suppressed
    kp = fast.fast_detect(jnp.asarray(img), max_keypoints=8, threshold=20.0,
                          nonmax_suppression=True)
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert (10.0, 10.0) in {tuple(p) for p in xy}
    assert (11.0, 10.0) not in {tuple(p) for p in xy}


def test_fast_pattern_variants(rng):
    """TYPE_7_12 and TYPE_5_8 analogs: smaller rings still fire on a
    bright dot and agree with a naive check of their own pattern."""
    img = np.zeros((20, 20), np.float32)
    img[10, 10] = 100.0
    for psize in (12, 8):
        score = np.asarray(
            fast.fast_score(jnp.asarray(img), pattern_size=psize, use_pallas=False)
        )
        assert score[10, 10] == 100.0
    # naive check for pattern 12, arc 7 on random image
    img = rng.integers(0, 255, size=(20, 24)).astype(np.float32)
    score = np.asarray(
        fast.fast_score(jnp.asarray(img), pattern_size=12, use_pallas=False)
    )
    t = 25.0
    got = score > t
    offs = fast.CIRCLE12
    for y in range(2, 18):
        for x in range(2, 22):
            c = img[y, x]
            taps = np.array([img[y + dy, x + dx] for (dx, dy) in offs])
            def has_arc(b, arc=7):
                ext = np.concatenate([b, b])
                run = best = 0
                for v in ext:
                    run = run + 1 if v else 0
                    best = max(best, run)
                return best >= arc
            want = has_arc(taps > c + t) or has_arc(taps < c - t)
            assert got[y, x] == want, (y, x)
