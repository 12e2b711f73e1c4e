"""FAST segment-test corner detection, TPU-native.

The reference implements FAST three ways: a SIMD CPU path
(features2d/src/fast.cpp:56-289 `FAST_t<16>` + fast_score.cpp
`cornerScore`), and a one-thread-per-pixel CUDA kernel with atomic
keypoint compaction (cudafeatures2d/src/cuda/fast.cu:219 `calcKeypoints`,
:318 `nonmaxSuppression`).

TPU-native design: the whole image is processed as 16 shifted copies
(the Bresenham circle taps) — pure VPU elementwise work that XLA fuses
into one pass. Instead of computing a boolean segment test and a separate
score, we compute only the *score*

    V(p) = max( max_s min_{j<9} (tap_{s+j} - p),
                max_s min_{9<j} (p - tap_{s+j}) )

(the max threshold at which p still passes the test, identical in spirit
to `cornerScore<16>`, fast_score.cpp:50); the corner mask is then simply
``V > threshold``. Circular window minima are computed with an
O(log n)-step shift-and-min tree. Keypoint "compaction" (the CUDA atomic
counter) is replaced by masked `lax.top_k` — static shapes, no atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import KeyPoints, masked_top_k

# Bresenham circle of radius 3, 16 points, clockwise from 12 o'clock.
# (dx, dy) pairs; the standard FAST-16 test ring.
CIRCLE16 = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
# the smaller rings of FastFeatureDetector TYPE_7_12 and TYPE_5_8
# (features2d/src/fast.cpp FAST_t<12>/<8> via makeOffsets patterns)
CIRCLE12 = (
    (0, -2), (1, -2), (2, -1), (2, 0), (2, 1), (1, 2),
    (0, 2), (-1, 2), (-2, 1), (-2, 0), (-2, -1), (-1, -2),
)
CIRCLE8 = (
    (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1),
)
PATTERNS = {16: (CIRCLE16, 9, 3), 12: (CIRCLE12, 7, 2), 8: (CIRCLE8, 5, 1)}


def _circular_window_min(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """min over a length-n circular window along axis 0, for each start.

    out[i] = min(x[i], x[i+1], ..., x[i+n-1])  (indices mod len).
    Log-depth shift-and-min tree: w(a+b)[i] = min(w(a)[i], w(b)[i+a]).
    """
    have = {1: x}

    def get(k: int) -> jnp.ndarray:
        if k in have:
            return have[k]
        half = 1 << (k.bit_length() - 1)
        if half == k:
            h = get(k // 2)
            have[k] = jnp.minimum(h, jnp.roll(h, -(k // 2), axis=0))
        else:
            have[k] = jnp.minimum(get(half), jnp.roll(get(k - half), -half, axis=0))
        return have[k]

    return get(n)


def fast_score(
    img: jnp.ndarray, arc_length: int | None = None, pattern_size: int = 16,
    use_pallas: bool | str = "auto",
) -> jnp.ndarray:
    """Per-pixel FAST corner score V (see module docstring). f32 [H, W].

    Pixels within 3 px of the border score -inf (no full circle).
    On TPU the fused Pallas strip kernel (ops/pallas/fast_kernel.py) is
    used by default — same values, ~20x less HBM traffic.
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and pattern_size == 16:
        from opencv_tpu.ops.pallas.fast_kernel import fast_score_pallas

        return fast_score_pallas(img, 9 if arc_length is None else arc_length)
    circle, default_arc, radius = PATTERNS[pattern_size]
    if arc_length is None:
        arc_length = default_arc
    img = img.astype(jnp.float32)
    neg = jnp.float32(-1e9)
    taps = jnp.stack(
        [imgproc.shift2d(img, dy, dx, fill=0.0) for (dx, dy) in circle], axis=0
    )  # [P, H, W]
    diff_bright = taps - img[None]  # tap - center
    diff_dark = -diff_bright  # center - tap
    vb = jnp.max(_circular_window_min(diff_bright, arc_length), axis=0)
    vd = jnp.max(_circular_window_min(diff_dark, arc_length), axis=0)
    score = jnp.maximum(vb, vd)
    # invalidate the frame where circle taps fall outside the image
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (yy >= radius) & (yy < h - radius) & (xx >= radius) & (xx < w - radius)
    )
    return jnp.where(inside, score, neg)


def fast_corners(
    img: jnp.ndarray,
    threshold: float,
    arc_length: int | None = None,
    pattern_size: int = 16,
    nonmax_suppression: bool = True,
    use_pallas: bool | str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(score [H,W], corner_mask [H,W]) — the shared detection front half
    of cv::FAST and ORB's per-level detection. On TPU the score + NMS
    stencils run fused in one Pallas pass."""
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and nonmax_suppression and pattern_size == 16:
        from opencv_tpu.ops.pallas.fast_kernel import fast_corners_pallas

        score, nmsed = fast_corners_pallas(
            img, threshold, 9 if arc_length is None else arc_length
        )
        return score, nmsed > -1e8
    score = fast_score(img, arc_length, pattern_size, use_pallas=use_pallas)
    corner = score > threshold
    if nonmax_suppression:
        corner &= imgproc.nms_2d(jnp.where(corner, score, -jnp.inf))
    return score, corner


def fast_detect(
    img: jnp.ndarray,
    max_keypoints: int,
    threshold: float = 20.0,
    nonmax_suppression: bool = True,
    arc_length: int | None = None,
    pattern_size: int = 16,
    border: int = 3,
) -> KeyPoints:
    """FAST keypoints (analog of cv::FAST, features2d/src/fast.cpp:492).

    Returns a fixed-capacity KeyPoints with the `max_keypoints` strongest
    corners (score-sorted, the TPU replacement for dynamic compaction).
    `border`: minimum distance from the image edge (>= 3).
    """
    h, w = img.shape
    score, corner = fast_corners(
        img, threshold, arc_length, pattern_size, nonmax_suppression
    )
    if border > 3:
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        corner &= (
            (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
        )
    flat_score = score.reshape(-1)
    flat_valid = corner.reshape(-1)
    idx, keep = masked_top_k(flat_score, flat_valid, max_keypoints)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return KeyPoints(
        xy=jnp.stack([xs, ys], axis=-1),
        response=jnp.where(keep, flat_score[idx], -jnp.inf),
        angle=jnp.zeros((max_keypoints,), jnp.float32),
        level=jnp.zeros((max_keypoints,), jnp.int32),
        size=jnp.full((max_keypoints,), 7.0, jnp.float32),
        valid=keep,
    )
