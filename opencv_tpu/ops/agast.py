"""AGAST corner detection, TPU-native.

The reference (features2d/src/agast.cpp, 18k LoC with agast_score.cpp)
implements AGAST as four enormous machine-generated decision trees, one
per pattern geometry (AGAST_5_8, AGAST_7_12d, AGAST_7_12s, OAST_9_16),
that early-exit the segment test per pixel. The decision tree is purely
a CPU branch-prediction optimization: the *decision function* is the same
arc segment test as FAST, evaluated on four different ring geometries,
with the same max-threshold corner score for nonmax suppression
(agast_score.cpp `agast_cornerScore`).

TPU-native design: branches are poison on a vector unit, so we evaluate
the segment test for ALL pixels at once via the shift-and-min tree shared
with FAST (ops/fast.py `_circular_window_min`) — the decision tree
degenerates to the thing it was approximating. Only the ring geometry
differs per type; AGAST_7_12d's diamond ring is the one pattern FAST does
not already have.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import KeyPoints, masked_top_k
from opencv_tpu.ops import fast as _fast

# agast.cpp pattern geometries. Clockwise from 12 o'clock, (dx, dy).
# AGAST_7_12d: diamond (L1 ball of radius 3), 12 taps.
DIAMOND12 = (
    (0, -3), (1, -2), (2, -1), (3, 0), (2, 1), (1, 2),
    (0, 3), (-1, 2), (-2, 1), (-3, 0), (-2, -1), (-1, -2),
)

# type -> (ring, required arc length, border radius)
AGAST_5_8 = "5_8"
AGAST_7_12d = "7_12d"
AGAST_7_12s = "7_12s"
OAST_9_16 = "9_16"
_TYPES = {
    AGAST_5_8: (_fast.CIRCLE8, 5, 1),
    AGAST_7_12d: (DIAMOND12, 7, 3),
    AGAST_7_12s: (_fast.CIRCLE12, 7, 2),
    OAST_9_16: (_fast.CIRCLE16, 9, 3),
}


def agast_score(img: jnp.ndarray, kind: str = OAST_9_16) -> jnp.ndarray:
    """Per-pixel AGAST corner score (max threshold passing the test).

    Same value semantics as agast_score.cpp's `agast_cornerScore<...>`:
    the largest t for which an arc of `arc` consecutive ring taps is all
    brighter than p+t or all darker than p-t. f32 [H, W]; border -inf.
    """
    ring, arc, radius = _TYPES[kind]
    img = img.astype(jnp.float32)
    taps = jnp.stack(
        [imgproc.shift2d(img, dy, dx, fill=0.0) for (dx, dy) in ring], axis=0
    )
    diff_bright = taps - img[None]
    vb = jnp.max(_fast._circular_window_min(diff_bright, arc), axis=0)
    vd = jnp.max(_fast._circular_window_min(-diff_bright, arc), axis=0)
    score = jnp.maximum(vb, vd)
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (yy >= radius) & (yy < h - radius) & (xx >= radius) & (xx < w - radius)
    )
    return jnp.where(inside, score, jnp.float32(-1e9))


def agast_detect(
    img: jnp.ndarray,
    max_keypoints: int,
    threshold: float = 10.0,
    kind: str = OAST_9_16,
    nonmax_suppression: bool = True,
) -> KeyPoints:
    """AGAST keypoints (analog of cv::AGAST, features2d/src/agast.cpp).

    Fixed-capacity KeyPoints of the `max_keypoints` strongest corners.
    Default threshold 10 matches AgastFeatureDetector::create.
    """
    h, w = img.shape
    score = agast_score(img, kind)
    corner = score > threshold
    if nonmax_suppression:
        corner &= imgproc.nms_2d(jnp.where(corner, score, -jnp.inf))
    idx, keep = masked_top_k(score.reshape(-1), corner.reshape(-1), max_keypoints)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return KeyPoints(
        xy=jnp.stack([xs, ys], axis=-1),
        response=jnp.where(keep, score.reshape(-1)[idx], -jnp.inf),
        angle=jnp.zeros((max_keypoints,), jnp.float32),
        level=jnp.zeros((max_keypoints,), jnp.int32),
        size=jnp.full((max_keypoints,), 7.0, jnp.float32),
        valid=keep,
    )
