"""goodFeaturesToTrack: Shi-Tomasi / Harris corner selection.

Reference: imgproc/src/featureselect.cpp:361-541 (quality threshold, 3x3
NMS, quality-sorted greedy min-distance suppression) and the GPU version
cudaimgproc/src/cuda/gftt.cu:59.

TPU-native deviation (documented): the reference's greedy min-distance
pass is inherently sequential (accept strongest, reject all within
minDistance, repeat). Here suppression is grid-cell based — round each
corner to a minDistance-sized cell and keep only the strongest corner
per cell via scatter-max. This guarantees >= minDistance/sqrt(2)
separation within a cell and at most one corner per cell; in practice it
selects the same strong corners while staying one fused device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import KeyPoints, masked_top_k


def good_features_to_track(
    img: jnp.ndarray,
    max_corners: int = 1000,
    quality_level: float = 0.01,
    min_distance: float = 10.0,
    block_size: int = 3,
    use_harris: bool = False,
    harris_k: float = 0.04,
) -> KeyPoints:
    img = img.astype(jnp.float32)
    h, w = img.shape
    if use_harris:
        resp = imgproc.harris_response(img, block_size, harris_k, deriv="sobel")
    else:
        resp = imgproc.min_eig_response(img, block_size)
    peak = imgproc.nms_2d(resp)
    thresh = quality_level * jnp.max(resp)
    good = peak & (resp > thresh)

    if min_distance >= 1.0:
        # grid-cell suppression: strongest corner per cell survives
        cell = max(int(min_distance), 1)
        gy = jnp.arange(h) // cell
        gx = jnp.arange(w) // cell
        ncy = (h + cell - 1) // cell
        ncx = (w + cell - 1) // cell
        cell_idx = gy[:, None] * ncx + gx[None, :]
        masked = jnp.where(good, resp, -jnp.inf)
        cell_max = jnp.full((ncy * ncx,), -jnp.inf).at[cell_idx.reshape(-1)].max(
            masked.reshape(-1)
        )
        good &= masked == cell_max[cell_idx]

    idx, keep = masked_top_k(
        jnp.where(good, resp, -jnp.inf).reshape(-1), good.reshape(-1), max_corners
    )
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return KeyPoints(
        xy=jnp.stack([xs, ys], axis=-1),
        response=jnp.where(keep, resp.reshape(-1)[idx], -jnp.inf),
        angle=jnp.zeros_like(xs),
        level=jnp.zeros(xs.shape, jnp.int32),
        size=jnp.full(xs.shape, float(block_size), jnp.float32),
        valid=keep,
    )
