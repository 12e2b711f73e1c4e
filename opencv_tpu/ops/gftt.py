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
        # grid-cell suppression: strongest corner per cell survives.
        # TPU shape: dense block-reshape argmax per cell, then top-k over
        # the (few thousand) cell winners instead of a full-image sort —
        # replaces both the reference's greedy min-distance pass
        # (featureselect.cpp:361 partition-by-cells idea) and the global
        # nth-element.
        cell = max(int(min_distance), 1)
        ncy = (h + cell - 1) // cell
        ncx = (w + cell - 1) // cell
        masked = jnp.where(good, resp, -jnp.inf)
        padded = jnp.pad(
            masked, ((0, ncy * cell - h), (0, ncx * cell - w)),
            constant_values=-jnp.inf,
        )
        blocks = padded.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
        blocks = blocks.reshape(ncy * ncx, cell * cell)
        cell_val = jnp.max(blocks, axis=1)  # [ncy*ncx]
        cell_arg = jnp.argmax(blocks, axis=1)
        cid = jnp.arange(ncy * ncx)
        ys_all = (cid // ncx) * cell + cell_arg // cell
        xs_all = (cid % ncx) * cell + cell_arg % cell
        cand_valid = jnp.isfinite(cell_val)
        # a coarse grid can have fewer cells than max_corners: clamp the
        # top-k, then pad back out to the static [max_corners] record
        k = min(max_corners, ncy * ncx)
        cidx, keep = masked_top_k(
            jnp.where(cand_valid, cell_val, -jnp.inf), cand_valid, k
        )
        pad = max_corners - k
        cidx = jnp.pad(cidx, (0, pad))
        keep = jnp.pad(keep, (0, pad))
        ys = ys_all[cidx].astype(jnp.float32)
        xs = xs_all[cidx].astype(jnp.float32)
        response = jnp.where(keep, cell_val[cidx], -jnp.inf)
    else:
        idx, keep = masked_top_k(
            jnp.where(good, resp, -jnp.inf).reshape(-1), good.reshape(-1), max_corners
        )
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        response = jnp.where(keep, resp.reshape(-1)[idx], -jnp.inf)

    return KeyPoints(
        xy=jnp.stack([xs, ys], axis=-1),
        response=response,
        angle=jnp.zeros_like(xs),
        level=jnp.zeros(xs.shape, jnp.int32),
        size=jnp.full(xs.shape, float(block_size), jnp.float32),
        valid=keep,
    )
