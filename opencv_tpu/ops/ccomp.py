"""Connected components + simple blob detection.

Reference: cv::connectedComponents (imgproc/src/connectedcomponents.cpp),
GPU ccomponetns.cu (cudalegacy), and SimpleBlobDetector
(features2d/src/blobdetector.cpp).

TPU-native: union-find is replaced by iterative min-label propagation to
a fixed point inside `lax.while_loop` — each sweep is an 8-neighbour
elementwise min, so the device does O(component diameter) fused passes
instead of pointer chasing. Blob statistics (area, centroid, perimeter
proxy, extents) are segment-sums over the label map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import masked_top_k


def connected_components(mask: jnp.ndarray, connectivity: int = 8) -> jnp.ndarray:
    """Label map i32 [H, W]: 0 = background, foreground pixels share the
    (arbitrary but consistent) min linear index of their component + 1."""
    h, w = mask.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        + 1
    )
    big = jnp.int32(h * w + 2)
    labels0 = jnp.where(mask, idx, big)
    offs = (
        [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 4
        else [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]
    )

    def sweep(labels):
        best = labels
        for dy, dx in offs:
            nb = imgproc.shift2d(labels, dy, dx, fill=big)
            best = jnp.minimum(best, nb)
        return jnp.where(mask, best, big)

    def cond(carry):
        labels, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = sweep(labels)
        return new, jnp.any(new != labels)

    labels, _ = lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return jnp.where(mask, labels, 0).astype(jnp.int32)


class Blobs(NamedTuple):
    xy: jnp.ndarray  # [K, 2] centroids
    area: jnp.ndarray  # [K]
    circularity: jnp.ndarray  # [K] 4*pi*area / perimeter^2 proxy
    valid: jnp.ndarray  # [K]


def detect_blobs(
    img: jnp.ndarray,
    threshold: float = 127.0,
    dark_blobs: bool = True,
    min_area: float = 10.0,
    max_area: float = 5000.0,
    min_circularity: float = 0.0,
    max_blobs: int = 64,
) -> Blobs:
    """SimpleBlobDetector analog (single threshold; the reference sweeps
    several thresholds and merges — multi-threshold is a vmap away)."""
    import math

    h, w = img.shape
    mask = (img < threshold) if dark_blobs else (img > threshold)
    labels = connected_components(mask)
    flat = labels.reshape(-1)
    n = h * w + 2
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    fg = flat > 0
    area = jnp.zeros((n,), jnp.float32).at[flat].add(fg.astype(jnp.float32))
    sx = jnp.zeros((n,), jnp.float32).at[flat].add(jnp.where(fg, xs, 0.0))
    sy = jnp.zeros((n,), jnp.float32).at[flat].add(jnp.where(fg, ys, 0.0))
    # perimeter proxy: count of component pixels with a non-member neighbour
    interior = mask
    for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        interior = interior & imgproc.shift2d(mask, dy, dx, fill=False)
    edge = (mask & ~interior).reshape(-1)
    perim = jnp.zeros((n,), jnp.float32).at[flat].add(edge.astype(jnp.float32))

    ok = (area >= min_area) & (area <= max_area)
    circ = 4.0 * math.pi * area / jnp.maximum(perim * perim, 1.0)
    ok &= circ >= min_circularity
    # representative labels are the component-min indices; select top by area
    idx, keep = masked_top_k(jnp.where(ok, area, -jnp.inf), ok, max_blobs)
    a = area[idx]
    return Blobs(
        xy=jnp.stack([sx[idx] / jnp.maximum(a, 1.0), sy[idx] / jnp.maximum(a, 1.0)], -1),
        area=jnp.where(keep, a, 0.0),
        circularity=jnp.where(keep, circ[idx], 0.0),
        valid=keep,
    )
