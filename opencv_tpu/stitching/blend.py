"""Blending (reference stitching/src/blenders.cpp): feather and
multi-band (Laplacian pyramid) blending of warped, mask-carrying images.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencv_tpu.core import imgproc, pyramid


def distance_weight(mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """Approximate distance-to-border weights by iterated erosion
    accumulation (the feather blender's distanceTransform role)."""
    from opencv_tpu.ops import morphology

    w = jnp.zeros(mask.shape, jnp.float32)
    cur = mask.astype(jnp.float32)
    for _ in range(iters):
        w = w + cur
        cur = morphology.erode(cur, 3) * (cur > 0)
        cur = jnp.maximum(cur, 0.0)
    return w


def feather_blend(
    images: list[jnp.ndarray], masks: list[jnp.ndarray], sharpness_iters: int = 32
) -> jnp.ndarray:
    """FeatherBlender analog: weights ~ distance to each mask's border."""
    ws = [distance_weight(m, sharpness_iters) for m in masks]
    wsum = sum(ws)
    acc = sum(w * img.astype(jnp.float32) for w, img in zip(ws, images))
    return acc / jnp.maximum(wsum, 1e-9)


def multiband_blend(
    images: list[jnp.ndarray], masks: list[jnp.ndarray], n_bands: int = 4
) -> jnp.ndarray:
    """MultiBandBlender analog: blend Laplacian pyramids with Gaussian-
    pyramid weights, collapse."""
    ws = [distance_weight(m, 32) for m in masks]
    wsum = sum(ws)
    ws = [w / jnp.maximum(wsum, 1e-9) for w in ws]

    def gaussian_pyr(x, n):
        levels = [x]
        for _ in range(n - 1):
            levels.append(pyramid.pyr_down(levels[-1]))
        return levels

    def laplacian_pyr(x, n):
        g = gaussian_pyr(x, n)
        lap = []
        for i in range(n - 1):
            h, w = g[i].shape
            up = pyramid.pyr_up(g[i + 1])[:h, :w]
            lap.append(g[i] - up)
        lap.append(g[-1])
        return lap

    blended = None
    for img, w in zip(images, ws):
        lp = laplacian_pyr(img.astype(jnp.float32), n_bands)
        wp = gaussian_pyr(w, n_bands)
        terms = [l * wl for l, wl in zip(lp, wp)]
        blended = terms if blended is None else [b + t for b, t in zip(blended, terms)]

    out = blended[-1]
    for i in range(n_bands - 2, -1, -1):
        h, w = blended[i].shape
        out = pyramid.pyr_up(out)[:h, :w] + blended[i]
    return out
