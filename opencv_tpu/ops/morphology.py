"""Morphological operations (imgproc/src/morph.cpp analog; GPU mirror
cudafilters createMorphologyFilter).

Rectangular structuring elements use `lax.reduce_window` (the native TPU
windowed min/max); arbitrary elements fall back to shift-and-combine.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def _window_reduce(img, ksize, init, op):
    kh, kw = (ksize, ksize) if isinstance(ksize, int) else ksize
    return lax.reduce_window(
        img.astype(jnp.float32), init, op,
        window_dimensions=(kh, kw), window_strides=(1, 1),
        padding=(((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)),
    )


def erode(img: jnp.ndarray, ksize=3, kernel: np.ndarray | None = None) -> jnp.ndarray:
    if kernel is None:
        return _window_reduce(img, ksize, jnp.inf, lax.min)
    out = None
    kh, kw = kernel.shape
    for dy in range(kh):
        for dx in range(kw):
            if not kernel[dy, dx]:
                continue
            s = imgproc.shift2d(img.astype(jnp.float32), dy - kh // 2, dx - kw // 2, jnp.inf)
            out = s if out is None else jnp.minimum(out, s)
    return out


def dilate(img: jnp.ndarray, ksize=3, kernel: np.ndarray | None = None) -> jnp.ndarray:
    if kernel is None:
        return _window_reduce(img, ksize, -jnp.inf, lax.max)
    out = None
    kh, kw = kernel.shape
    for dy in range(kh):
        for dx in range(kw):
            if not kernel[dy, dx]:
                continue
            # dilation reflects the structuring element
            s = imgproc.shift2d(img.astype(jnp.float32), kh // 2 - dy, kw // 2 - dx, -jnp.inf)
            out = s if out is None else jnp.maximum(out, s)
    return out


def morphology_open(img, ksize=3):
    return dilate(erode(img, ksize), ksize)


def morphology_close(img, ksize=3):
    return erode(dilate(img, ksize), ksize)


def morphology_gradient(img, ksize=3):
    return dilate(img, ksize) - erode(img, ksize)


def top_hat(img, ksize=3):
    return img.astype(jnp.float32) - morphology_open(img, ksize)


def black_hat(img, ksize=3):
    return morphology_close(img, ksize) - img.astype(jnp.float32)


def median_blur(img: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """cv::medianBlur analog (imgproc/src/median_blur.cpp; GPU
    cudafilters median_filter.cu): stack the k^2 shifted images and take
    the middle of a sorted axis — vectorized rank filter."""
    r = ksize // 2
    pad = jnp.pad(img.astype(jnp.float32), r, mode="edge")
    h, w = img.shape
    taps = [
        pad[dy : dy + h, dx : dx + w]
        for dy in range(ksize)
        for dx in range(ksize)
    ]
    stack = jnp.stack(taps, axis=0)
    return jnp.sort(stack, axis=0)[(ksize * ksize) // 2]


def bilateral_filter(
    img: jnp.ndarray, d: int = 9, sigma_color: float = 30.0,
    sigma_space: float = 3.0,
) -> jnp.ndarray:
    """cv::bilateralFilter analog (imgproc/src/bilateral_filter.dispatch.cpp;
    GPU cudaimgproc/src/bilateral_filter.cpp): edge-preserving smoothing.
    One shifted-read + fused-weight pass per window offset."""
    img = img.astype(jnp.float32)
    r = d // 2
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy * dy + dx * dx > r * r:
                continue
            ws = float(np.exp(-(dy * dy + dx * dx) / (2.0 * sigma_space ** 2)))
            nb = imgproc.shift2d(img, dy, dx, fill=jnp.float32(jnp.nan))
            wr = jnp.exp(-((nb - img) ** 2) / (2.0 * sigma_color ** 2))
            w = jnp.where(jnp.isnan(nb), 0.0, ws * wr)
            num = num + w * jnp.where(jnp.isnan(nb), 0.0, nb)
            den = den + w
    return num / jnp.maximum(den, 1e-9)
