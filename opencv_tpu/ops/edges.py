"""Canny edge detection, TPU-native.

Reference: cv::Canny (imgproc/src/canny.cpp) and the CUDA version
(cudaimgproc/src/cuda/canny.cu) — Sobel gradients, direction-quantized
non-maximum suppression, double threshold, BFS hysteresis.

TPU-native re-design: NMS picks neighbour pairs with sector *masks*
(branch-free select over 4 shifted images), and the hysteresis BFS
becomes an iterated masked dilation inside `lax.while_loop` — label
propagation to a fixed point, the standard XLA idiom for flood fill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def canny(
    img: jnp.ndarray,
    low_threshold: float,
    high_threshold: float,
    l2_gradient: bool = False,
) -> jnp.ndarray:
    """Edge mask [H, W] bool (cv::Canny analog, imgproc/src/canny.cpp)."""
    img = img.astype(jnp.float32)
    dx, dy = imgproc.sobel_derivatives(img, 3)
    if l2_gradient:
        mag = jnp.sqrt(dx * dx + dy * dy)
    else:
        mag = jnp.abs(dx) + jnp.abs(dy)

    # sector quantization (canny.cpp uses tan(22.5) boundaries)
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)
    tan22 = 0.4142135623730951
    tan67 = 2.414213562373095
    horiz = ady <= tan22 * adx  # gradient ~ horizontal -> edge vertical
    vert = ady >= tan67 * adx
    diag = (~horiz) & (~vert)
    same_sign = (dx * dy) >= 0  # 45deg vs 135deg diagonal

    neg = jnp.float32(-1.0)
    m_l = imgproc.shift2d(mag, 0, -1, neg)
    m_r = imgproc.shift2d(mag, 0, 1, neg)
    m_u = imgproc.shift2d(mag, -1, 0, neg)
    m_d = imgproc.shift2d(mag, 1, 0, neg)
    m_ul = imgproc.shift2d(mag, -1, -1, neg)
    m_dr = imgproc.shift2d(mag, 1, 1, neg)
    m_ur = imgproc.shift2d(mag, -1, 1, neg)
    m_dl = imgproc.shift2d(mag, 1, -1, neg)

    n1 = jnp.where(horiz, m_l, jnp.where(vert, m_u, jnp.where(same_sign, m_ul, m_ur)))
    n2 = jnp.where(horiz, m_r, jnp.where(vert, m_d, jnp.where(same_sign, m_dr, m_dl)))
    is_max = (mag > n1) & (mag >= n2)

    strong = is_max & (mag > high_threshold)
    weak = is_max & (mag > low_threshold)

    def dilate(m):
        out = m
        for dy_ in (-1, 0, 1):
            for dx_ in (-1, 0, 1):
                if dy_ == 0 and dx_ == 0:
                    continue
                out = out | imgproc.shift2d(m, dy_, dx_, False)
        return out

    def cond(carry):
        cur, changed = carry
        return changed

    def body(carry):
        cur, _ = carry
        grown = weak & dilate(cur)
        new = cur | grown
        return new, jnp.any(new != cur)

    edges, _ = lax.while_loop(cond, body, (strong, jnp.bool_(True)))
    return edges
