"""Computational photography (reference `photo` module analogs):
fast non-local-means denoising (photo/src/denoising.cpp +
fast_nlmeans_denoising_invoker.hpp, CUDA denoising.cuda.cpp), diffusion
inpainting (photo/src/inpaint.cpp role), and HDR exposure fusion
(photo/src/merge.cpp MergeMertens).

TPU-native NLM: for every search offset the patch SSD is one box filter
of a squared-difference image, so the whole weight field is
|search_window| fused box-filter passes — no per-pixel patch loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def nl_means_denoise(
    img: jnp.ndarray,
    h: float = 10.0,
    patch_size: int = 7,
    search_size: int = 21,
) -> jnp.ndarray:
    """Grayscale fast NLM (cv::fastNlMeansDenoising analog)."""
    img = img.astype(jnp.float32)
    r = search_size // 2
    acc = jnp.zeros_like(img)
    wsum = jnp.zeros_like(img)
    h2 = h * h * patch_size * patch_size
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = imgproc.shift2d(img, dy, dx, fill=0.0)
            d2 = (img - shifted) ** 2
            ssd = imgproc.box_sum_integral(d2, patch_size)
            w = jnp.exp(-ssd / h2)
            # do not let out-of-image shifts vote
            valid = imgproc.shift2d(jnp.ones_like(img), dy, dx, fill=0.0)
            w = w * valid
            acc = acc + w * shifted
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-9)


def inpaint_diffusion(
    img: jnp.ndarray, mask: jnp.ndarray, iters: int = 300
) -> jnp.ndarray:
    """Fill masked pixels by harmonic (Laplace) diffusion from the
    boundary (the role of cv::inpaint; Navier-Stokes/Telea are
    different PDEs with the same contract)."""
    img = img.astype(jnp.float32)
    known = ~mask
    init = jnp.where(known, img, jnp.mean(img * known) / jnp.maximum(jnp.mean(known), 1e-9))

    def body(_, x):
        avg = 0.25 * (
            imgproc.shift2d(x, -1, 0, 0.0) + imgproc.shift2d(x, 1, 0, 0.0)
            + imgproc.shift2d(x, 0, -1, 0.0) + imgproc.shift2d(x, 0, 1, 0.0)
        )
        return jnp.where(known, img, avg)

    return lax.fori_loop(0, iters, body, init)


def merge_mertens(
    images: jnp.ndarray,
    contrast_w: float = 1.0,
    saturation_w: float = 1.0,
    exposure_w: float = 1.0,
) -> jnp.ndarray:
    """Exposure fusion (MergeMertens analog) for grayscale stacks
    [E, H, W] in [0, 255]; returns fused [H, W] in [0, 1]-ish scale.
    Single-scale weight blend (the reference blends per pyramid level —
    multi-scale lands with the blender work)."""
    x = images.astype(jnp.float32) / 255.0
    # contrast: |laplacian|
    lap = jnp.abs(
        4.0 * x
        - imgproc.shift2d(x, 0, 1, 0.0) - imgproc.shift2d(x, 0, -1, 0.0)
        - imgproc.shift2d(x, 1, 0, 0.0) - imgproc.shift2d(x, -1, 0, 0.0)
    )
    wexp = jnp.exp(-((x - 0.5) ** 2) / (2 * 0.2 ** 2))
    w = (lap + 1e-6) ** contrast_w * wexp ** exposure_w
    w = w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-9)
    return jnp.sum(w * x, axis=0)


def seamless_clone(
    src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray, iters: int = 400
) -> jnp.ndarray:
    """Poisson seamless cloning (cv::seamlessClone NORMAL_CLONE analog,
    photo/src/seamless_cloning.cpp): solve the Poisson equation inside
    the mask with the source's gradient field and the destination's
    boundary, by Jacobi iteration (fixed-trip, fused stencils)."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    lap_src = (
        4.0 * src
        - imgproc.shift2d(src, -1, 0, 0.0) - imgproc.shift2d(src, 1, 0, 0.0)
        - imgproc.shift2d(src, 0, -1, 0.0) - imgproc.shift2d(src, 0, 1, 0.0)
    )
    inside = mask

    def body(_, x):
        nb = (
            imgproc.shift2d(x, -1, 0, 0.0) + imgproc.shift2d(x, 1, 0, 0.0)
            + imgproc.shift2d(x, 0, -1, 0.0) + imgproc.shift2d(x, 0, 1, 0.0)
        )
        upd = 0.25 * (nb + lap_src)
        return jnp.where(inside, upd, dst)

    return lax.fori_loop(0, iters, body, jnp.where(inside, src, dst))
