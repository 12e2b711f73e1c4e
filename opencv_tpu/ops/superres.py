"""Multi-frame super-resolution: BTV-L1 (reference `superres` module,
superres/src/btv_l1.cpp + btv_l1_cuda.cpp).

Minimization of || D H W_k x - y_k ||_1 + lambda * BTV(x) over the
high-res image x, given low-res frames y_k and per-frame translations
(the reference plugs in dense flow; translations cover the stabilized
use case and keep the warp adjoint exact). Optimized by subgradient
descent with all frames' data terms evaluated as one batched pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def _downsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Blur + decimate (D H in the observation model)."""
    blurred = imgproc.gaussian_blur(x, 2 * scale + 1, scale * 0.5)
    return blurred[..., ::scale, ::scale]


def _shift_bilinear(x: jnp.ndarray, dx: float | jnp.ndarray, dy) -> jnp.ndarray:
    h, w = x.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return imgproc.bilinear_sample(x, jnp.stack([xs + dx, ys + dy], axis=-1))


def btv_regularizer_grad(x: jnp.ndarray, btv_range: int = 2, alpha: float = 0.7):
    """Subgradient of the bilateral total variation prior."""
    g = jnp.zeros_like(x)
    for dy in range(-btv_range, btv_range + 1):
        for dx in range(-btv_range, btv_range + 1):
            if dy == 0 and dx == 0:
                continue
            w = alpha ** (abs(dy) + abs(dx))
            diff = x - imgproc.shift2d(x, dy, dx, 0.0)
            g = g + w * (jnp.sign(diff) - jnp.sign(imgproc.shift2d(diff, -dy, -dx, 0.0)))
    return g


def btv_l1_superres(
    frames: jnp.ndarray,  # [K, h, w] low-res frames
    shifts: jnp.ndarray,  # [K, 2] (dx, dy) of each frame vs the reference, in LOW-res px
    scale: int = 2,
    iters: int = 60,
    lam: float = 0.03,
    step: float = 0.5,
) -> jnp.ndarray:
    """Reconstruct the [h*scale, w*scale] high-res image."""
    k, h, w = frames.shape
    frames = frames.astype(jnp.float32)
    hi_shifts = shifts.astype(jnp.float32) * scale
    # init: upsampled reference
    x0 = imgproc.resize_bilinear(frames[0], h * scale, w * scale)

    def data_grad(x):
        g = jnp.zeros_like(x)
        for i in range(k):
            warped = _shift_bilinear(x, hi_shifts[i, 0], hi_shifts[i, 1])
            sim = _downsample(warped, scale)
            r = jnp.sign(sim - frames[i])
            # adjoint: upsample (zero-stuff + blur) then shift back
            up = jnp.zeros_like(x).at[::scale, ::scale].set(r)
            up = imgproc.gaussian_blur(up, 2 * scale + 1, scale * 0.5) * (scale * scale)
            g = g + _shift_bilinear(up, -hi_shifts[i, 0], -hi_shifts[i, 1])
        return g / k

    def body(_, x):
        g = data_grad(x) + lam * btv_regularizer_grad(x)
        return jnp.clip(x - step * g, 0.0, 255.0)

    return lax.fori_loop(0, iters, body, x0)


def _warp_flow(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp x by a dense flow field: out(p) = x(p + flow(p))."""
    h, w = x.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return imgproc.bilinear_sample(
        x, jnp.stack([xs + flow[..., 0], ys + flow[..., 1]], axis=-1)
    )


def _upscale_flow(flow_lo: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Low-res flow [h,w,2] -> high-res flow [H,W,2] (values scaled too)."""
    h, w, _ = flow_lo.shape
    fx = imgproc.resize_bilinear(flow_lo[..., 0], h * scale, w * scale)
    fy = imgproc.resize_bilinear(flow_lo[..., 1], h * scale, w * scale)
    return jnp.stack([fx, fy], axis=-1) * scale


def btv_l1_superres_flow(
    frames: jnp.ndarray,      # [K, h, w] low-res frames
    flows: jnp.ndarray,       # [K, h, w, 2] dense flow ref->frame_k, LOW-res px
    back_flows: jnp.ndarray,  # [K, h, w, 2] dense flow frame_k->ref
    scale: int = 2,
    iters: int = 60,
    lam: float = 0.03,
    step: float = 0.5,
) -> jnp.ndarray:
    """BTV-L1 super-resolution over DENSE per-pixel motion — the
    reference's full operating mode (superres/src/btv_l1.cpp plugs the
    flows of superres/src/optical_flow.cpp). Any of the framework's dense
    flow ops (ops/farneback.py, ops/tvl1.py, ops/brox.py) supplies
    `flows`; the adjoint warp uses the backward field (the reference
    computes both directions the same way, btv_l1.cpp buildMotionMaps).

    The translation-only fast path stays in btv_l1_superres.
    """
    k, h, w = frames.shape
    frames = frames.astype(jnp.float32)
    flows_hi = jax.vmap(_upscale_flow, in_axes=(0, None))(
        flows.astype(jnp.float32), scale
    )
    back_hi = jax.vmap(_upscale_flow, in_axes=(0, None))(
        back_flows.astype(jnp.float32), scale
    )
    x0 = imgproc.resize_bilinear(frames[0], h * scale, w * scale)

    def data_grad(x):
        def per_frame(flow_hi, bflow_hi, y):
            warped = _warp_flow(x, flow_hi)      # x seen from frame k
            sim = _downsample(warped, scale)
            r = jnp.sign(sim - y)
            up = jnp.zeros_like(x).at[::scale, ::scale].set(r)
            up = imgproc.gaussian_blur(up, 2 * scale + 1, scale * 0.5) * (
                scale * scale
            )
            return _warp_flow(up, bflow_hi)      # approximate adjoint
        g = jax.vmap(per_frame)(flows_hi, back_hi, frames)
        return jnp.mean(g, axis=0)

    def body(_, x):
        g = data_grad(x) + lam * btv_regularizer_grad(x)
        return jnp.clip(x - step * g, 0.0, 255.0)

    return lax.fori_loop(0, iters, body, x0)
