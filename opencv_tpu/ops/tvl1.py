"""Dual TV-L1 dense optical flow.

Reference: video/src/tvl1flow.cpp (Zach/Pock/Bischof primal-dual) and
the CUDA version cudaoptflow/src/cuda/tvl1flow.cu.

TPU-native: the primal-dual iterations are pure elementwise/stencil
passes over [H, W] fields inside `lax.fori_loop` — the algorithm is
already data-parallel; what changes is that warps are gather-based
bilinear sampling and divergence/gradient are shift arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc
from opencv_tpu.core.pyramid import build_lk_pyramid


def _grad(u):
    """Forward differences with Neumann boundary."""
    ux = imgproc.shift2d(u, 0, 1, 0.0) - u
    ux = ux.at[:, -1].set(0.0)
    uy = imgproc.shift2d(u, 1, 0, 0.0) - u
    uy = uy.at[-1, :].set(0.0)
    return ux, uy


def _div(px, py):
    """Backward-difference divergence (adjoint of -_grad)."""
    dx = px - imgproc.shift2d(px, 0, -1, 0.0)
    dx = dx.at[:, 0].set(px[:, 0])
    dy = py - imgproc.shift2d(py, -1, 0, 0.0)
    dy = dy.at[0, :].set(py[0, :])
    return dx + dy


def _tvl1_level(i0, i1, u0, lam=0.15, theta=0.3, tau=0.25, warps=5, iters=30):
    h, w = i0.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    u = u0
    p = jnp.zeros((4, h, w), jnp.float32)  # dual vars (p11,p12,p21,p22)

    for _ in range(warps):  # unrolled outer warps (few)
        coords = jnp.stack([xs + u[..., 0], ys + u[..., 1]], axis=-1)
        i1w = imgproc.bilinear_sample(i1, coords)
        i1x = imgproc.bilinear_sample(imgproc.scharr_derivatives(i1)[0], coords)
        i1y = imgproc.bilinear_sample(imgproc.scharr_derivatives(i1)[1], coords)
        grad2 = i1x * i1x + i1y * i1y
        rho_c = i1w - i1x * u[..., 0] - i1y * u[..., 1] - i0
        u_warp = u

        def inner(_, carry):
            u, p = carry
            # thresholding step on the data term
            rho = rho_c + i1x * u[..., 0] + i1y * u[..., 1]
            th = lam * theta * grad2
            d1 = jnp.where(
                rho < -th, lam * theta * i1x,
                jnp.where(rho > th, -lam * theta * i1x,
                          -rho * i1x / jnp.maximum(grad2, 1e-9)),
            )
            d2 = jnp.where(
                rho < -th, lam * theta * i1y,
                jnp.where(rho > th, -lam * theta * i1y,
                          -rho * i1y / jnp.maximum(grad2, 1e-9)),
            )
            v1 = u[..., 0] + d1
            v2 = u[..., 1] + d2
            # primal update from duals
            u1 = v1 + theta * _div(p[0], p[1])
            u2 = v2 + theta * _div(p[2], p[3])
            u = jnp.stack([u1, u2], axis=-1)
            # dual ascent + projection
            u1x, u1y = _grad(u1)
            u2x, u2y = _grad(u2)
            sigma = tau / theta
            # tvl1flow.cpp's dual normalization (1 + sigma*|grad u|): keeps
            # |p| <= 1 and converges where Chambolle's max-projection with
            # this step size over-smooths
            g1 = jnp.sqrt(u1x ** 2 + u1y ** 2)
            g2 = jnp.sqrt(u2x ** 2 + u2y ** 2)
            n1 = 1.0 + sigma * g1
            n2 = 1.0 + sigma * g2
            p = jnp.stack(
                [
                    (p[0] + sigma * u1x) / n1,
                    (p[1] + sigma * u1y) / n1,
                    (p[2] + sigma * u2x) / n2,
                    (p[3] + sigma * u2y) / n2,
                ],
                axis=0,
            )
            return u, p

        u, p = lax.fori_loop(0, iters, inner, (u, p))
        # clamp runaway flow (tvl1flow.cpp does similar)
        u = jnp.clip(u, -float(max(h, w)), float(max(h, w)))
    return u


def calc_optical_flow_tvl1(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    n_levels: int = 4,
    lam: float = 0.05,
    theta: float = 0.3,
    warps: int = 5,
    iters: int = 50,
) -> jnp.ndarray:
    """Dense flow [H, W, 2] (cv::DualTVL1OpticalFlow analog).

    Images are used at their native intensity scale: the clamped data
    step is proportional to |grad I|, so normalizing to [0,1] starves
    the data term (lambda here absorbs the 8-bit scale; ~0.15/255-ish
    relative to the reference's normalized-lambda convention).
    """
    p0 = build_lk_pyramid(prev_img.astype(jnp.float32), n_levels)
    p1 = build_lk_pyramid(next_img.astype(jnp.float32), n_levels)
    flow = None
    for lvl in range(n_levels - 1, -1, -1):
        i0, i1 = p0.levels[lvl], p1.levels[lvl]
        h, w = i0.shape
        if flow is None:
            flow = jnp.zeros((h, w, 2), jnp.float32)
        else:
            flow = jnp.moveaxis(
                imgproc.resize_bilinear(jnp.moveaxis(flow, -1, 0), h, w), 0, -1
            ) * 2.0
        flow = _tvl1_level(i0, i1, flow, lam, theta, warps=warps, iters=iters)
    return flow
