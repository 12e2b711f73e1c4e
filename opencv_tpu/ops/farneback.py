"""Farneback dense optical flow (cv::calcOpticalFlowFarneback analog,
video/src/optflowgf.cpp; GPU cudaoptflow/src/cuda/farneback.cu).

Method: per-pixel quadratic polynomial expansion
    f(x) ~ r1 + r2 x + r3 y + r4 x^2 + r5 y^2 + r6 xy
fit by Gaussian-weighted least squares. Because the weight G-matrix is
position-independent, the whole expansion is six separable correlations
plus one constant 6x6 solve folded into an einsum — no per-pixel
systems. Displacement solves A d = db with neighbourhood-averaged
normal equations, iterated coarse-to-fine.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.pyramid import build_lk_pyramid


@functools.cache
def _poly_exp_setup(n: int, sigma: float):
    """1-D kernels (g, xg, x^2 g) and the inverse Gram matrix over the
    2-D basis {1, x, y, x^2, y^2, xy} with weights g(x)g(y)."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    k0, k1, k2 = g, x * g, x * x * g
    # 2-D moments of the weight function
    xx, yy = np.meshgrid(x, x)
    wgt = np.outer(g, g)
    basis = [np.ones_like(xx), xx, yy, xx * xx, yy * yy, xx * yy]
    G = np.zeros((6, 6))
    for i in range(6):
        for j in range(6):
            G[i, j] = np.sum(wgt * basis[i] * basis[j])
    Ginv = np.linalg.inv(G)
    return (
        k0.astype(np.float32),
        k1.astype(np.float32),
        k2.astype(np.float32),
        Ginv.astype(np.float32),
    )


def poly_expansion(img: jnp.ndarray, n: int = 5, sigma: float = 1.1) -> jnp.ndarray:
    """[H, W, 6] polynomial coefficients (r1..r6) per pixel."""
    k0, k1, k2 = _poly_exp_setup(n, sigma)[:3]
    Ginv = _poly_exp_setup(n, sigma)[3]
    # weighted moments: b_i-correlations of the image
    m1 = imgproc.sep_filter2d(img, k0, k0)  # <f, 1>
    mx = imgproc.sep_filter2d(img, k0, k1)  # <f, x>
    my = imgproc.sep_filter2d(img, k1, k0)  # <f, y>
    mxx = imgproc.sep_filter2d(img, k0, k2)
    myy = imgproc.sep_filter2d(img, k2, k0)
    mxy = imgproc.sep_filter2d(img, k1, k1)
    m = jnp.stack([m1, mx, my, mxx, myy, mxy], axis=-1)  # [H,W,6]
    return jnp.einsum("ij,hwj->hwi", jnp.asarray(Ginv), m)


def _flow_from_polys(
    r1: jnp.ndarray, r2: jnp.ndarray, flow: jnp.ndarray, avg_win: int
) -> jnp.ndarray:
    """One displacement update (optflowgf.cpp UpdateFlow*): warp frame-2
    polynomials by the current flow, average the 2x2 normal equations
    over a window, solve."""
    h, w = r1.shape[:2]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    sample_xy = jnp.stack([xs + flow[..., 0], ys + flow[..., 1]], axis=-1)
    r2w = jnp.stack(
        [imgproc.bilinear_sample(r2[..., i], sample_xy) for i in range(6)], axis=-1
    )
    # A = mean of the two quadratic forms; b-difference incl. current flow
    a11 = 0.5 * (r1[..., 3] + r2w[..., 3])
    a22 = 0.5 * (r1[..., 4] + r2w[..., 4])
    a12 = 0.25 * (r1[..., 5] + r2w[..., 5])
    db1 = -0.5 * (r2w[..., 1] - r1[..., 1]) + a11 * flow[..., 0] + a12 * flow[..., 1]
    db2 = -0.5 * (r2w[..., 2] - r1[..., 2]) + a12 * flow[..., 0] + a22 * flow[..., 1]
    # accumulate normal equations G = A^T A, h = A^T db over the window
    g11 = imgproc.box_filter(a11 * a11 + a12 * a12, avg_win)
    g12 = imgproc.box_filter(a12 * (a11 + a22), avg_win)
    g22 = imgproc.box_filter(a22 * a22 + a12 * a12, avg_win)
    h1 = imgproc.box_filter(a11 * db1 + a12 * db2, avg_win)
    h2 = imgproc.box_filter(a12 * db1 + a22 * db2, avg_win)
    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    u = (g22 * h1 - g12 * h2) / det
    v = (g11 * h2 - g12 * h1) / det
    return jnp.stack([u, v], axis=-1)


def calc_optical_flow_farneback(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    n_levels: int = 3,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.1,
    win_size: int = 15,
) -> jnp.ndarray:
    """Dense flow [H, W, 2] (x, y) from prev to next."""
    prev_img = prev_img.astype(jnp.float32)
    next_img = next_img.astype(jnp.float32)
    p1 = build_lk_pyramid(prev_img, n_levels)
    p2 = build_lk_pyramid(next_img, n_levels)
    flow = None
    for lvl in range(n_levels - 1, -1, -1):
        i1, i2 = p1.levels[lvl], p2.levels[lvl]
        h, w = i1.shape
        if flow is None:
            flow = jnp.zeros((h, w, 2), jnp.float32)
        else:
            flow = imgproc.resize_bilinear(
                jnp.moveaxis(flow, -1, 0), h, w
            )
            flow = jnp.moveaxis(flow, 0, -1) * 2.0
        r1 = poly_expansion(i1, poly_n, poly_sigma)
        r2 = poly_expansion(i2, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _flow_from_polys(r1, r2, flow, win_size)
    return flow
