"""Pyramidal Lucas-Kanade sparse optical flow, TPU-native.

Reference: the CPU tracker `LKTrackerInvoker::operator()` iterates per
point over a window: 2x2 normal matrix G from window gradients, a
min-eigenvalue gate, and <=30 Newton iterations on the mismatch vector
(video/src/lkpyramid.cpp:148-696, parallel_for_ over points :1371). The
CUDA version runs one thread-block per point with texture-unit bilinear
fetches (cudaoptflow/src/cuda/pyrlk.cu:368 `sparseKernel`).

TPU-native design: `vmap` over points x window (the block-per-point
becomes a batched gather), `lax.fori_loop` with convergence masks for the
fixed iteration budget (data-dependent early exit is replaced by masked
updates — the XLA-idiomatic equivalent), and an unrolled coarse-to-fine
level loop with static shapes per level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import LKConfig
from opencv_tpu.core.pyramid import build_lk_pyramid


def _window_offsets(win_size: int) -> jnp.ndarray:
    r = win_size // 2
    d = jnp.arange(win_size, dtype=jnp.float32) - r
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # [w*w, 2]


def _track_level(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    base_pts: jnp.ndarray,  # [N,2] point positions in prev at this level
    guess_pts: jnp.ndarray,  # [N,2] current estimates in next at this level
    cfg: LKConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK. Returns (new_guess, min_eig, residual)."""
    offs = _window_offsets(cfg.win_size)  # [K,2]
    n = base_pts.shape[0]
    area = offs.shape[0]

    coords = base_pts[:, None, :] + offs[None, :, :]  # [N,K,2]
    iw = imgproc.bilinear_sample(prev_img, coords)  # [N,K]
    ix = imgproc.bilinear_sample(dx, coords)
    iy = imgproc.bilinear_sample(dy, coords)

    gxx = jnp.sum(ix * ix, axis=1)
    gxy = jnp.sum(ix * iy, axis=1)
    gyy = jnp.sum(iy * iy, axis=1)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) * 0.5 / area
    ok = min_eig > cfg.min_eig_threshold
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)

    def body(_, carry):
        guess, converged = carry
        jcoords = guess[:, None, :] + offs[None, :, :]
        jw = imgproc.bilinear_sample(next_img, jcoords)
        diff = iw - jw  # [N,K]
        bx = jnp.sum(diff * ix, axis=1)
        by = jnp.sum(diff * iy, axis=1)
        # solve G d = b (2x2 closed form)
        d_x = (gyy * bx - gxy * by) / safe_det
        d_y = (gxx * by - gxy * bx) / safe_det
        delta = jnp.stack([d_x, d_y], axis=-1)
        do_update = (ok & ~converged)[:, None]
        new_guess = jnp.where(do_update, guess + delta, guess)
        step = jnp.sum(delta * delta, axis=-1)
        converged = converged | (step <= cfg.eps * cfg.eps)
        return new_guess, converged

    converged0 = jnp.zeros((n,), bool)
    guess, _ = jax.lax.fori_loop(0, cfg.max_iters, body, (guess_pts, converged0))

    jw = imgproc.bilinear_sample(next_img, guess[:, None, :] + offs[None, :, :])
    residual = jnp.mean(jnp.abs(iw - jw), axis=1)
    return guess, min_eig, residual


def calc_optical_flow_pyr_lk(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pts: jnp.ndarray,
    pts_valid: jnp.ndarray | None = None,
    cfg: LKConfig = LKConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Analog of cv::calcOpticalFlowPyrLK (video/src/lkpyramid.cpp:1384).

    pts: [N,2] (x, y) in prev_img coords. Returns (new_pts [N,2],
    status [N] bool, err [N] f32 mean abs window residual).
    """
    prev_img = prev_img.astype(jnp.float32)
    next_img = next_img.astype(jnp.float32)
    h, w = prev_img.shape
    if pts_valid is None:
        pts_valid = jnp.ones((pts.shape[0],), bool)

    pyr_prev = build_lk_pyramid(prev_img, cfg.n_levels)
    pyr_next = build_lk_pyramid(next_img, cfg.n_levels)

    top = cfg.n_levels - 1
    guess = pts / (2.0 ** top)
    status = pts_valid
    err = jnp.zeros((pts.shape[0],), jnp.float32)
    for lvl in range(top, -1, -1):
        p_img = pyr_prev.levels[lvl]
        n_img = pyr_next.levels[lvl]
        dx, dy = imgproc.scharr_derivatives(p_img)
        base = pts / (2.0 ** lvl)
        guess, min_eig, err = _track_level(p_img, n_img, dx, dy, base, guess, cfg)
        if lvl > 0:
            guess = guess * 2.0
        else:
            # the min-eig gate applies at full resolution (lkpyramid.cpp
            # minEigThreshold semantics)
            status = status & (min_eig > cfg.min_eig_threshold)

    inside = (
        (guess[:, 0] >= 0.0)
        & (guess[:, 0] <= w - 1.0)
        & (guess[:, 1] >= 0.0)
        & (guess[:, 1] <= h - 1.0)
    )
    status = status & inside
    return guess, status, err
