"""Stereo disparity: block matching (StereoBM) and reprojection to 3D.

Reference: calib3d/src/stereobm.cpp (SAD block matching with prefilter,
texture/uniqueness gates, subpixel parabola) and the GPU pipeline in
cudastereo/src/stereobm.cpp + cuda/.

TPU-native: the disparity axis is just a batch dimension — all D
candidate SAD cost planes are box-filtered integral sums computed at
once ([D, H, W] tensor), argmin'd on the VPU. No per-pixel loops, no
shared-memory staging.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencv_tpu.core import imgproc


def compute_disparity_bm(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int = 64,
    block_size: int = 15,
    texture_threshold: float = 10.0,
    uniqueness_ratio: float = 0.15,
    prefilter_cap: float = 31.0,
) -> jnp.ndarray:
    """Disparity map f32 [H, W]; invalid pixels = -1.

    Matches along scanlines: left[y, x] vs right[y, x - d], d in
    [0, num_disparities).
    """
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    h, w = left.shape

    # x-Sobel prefilter clamped to +/- cap (stereobm.cpp prefilterXSobel)
    def prefilter(img):
        dx, _ = imgproc.sobel_derivatives(img)
        return jnp.clip(dx, -prefilter_cap, prefilter_cap)

    lp = prefilter(left)
    rp = prefilter(right)

    costs = []
    for d in range(num_disparities):
        shifted = imgproc.shift2d(rp, 0, -d, fill=0.0)  # right moved d right
        sad = imgproc.box_sum_integral(jnp.abs(lp - shifted), block_size)
        # penalize windows that fall off the left border
        xs = jnp.arange(w)[None, :]
        sad = jnp.where(xs >= d + block_size // 2, sad, jnp.inf)
        costs.append(sad)
    cost = jnp.stack(costs, axis=0)  # [D, H, W]

    best = jnp.argmin(cost, axis=0)  # [H, W]
    cmin = jnp.min(cost, axis=0)

    # uniqueness: best must beat every cost outside +/-1 disparity by ratio
    ds = jnp.arange(num_disparities)[:, None, None]
    far = jnp.abs(ds - best[None]) > 1
    second = jnp.min(jnp.where(far, cost, jnp.inf), axis=0)
    unique = cmin <= second * (1.0 - uniqueness_ratio) + 1e-6

    # texture gate: flat windows can't match (stereobm textureThreshold)
    texture = imgproc.box_sum_integral(jnp.abs(lp), block_size)
    textured = texture > texture_threshold * block_size

    # subpixel parabola on (c[-1], c0, c[+1])
    bm1 = jnp.clip(best - 1, 0, num_disparities - 1)
    bp1 = jnp.clip(best + 1, 0, num_disparities - 1)
    c0 = cmin
    cm = jnp.take_along_axis(cost, bm1[None], axis=0)[0]
    cp = jnp.take_along_axis(cost, bp1[None], axis=0)[0]
    denom = cm - 2.0 * c0 + cp
    sub = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (cm - cp) / denom, 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(sub, -0.5, 0.5)

    valid = unique & textured & jnp.isfinite(cmin) & (best > 0)
    return jnp.where(valid, disp, -1.0)


def reproject_to_3d(
    disparity: jnp.ndarray, fx: float, baseline: float, cx: float, cy: float
) -> jnp.ndarray:
    """Disparity -> [H, W, 3] points in the left camera frame
    (cv::reprojectImageTo3D analog, cudastereo/src/util.cpp): Z = f*B/d."""
    h, w = disparity.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    valid = disparity > 0
    z = jnp.where(valid, fx * baseline / jnp.maximum(disparity, 1e-6), 0.0)
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fx
    return jnp.stack([x, y, z], axis=-1)
