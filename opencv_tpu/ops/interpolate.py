"""Flow-based frame interpolation.

Reference: cudalegacy/src/interpolate_frames.cpp (cuda::interpolateFrames)
— synthesize the frame at time t in (0,1) between two frames from
forward+backward optical flow with occlusion-aware blending.

TPU-native: flows come from any dense estimator (Farneback default,
Brox optional); warping is one backward bilinear gather per direction;
occlusion weights from forward-backward flow consistency. Everything
jits into a single program."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def _backward_warp(img, flow, scale):
    h, w = img.shape
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return imgproc.bilinear_sample(
        img,
        jnp.stack([xx + scale * flow[..., 0], yy + scale * flow[..., 1]], -1),
    )


def interpolate_frames(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    t: float = 0.5,
    flow_fn=None,
) -> jnp.ndarray:
    """Frame at time t between f0 and f1 (cuda::interpolateFrames
    analog). flow_fn(a, b) -> [H, W, 2]; defaults to Farneback."""
    if flow_fn is None:
        from opencv_tpu.ops import farneback

        flow_fn = lambda a, b: farneback.calc_optical_flow_farneback(a, b)

    f0 = f0.astype(jnp.float32)
    f1 = f1.astype(jnp.float32)
    fwd = flow_fn(f0, f1)  # f0 -> f1
    bwd = flow_fn(f1, f0)  # f1 -> f0

    # frame at t: a pixel x at time t came from x - t*fwd(x) in f0 and
    # from x - (1-t)*bwd(x) in f1 (flow convention: prev + flow = next)
    from0 = _backward_warp(f0, fwd, -t)
    from1 = _backward_warp(f1, bwd, -(1.0 - t))

    # occlusion weights from forward-backward consistency: where
    # fwd(x) + bwd(x + fwd(x)) is large, the pixel is occluded in one
    # of the frames — trust the other side
    bwd_at_fwd = jnp.stack(
        [_backward_warp(bwd[..., 0], fwd, 1.0),
         _backward_warp(bwd[..., 1], fwd, 1.0)], -1
    )
    incons = jnp.linalg.norm(fwd + bwd_at_fwd, axis=-1)
    consistent = incons < 1.0
    # consistent: temporal blend; occluded: take the temporally closer
    # frame alone (t is a static float)
    w0_occ, w1_occ = (1.0, 0.0) if t < 0.5 else (0.0, 1.0)
    w0 = jnp.where(consistent, 1.0 - t, w0_occ)
    w1 = jnp.where(consistent, t, w1_occ)
    s = jnp.maximum(w0 + w1, 1e-6)
    return (w0 * from0 + w1 * from1) / s
