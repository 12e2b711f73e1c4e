"""Projection warpers (reference stitching/src/warpers.cpp + CUDA
warpers_cuda.cpp): cylindrical and spherical backward warps.

All warps are gather-based (build the output->input map, one
bilinear_sample) — the natural TPU formulation.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencv_tpu.core import imgproc


def warp_cylindrical(
    img: jnp.ndarray, f: float, out_w: int | None = None, out_h: int | None = None
) -> jnp.ndarray:
    """Project onto a cylinder of radius f (CylindricalWarper analog).
    Output pixel (u, v) samples input at (f tan(theta) + cx, v' ...)."""
    h, w = img.shape
    out_w = out_w or w
    out_h = out_h or h
    cx, cy = w / 2.0, h / 2.0
    ocx, ocy = out_w / 2.0, out_h / 2.0
    us = (jnp.arange(out_w, dtype=jnp.float32) - ocx) / f  # theta
    vs = (jnp.arange(out_h, dtype=jnp.float32) - ocy) / f
    theta = us[None, :]
    hh = vs[:, None]
    x = f * jnp.tan(theta) + cx
    y = f * hh / jnp.cos(theta) + cy
    xy = jnp.stack([jnp.broadcast_to(x, (out_h, out_w)),
                    jnp.broadcast_to(y, (out_h, out_w))], axis=-1)
    valid = (
        (xy[..., 0] >= 0) & (xy[..., 0] <= w - 1)
        & (xy[..., 1] >= 0) & (xy[..., 1] <= h - 1)
        & (jnp.abs(theta) < jnp.pi / 2)
    )
    return jnp.where(valid, imgproc.bilinear_sample(img, xy), 0.0)


def warp_spherical(
    img: jnp.ndarray, f: float, out_w: int | None = None, out_h: int | None = None
) -> jnp.ndarray:
    """SphericalWarper analog: (u, v) = (theta, phi) equirectangular."""
    h, w = img.shape
    out_w = out_w or w
    out_h = out_h or h
    cx, cy = w / 2.0, h / 2.0
    ocx, ocy = out_w / 2.0, out_h / 2.0
    theta = (jnp.arange(out_w, dtype=jnp.float32) - ocx)[None, :] / f
    phi = (jnp.arange(out_h, dtype=jnp.float32) - ocy)[:, None] / f
    sx = jnp.sin(theta) * jnp.cos(phi)
    sy = jnp.sin(phi)
    sz = jnp.cos(theta) * jnp.cos(phi)
    z = jnp.maximum(sz, 1e-6)
    x = f * sx / z + cx
    y = f * sy / z + cy
    xy = jnp.stack([jnp.broadcast_to(x, (out_h, out_w)),
                    jnp.broadcast_to(y, (out_h, out_w))], axis=-1)
    valid = (
        (xy[..., 0] >= 0) & (xy[..., 0] <= w - 1)
        & (xy[..., 1] >= 0) & (xy[..., 1] <= h - 1) & (sz > 0)
    )
    return jnp.where(valid, imgproc.bilinear_sample(img, xy), 0.0)
