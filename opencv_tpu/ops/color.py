"""Color-space conversions (cv::cvtColor analog, imgproc/src/color.cpp;
GPU cudaimgproc/src/color.cpp + cuda/debayer.cu for demosaicing).

All functions take/return f32 arrays with channels last; RGB in [0, 255].
Pure elementwise — XLA fuses each conversion into one VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    return img.astype(jnp.float32) @ w


def gray_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(img.astype(jnp.float32)[..., None], 3, axis=-1)


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """H in [0, 360), S, V in [0, 1] (input RGB in [0, 255])."""
    x = img.astype(jnp.float32) / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    c = v - mn
    safe_c = jnp.where(c < 1e-12, 1.0, c)
    h = jnp.where(
        v == r, (g - b) / safe_c % 6.0,
        jnp.where(v == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0),
    )
    h = jnp.where(c < 1e-12, 0.0, h * 60.0)
    s = jnp.where(v < 1e-12, 0.0, c / jnp.where(v < 1e-12, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    c = v * s
    hp = (h / 60.0) % 6.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == k for k in range(6)], [c, x, z, z, x, c])
    g = jnp.select([idx == k for k in range(6)], [x, c, c, x, z, z])
    b = jnp.select([idx == k for k in range(6)], [z, z, x, c, c, x])
    return (jnp.stack([r + m, g + m, b + m], axis=-1)) * 255.0


def rgb_to_ycrcb(img: jnp.ndarray) -> jnp.ndarray:
    """OpenCV YCrCb convention (color.cpp): Y + 0.713/0.564 deltas,
    offset 128 for 8-bit ranges."""
    x = img.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    y, cr, cb = img[..., 0], img[..., 1], img[..., 2]
    r = y + (cr - 128.0) / 0.713
    b = y + (cb - 128.0) / 0.564
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_lab(img: jnp.ndarray) -> jnp.ndarray:
    """CIE L*a*b* (D65), 8-bit-style ranges: L in [0,100], a/b ~ [-128,127]."""
    x = img.astype(jnp.float32) / 255.0
    # sRGB linearization
    lin = jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    xn = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.950456
    yn = 0.212671 * r + 0.715160 * g + 0.072169 * b
    zn = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xn), f(yn), f(zn)
    L = jnp.where(yn > 0.008856, 116.0 * jnp.cbrt(yn) - 16.0, 903.3 * yn)
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L, a, bb], axis=-1)


def demosaic_bilinear(raw: jnp.ndarray, pattern: str = "RGGB") -> jnp.ndarray:
    """Bayer -> RGB by bilinear interpolation (cuda/debayer.cu analog).
    raw: [H, W] single-channel mosaic."""
    from opencv_tpu.core import imgproc

    h, w = raw.shape
    raw = raw.astype(jnp.float32)
    yy = jnp.arange(h)[:, None] % 2
    xx = jnp.arange(w)[None, :] % 2
    masks = {
        "RGGB": ((yy == 0) & (xx == 0), ((yy == 0) & (xx == 1)) | ((yy == 1) & (xx == 0)), (yy == 1) & (xx == 1)),
        "BGGR": ((yy == 1) & (xx == 1), ((yy == 0) & (xx == 1)) | ((yy == 1) & (xx == 0)), (yy == 0) & (xx == 0)),
        "GRBG": ((yy == 0) & (xx == 1), ((yy == 0) & (xx == 0)) | ((yy == 1) & (xx == 1)), (yy == 1) & (xx == 0)),
        "GBRG": ((yy == 1) & (xx == 0), ((yy == 0) & (xx == 0)) | ((yy == 1) & (xx == 1)), (yy == 0) & (xx == 1)),
    }[pattern]

    def interp(mask):
        vals = jnp.where(mask, raw, 0.0)
        wts = mask.astype(jnp.float32)
        k = jnp.array([1.0, 2.0, 1.0], jnp.float32) / 2.0
        num = imgproc.sep_filter2d(vals, k, k)
        den = imgproc.sep_filter2d(wts, k, k)
        return num / jnp.maximum(den, 1e-9)

    return jnp.stack([interp(m) for m in masks], axis=-1)
