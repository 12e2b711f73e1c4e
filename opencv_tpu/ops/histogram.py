"""Histograms, equalization, CLAHE.

Reference: imgproc/src/histogram.cpp (calcHist, equalizeHist),
imgproc/src/clahe.cpp; GPU versions cudaimgproc/src/histogram.cpp +
cuda/clahe.cu.

TPU-native: histograms are `bincount` (one pass, no atomics); CLAHE's
per-tile LUTs are a [ty, tx, bins] tensor built with one segment-sum,
and the per-pixel bilinear blend of the 4 neighbouring tile LUTs is a
vectorized gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_hist(img: jnp.ndarray, bins: int = 256, value_range=(0.0, 256.0)) -> jnp.ndarray:
    lo, hi = value_range
    idx = jnp.clip(
        ((img.astype(jnp.float32) - lo) * bins / (hi - lo)).astype(jnp.int32),
        0, bins - 1,
    )
    return jnp.bincount(idx.reshape(-1), length=bins)


def equalize_hist(img: jnp.ndarray) -> jnp.ndarray:
    """cv::equalizeHist analog: u8-range grayscale in, equalized out."""
    hist = calc_hist(img).astype(jnp.float32)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    # scale so min nonzero cdf -> 0, max -> 255 (OpenCV convention)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf))
    lut = jnp.clip(
        jnp.round((cdf - cdf_min) / jnp.maximum(total - cdf_min, 1.0) * 255.0),
        0.0, 255.0,
    )
    idx = jnp.clip(img.astype(jnp.int32), 0, 255)
    return lut[idx]


def clahe(
    img: jnp.ndarray,
    clip_limit: float = 40.0,
    tile_grid: tuple[int, int] = (8, 8),
    bins: int = 256,
) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization
    (cv::createCLAHE analog). Image dims must divide by the tile grid
    (callers pad or crop)."""
    h, w = img.shape
    ty, tx = tile_grid
    th, tw = h // ty, w // tx
    img_c = jnp.clip(img.astype(jnp.float32), 0.0, 255.0)
    vals = jnp.clip(img_c[: ty * th, : tx * tw].astype(jnp.int32), 0, bins - 1)
    tiles = vals.reshape(ty, th, tx, tw)
    tile_id = (
        jnp.arange(ty)[:, None, None, None] * tx
        + jnp.arange(tx)[None, None, :, None]
    )
    flat_bin = (tile_id * bins + tiles).reshape(-1)
    hists = jnp.bincount(flat_bin, length=ty * tx * bins).reshape(ty, tx, bins)
    hists = hists.astype(jnp.float32)
    # clip + uniform redistribution (clahe.cpp clipHistogram)
    excess = jnp.sum(jnp.maximum(hists - clip_limit, 0.0), axis=-1, keepdims=True)
    hists = jnp.minimum(hists, clip_limit) + excess / bins
    cdf = jnp.cumsum(hists, axis=-1)
    area = th * tw
    luts = jnp.clip(jnp.round(cdf * (255.0 / area)), 0.0, 255.0)  # [ty,tx,bins]

    # bilinear interpolation between the 4 surrounding tile LUTs
    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, ty - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tx - 1)
    y1 = jnp.clip(y0 + 1, 0, ty - 1)
    x1 = jnp.clip(x0 + 1, 0, tx - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    pix = jnp.clip(img_c.astype(jnp.int32), 0, bins - 1)
    flat_luts = luts.reshape(-1)

    def sample(tyi, txi):
        lut_idx = (tyi[:, None] * tx + txi[None, :]) * bins + pix
        return flat_luts[lut_idx]

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
