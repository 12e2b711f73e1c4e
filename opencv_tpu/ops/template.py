"""Template matching (cv::matchTemplate analog, imgproc/src/templmatch.cpp;
GPU cudaimgproc/src/cuda/match_template.cu).

TPU-native: the correlation is one MXU conv; the normalization terms
(local sums / sums of squares under the template window) come from
integral images, exactly the reference's strategy but with cumsums
instead of serial row passes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def _valid_corr(img: jnp.ndarray, tmpl: jnp.ndarray) -> jnp.ndarray:
    """VALID cross-correlation [H-th+1, W-tw+1] via conv."""
    x = img[None, None].astype(jnp.float32)
    k = tmpl[None, None].astype(jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(x, k, (1, 1), "VALID", dimension_numbers=dn)
    return out[0, 0]


def _window_sums(img: jnp.ndarray, th: int, tw: int):
    """(sum, sum_sq) of every template-sized window (VALID)."""
    ii = imgproc.integral(img)
    ii2 = imgproc.integral(img.astype(jnp.float32) ** 2)

    def win(i):
        return (
            i[th:, tw:] - i[th:, :-tw] - i[:-th, tw:] + i[:-th, :-tw]
        )

    return win(ii), win(ii2)


def match_template(
    img: jnp.ndarray, tmpl: jnp.ndarray, method: str = "ccoeff_normed"
) -> jnp.ndarray:
    """Score map [H-th+1, W-tw+1]. Methods: sqdiff, sqdiff_normed, ccorr,
    ccorr_normed, ccoeff, ccoeff_normed (TM_* analogs)."""
    img = img.astype(jnp.float32)
    tmpl = tmpl.astype(jnp.float32)
    th, tw = tmpl.shape
    n = th * tw
    corr = _valid_corr(img, tmpl)
    wsum, wsum2 = _window_sums(img, th, tw)
    t_sum = jnp.sum(tmpl)
    t_sum2 = jnp.sum(tmpl * tmpl)
    eps = 1e-9

    if method == "ccorr":
        return corr
    if method == "ccorr_normed":
        return corr / (jnp.sqrt(wsum2 * t_sum2) + eps)
    if method == "sqdiff":
        return wsum2 - 2.0 * corr + t_sum2
    if method == "sqdiff_normed":
        return (wsum2 - 2.0 * corr + t_sum2) / (jnp.sqrt(wsum2 * t_sum2) + eps)
    # ccoeff: subtract means
    t_mean = t_sum / n
    cc = corr - wsum * t_mean
    if method == "ccoeff":
        return cc
    if method == "ccoeff_normed":
        t_var = t_sum2 - t_sum * t_sum / n
        w_var = wsum2 - wsum * wsum / n
        return cc / (jnp.sqrt(jnp.maximum(t_var * w_var, 0.0)) + eps)
    raise ValueError(f"unknown method {method}")
