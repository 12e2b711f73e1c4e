"""Image-processing primitives as XLA convolutions (single backend, no funnel).

TPU-native re-expression of the reference's L2 layer
(modules/imgproc/src/{smooth.dispatch.cpp,deriv.cpp,resize.cpp,pyramids.cpp}
and the CUDA mirrors in cudafilters/cudawarping). Everything here is pure
jnp/lax on f32 [H, W] (or [..., H, W]) arrays; XLA fuses the elementwise
tails into the convolutions, and on TPU the small separable convolutions
run on the VPU over (8, 128) tiles.

Border convention: OpenCV's default BORDER_REFLECT_101 == numpy/jnp
``mode="reflect"``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """RGB [H,W,3] (or gray [H,W]) -> gray f32 [H,W].

    Uses the same Rec.601 weights as cv::cvtColor COLOR_RGB2GRAY
    (reference: imgproc/src/color.cpp).
    """
    img = img.astype(jnp.float32)
    if img.ndim == 2:
        return img
    w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    return img @ w


def _reflect_pad(img: jnp.ndarray, ry: int, rx: int) -> jnp.ndarray:
    pad = [(0, 0)] * (img.ndim - 2) + [(ry, ry), (rx, rx)]
    return jnp.pad(img, pad, mode="reflect")


def sep_filter2d(img: jnp.ndarray, ky: jnp.ndarray, kx: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation with BORDER_REFLECT_101.

    img: [..., H, W]; ky: [kh]; kx: [kw]. Analog of cv::sepFilter2D
    (reference: imgproc/src/filter.cpp) and the per-type row/column CUDA
    filters (cudafilters/src/cuda/{row,column}_filter.*.cu).

    Implemented as shift-and-accumulate over padded slices, NOT
    lax.conv: single-channel small-kernel convs hit a slow TPU path
    (~0.7 ms/conv on a KITTI frame), while k slice-FMAs fuse into one
    bandwidth-bound elementwise pass.
    """
    kh, kw = ky.shape[0], kx.shape[0]
    h, w = img.shape[-2:]
    x = _reflect_pad(img.astype(jnp.float32), kh // 2, kw // 2)
    ky = np.asarray(ky, np.float32)
    kx = np.asarray(kx, np.float32)
    # vertical pass over rows of the padded array
    acc = None
    for i in range(kh):
        term = float(ky[i]) * x[..., i : i + h, :]
        acc = term if acc is None else acc + term
    out = None
    for j in range(kw):
        term = float(kx[j]) * acc[..., :, j : j + w]
        out = term if out is None else out + term
    return out


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """Matches cv::getGaussianKernel (reference: imgproc/src/smooth.dispatch.cpp):
    sigma<=0 -> 0.3*((ksize-1)*0.5 - 1) + 0.8. Returns a NumPy array:
    filter taps are static metadata, never traced values."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float32) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / np.sum(k)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """cv::GaussianBlur analog (reference: imgproc/src/smooth.dispatch.cpp:480).

    ORB uses ksize=7, sigma=2 before descriptor sampling
    (reference: features2d/src/orb.cpp:1168-1175).
    """
    k = gaussian_kernel1d(ksize, sigma)
    return sep_filter2d(img, k, k)


def box_filter(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    k = np.full((ksize,), 1.0 / ksize, np.float32)
    return sep_filter2d(img, k, k)


def box_sum_integral(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """(2r+1)^2 un-normalized box sum via integral images (cumsum): two
    prefix sums + four shifted reads, independent of ksize. Border
    behavior: zero outside (differs from reflect; callers on interior
    pixels are unaffected). The cv::integral trick
    (cudaarithm gridIntegral / imgproc/src/sumpixels.cpp)."""
    r = ksize // 2
    h, w = img.shape[-2:]
    pad = [(0, 0)] * (img.ndim - 2) + [(r + 1, r), (r + 1, r)]
    x = jnp.pad(img.astype(jnp.float32), pad)
    ii = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    a = ii[..., : h, : w]
    b = ii[..., : h, ksize :]
    c = ii[..., ksize :, : w]
    d = ii[..., ksize :, ksize :]
    return d - b - c + a


def threshold(
    img: jnp.ndarray, thresh: float, maxval: float = 255.0, kind: str = "binary"
) -> jnp.ndarray:
    """cv::threshold analog (imgproc/src/thresh.cpp). kinds: binary,
    binary_inv, trunc, tozero, tozero_inv."""
    img = img.astype(jnp.float32)
    above = img > thresh
    if kind == "binary":
        return jnp.where(above, maxval, 0.0)
    if kind == "binary_inv":
        return jnp.where(above, 0.0, maxval)
    if kind == "trunc":
        return jnp.where(above, thresh, img)
    if kind == "tozero":
        return jnp.where(above, img, 0.0)
    if kind == "tozero_inv":
        return jnp.where(above, 0.0, img)
    raise ValueError(f"unknown threshold kind {kind}")


def otsu_threshold(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Otsu's threshold value (THRESH_OTSU analog) for u8-range images:
    maximize between-class variance over all split points."""
    idx = jnp.clip(img.astype(jnp.int32), 0, bins - 1)
    hist = jnp.bincount(idx.reshape(-1), length=bins).astype(jnp.float32)
    total = jnp.sum(hist)
    levels = jnp.arange(bins, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)
    sum0 = jnp.cumsum(hist * levels)
    sum_all = sum0[-1]
    w1 = total - w0
    mu0 = sum0 / jnp.maximum(w0, 1e-9)
    mu1 = (sum_all - sum0) / jnp.maximum(w1, 1e-9)
    between = w0 * w1 * (mu0 - mu1) ** 2
    between = jnp.where((w0 > 0) & (w1 > 0), between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


def integral(img: jnp.ndarray) -> jnp.ndarray:
    """cv::integral analog: [H+1, W+1] with a zero first row/col."""
    h, w = img.shape[-2:]
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)]
    x = jnp.pad(img.astype(jnp.float32), pad)
    return jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)


def scharr_derivatives(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dx, dy) with the 3x3 Scharr operator, matching the LK pyramid's
    `calcSharrDeriv` (reference: video/src/lkpyramid.cpp:55 — smooth
    [3,10,3]/32, diff [-1,0,1])."""
    smooth = np.array([3.0, 10.0, 3.0], np.float32) / 32.0
    diff = np.array([-1.0, 0.0, 1.0], np.float32)
    dx = sep_filter2d(img, smooth, diff)
    dy = sep_filter2d(img, diff, smooth)
    return dx, dy


def sobel_derivatives(img: jnp.ndarray, ksize: int = 3) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(dx, dy) Sobel (reference: imgproc/src/deriv.cpp)."""
    if ksize == 3:
        smooth = np.array([1.0, 2.0, 1.0], np.float32)
        diff = np.array([-1.0, 0.0, 1.0], np.float32)
    elif ksize == 5:
        smooth = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32)
        diff = np.array([-1.0, -2.0, 0.0, 2.0, 1.0], np.float32)
    else:
        raise ValueError(f"unsupported sobel ksize {ksize}")
    dx = sep_filter2d(img, smooth, diff)
    dy = sep_filter2d(img, diff, smooth)
    return dx, dy


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (cv::resize INTER_LINEAR
    coordinate convention, reference: imgproc/src/resize.cpp:3713).

    Implemented as two 1-D interpolation matmuls so the gather becomes an
    MXU-friendly dense contraction instead of a scatter/gather: for KITTI-
    sized images the interpolation matrices are tiny and XLA constant-folds
    them.
    """
    h, w = img.shape[-2:]

    def interp_matrix(n_out: int, n_in: int) -> jnp.ndarray:
        scale = n_in / n_out
        coords = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
        coords = jnp.clip(coords, 0.0, n_in - 1.0)
        lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n_in - 2)
        frac = coords - lo.astype(jnp.float32)
        m = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        m = m.at[rows, lo].set(1.0 - frac)
        m = m.at[rows, lo + 1].add(frac)
        return m

    my = interp_matrix(out_h, h)  # [out_h, h]
    mx = interp_matrix(out_w, w)  # [out_w, w]
    x = img.astype(jnp.float32)
    out = jnp.einsum("oh,...hw->...ow", my, x)
    out = jnp.einsum("pw,...ow->...op", mx, out)
    return out


def harris_response(
    img: jnp.ndarray, block_size: int = 7, k: float = 0.04, deriv: str = "harris_orb"
) -> jnp.ndarray:
    """Per-pixel Harris corner response det(M) - k*tr(M)^2.

    `deriv="harris_orb"` reproduces ORB's HarrisResponses (reference:
    features2d/src/orb.cpp:130-172): central differences (no smoothing),
    7x7 un-weighted block sum, scale (1/(4*7*255))^4 folded in by the
    caller. `deriv="sobel"` matches cv::cornerHarris
    (imgproc/src/corner.cpp:638).
    """
    if deriv == "harris_orb":
        dfilt = np.array([-1.0, 0.0, 1.0], np.float32)
        one = np.array([1.0], np.float32)
        ix = sep_filter2d(img, one, dfilt)
        iy = sep_filter2d(img, dfilt, one)
    else:
        ix, iy = sobel_derivatives(img)
    # block sums via integral images: O(1) in block_size, two cumsums
    # per channel instead of 2*block_size shift-FMAs
    sxx = box_sum_integral(ix * ix, block_size)
    syy = box_sum_integral(iy * iy, block_size)
    sxy = box_sum_integral(ix * iy, block_size)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def min_eig_response(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """cv::cornerMinEigenVal analog (reference: imgproc/src/corner.cpp:554)."""
    ix, iy = sobel_derivatives(img)
    a = box_sum_integral(ix * ix, block_size) * 0.5
    c = box_sum_integral(iy * iy, block_size) * 0.5
    b = box_sum_integral(ix * iy, block_size) * 0.5
    return (a + c) - jnp.sqrt((a - c) * (a - c) + b * b)


def nms_2d(score: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """3x3 (or (2r+1)^2) non-maximum suppression mask.

    Mirrors the GPU FAST nonmaxSuppression kernel's strict-greater test
    (reference: cudafeatures2d/src/cuda/fast.cu:318): a pixel survives iff
    its score is strictly greater than every neighbour's.
    """
    neg_inf = jnp.array(-jnp.inf, score.dtype)
    # ">" against earlier (top-left) neighbours, ">=" against later ones:
    # ties break toward the earlier pixel so NMS stays deterministic.
    keep = jnp.ones_like(score, bool)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            nb = shift2d(score, dy, dx, fill=neg_inf)
            if (dy, dx) < (0, 0):
                keep &= score > nb
            else:
                keep &= score >= nb
    return keep


def shift2d(img: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """Shift image content by (dy, dx); out-of-range filled with `fill`.

    shift2d(img, dy, dx)[y, x] == img[y + dy, x + dx] (clipped).
    The building block for vectorized stencil ops (FAST circle taps).
    """
    h, w = img.shape[-2:]
    out = jnp.full_like(img, fill)
    src_y = slice(max(dy, 0), h + min(dy, 0))
    dst_y = slice(max(-dy, 0), h + min(-dy, 0))
    src_x = slice(max(dx, 0), w + min(dx, 0))
    dst_x = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[..., dst_y, dst_x].set(img[..., src_y, src_x])


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample img [H,W] at continuous (x, y) positions [...,2] with bilinear
    interpolation and edge clamping. The TPU analog of the texture-unit
    fetches in the CUDA LK kernel (cudaoptflow/src/cuda/pyrlk.cu:67-85).
    """
    h, w = img.shape[-2:]
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    i00 = img[..., y0, x0]
    i01 = img[..., y0, x0 + 1]
    i10 = img[..., y0 + 1, x0]
    i11 = img[..., y0 + 1, x0 + 1]
    top = i00 * (1.0 - fx) + i01 * fx
    bot = i10 * (1.0 - fx) + i11 * fx
    return top * (1.0 - fy) + bot * fy


def remap(img: jnp.ndarray, map_xy: jnp.ndarray) -> jnp.ndarray:
    """cv::remap analog (reference: imgproc/src/imgwarp.cpp:1664):
    out[y, x] = img(map_xy[y, x, 0], map_xy[y, x, 1]) bilinear."""
    return bilinear_sample(img, map_xy)


def warp_affine(img: jnp.ndarray, m: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv::warpAffine analog (reference: imgproc/src/imgwarp.cpp:2572).
    m: [2,3] maps *output* coords to input coords (WARP_INVERSE_MAP
    convention — the natural formulation for gather-based sampling)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    src_x = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    src_y = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    return bilinear_sample(img, jnp.stack([src_x, src_y], axis=-1))


def warp_perspective(img: jnp.ndarray, m: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv::warpPerspective analog (reference: imgproc/src/imgwarp.cpp:2881).
    m: [3,3] output->input homography."""
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    denom = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    src_x = (m[0, 0] * xs + m[0, 1] * ys + m[0, 2]) / denom
    src_y = (m[1, 0] * xs + m[1, 1] * ys + m[1, 2]) / denom
    return bilinear_sample(img, jnp.stack([src_x, src_y], axis=-1))


def warp_polar(
    img: jnp.ndarray,
    dsize: tuple[int, int],
    center: tuple[float, float],
    max_radius: float,
    log: bool = False,
    inverse: bool = False,
) -> jnp.ndarray:
    """cv::warpPolar analog (reference: imgproc/src/imgwarp.cpp:3248).

    Forward: dst[phi, rho] samples src along the ray of angle
    2*pi*phi/H at radius rho*maxR/W (linear) or exp(rho*ln(maxR)/W)-1
    (semilog). Inverse maps a polar image back to cartesian. The
    reference's per-row loops become one [H, W] fused map + remap;
    out-of-range samples clamp at the border (our remap convention)
    rather than cv's BORDER_TRANSPARENT.
    """
    h, w = dsize
    cx, cy = center
    kangle = 2.0 * math.pi / h
    if not inverse:
        rho_i = jnp.arange(w, dtype=jnp.float32)
        if log:
            kmag = math.log(max(max_radius, 1e-9)) / w
            rhos = jnp.exp(rho_i * kmag) - 1.0
        else:
            rhos = rho_i * (max_radius / w)
        phi = jnp.arange(h, dtype=jnp.float32) * kangle
        mx = rhos[None, :] * jnp.cos(phi)[:, None] + cx
        my = rhos[None, :] * jnp.sin(phi)[:, None] + cy
        return remap(img, jnp.stack([mx, my], axis=-1))
    sh, sw = img.shape[-2:]
    kangle_s = 2.0 * math.pi / sh
    kmag = (
        math.log(max(max_radius, 1e-9)) / sw if log else max_radius / sw
    )
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    dx = xs - cx
    dy = ys - cy
    mag = jnp.sqrt(dx * dx + dy * dy)
    if log:
        mag = jnp.log(mag + 1.0)
    ang = jnp.arctan2(dy, dx)
    ang = jnp.where(ang < 0, ang + 2.0 * math.pi, ang)
    mx = mag / kmag
    my = ang / kangle_s
    return remap(img, jnp.stack([mx, my], axis=-1))


def linear_polar(
    img: jnp.ndarray,
    center: tuple[float, float],
    max_radius: float,
    inverse: bool = False,
) -> jnp.ndarray:
    """cv::linearPolar analog (legacy API: dst size == src size)."""
    return warp_polar(
        img, img.shape[-2:], center, max_radius, log=False, inverse=inverse
    )


def log_polar(
    img: jnp.ndarray,
    center: tuple[float, float],
    m: float,
    inverse: bool = False,
) -> jnp.ndarray:
    """cv::logPolar analog. `m` is the legacy magnitude-scale parameter;
    the reference converts it as maxRadius = exp(W / m)
    (imgwarp.cpp logPolar)."""
    w = img.shape[-1]
    max_radius = math.exp(w / m) if m > 0 else 1.0
    return warp_polar(
        img, img.shape[-2:], center, max_radius, log=True, inverse=inverse
    )
