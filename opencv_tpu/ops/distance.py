"""Distance transform, flood fill, mean-shift filtering.

Reference: cv::distanceTransform (imgproc/src/distransform.cpp),
cv::floodFill (imgproc/src/floodfill.cpp), cuda::meanShiftFiltering
(cudaimgproc/src/mean_shift.cpp).

TPU-native:
- exact Euclidean distance transform by the Felzenszwalb-Huttenlocher
  separable lower-envelope method, with the sequential envelope scan
  replaced by a dense O(n) -per-output minimization over candidate
  parabolas (row/column lengths are small; the [n, n] candidate matrix
  is one fused VPU pass per axis);
- flood fill = connected-component label propagation from a seed;
- mean shift = fixed-trip iteration of the joint spatial/range kernel
  mean, all pixels at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def _edt_1d(f: jnp.ndarray) -> jnp.ndarray:
    """1-D squared-distance transform along the last axis:
    out[i] = min_j (i - j)^2 + f[j]. Dense candidate form."""
    n = f.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32)
    d = (i[:, None] - i[None, :]) ** 2  # [n, n]
    return jnp.min(f[..., None, :] + d, axis=-1)


def distance_transform(mask: jnp.ndarray) -> jnp.ndarray:
    """Exact Euclidean distance to the nearest zero (background) pixel
    for every nonzero pixel (cv::distanceTransform DIST_L2 with exact
    computation; the reference's 3x3/5x5 masks are approximations)."""
    big = jnp.float32(1e12)
    f = jnp.where(mask, big, 0.0)
    d = _edt_1d(f)  # along columns of each row
    d = _edt_1d(d.T).T  # then along rows of each column
    return jnp.sqrt(d)


def flood_fill(
    img: jnp.ndarray, seed: tuple[int, int], new_val: float,
    lo_diff: float = 0.0, up_diff: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cv::floodFill analog (fixed-range variant): fill the connected
    region whose values lie within [seed - lo, seed + up].
    Returns (filled image, region mask)."""
    sy, sx = seed[1], seed[0]
    sval = img[sy, sx]
    candidate = (img >= sval - lo_diff) & (img <= sval + up_diff)
    region = jnp.zeros(img.shape, bool).at[sy, sx].set(True)

    def cond(carry):
        return carry[1]

    def body(carry):
        r, _ = carry
        grown = r
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            grown = grown | imgproc.shift2d(r, dy, dx, False)
        grown = grown & candidate
        return grown, jnp.any(grown != r)

    region, _ = lax.while_loop(cond, body, (region, jnp.bool_(True)))
    return jnp.where(region, new_val, img), region


def mean_shift_filter(
    img: jnp.ndarray, spatial_radius: int = 5, range_radius: float = 20.0,
    iters: int = 5,
) -> jnp.ndarray:
    """Grayscale mean-shift filtering (cuda::meanShiftFiltering analog):
    every pixel's value iterates toward the mode of its joint
    spatial/range neighbourhood."""
    img = img.astype(jnp.float32)
    r = spatial_radius

    def body(_, cur):
        num = jnp.zeros_like(cur)
        den = jnp.zeros_like(cur)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy * dy + dx * dx > r * r:
                    continue
                nb = imgproc.shift2d(img, dy, dx, fill=jnp.float32(1e9))
                w = (jnp.abs(nb - cur) <= range_radius).astype(jnp.float32)
                num = num + w * nb
                den = den + w
        return num / jnp.maximum(den, 1.0)

    return lax.fori_loop(0, iters, body, img)


def mean_shift_segmentation(
    img: jnp.ndarray,
    spatial_radius: int = 5,
    range_radius: float = 20.0,
    min_size: int = 20,
    iters: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean-shift segmentation (cuda::meanShiftSegmentation analog,
    cudaimgproc/src/mssegmentation.cpp): filter to modes, then merge
    pixels whose filtered values are within range_radius of their
    4-neighbours into labeled regions; regions below min_size dissolve
    into the dominant neighbour label by one majority-filter pass.

    Returns (labels i32 [H, W] — 1-based region ids, segmented image
    f32 [H, W] — per-region mean of the filtered values)."""
    f = mean_shift_filter(img, spatial_radius, range_radius, iters)
    h, w = f.shape
    # similarity graph -> connected components over "same mode" pixels:
    # quantize filtered values to range_radius bins and label
    q = jnp.round(f / jnp.maximum(range_radius, 1e-6)).astype(jnp.int32)
    # components of constant quantized value: label the boolean mask per
    # unique value is dynamic — instead label the full image where
    # neighbours must share the quantized value: encode by offsetting
    # each pixel's component seed and propagating mins only across
    # equal-value edges
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        + 1
    )
    big = jnp.int32(h * w + 2)
    labels = idx

    def sweep(labels):
        best = labels
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb = imgproc.shift2d(labels, dy, dx, fill=big)
            same = imgproc.shift2d(q, dy, dx, fill=jnp.int32(-(2**30))) == q
            best = jnp.minimum(best, jnp.where(same, nb, big))
        return best

    def cond(c):
        return c[1]

    def body(c):
        lab, _ = c
        new = sweep(lab)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))

    # region means + small-region absorption
    flat = labels.reshape(-1)
    n = h * w + 2
    cnt = jnp.zeros((n,), jnp.float32).at[flat].add(1.0)
    ssum = jnp.zeros((n,), jnp.float32).at[flat].add(f.reshape(-1))
    mean = ssum / jnp.maximum(cnt, 1.0)
    seg = mean[flat].reshape(h, w)
    small = (cnt[flat] < min_size).reshape(h, w)
    # dissolve small regions: take any large 4-neighbour's label
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb_lab = imgproc.shift2d(labels, dy, dx, fill=0)
        nb_small = imgproc.shift2d(small, dy, dx, fill=True)
        labels = jnp.where(small & ~nb_small & (nb_lab > 0), nb_lab, labels)
        small = (cnt[labels.reshape(-1)] < min_size).reshape(h, w)
    seg = mean[labels.reshape(-1)].reshape(h, w)
    return labels, seg
