"""Semi-global block matching (StereoSGBM) — TPU-native.

Reference semantics: calib3d/src/stereosgbm.cpp:1-2518 — Birchfield-
Tomasi sampling-insensitive pixel cost on an x-Sobel prefiltered image
(calcPixelCostBT), block aggregation, then the Hirschmuller semi-global
dynamic program along multiple scan directions
    Lr(p,d) = C(p,d) + min(Lr(p-r,d), Lr(p-r,d±1)+P1, min_d' Lr(p-r)+P2)
              − min_d' Lr(p-r),
summed over paths, with uniqueness-ratio, subpixel-parabola, left-right
consistency and speckle post-filters. The CUDA belief-propagation stereo
(cudastereo/src/stereobp.cpp) fills the same capability slot.

TPU-native design: the cost volume is one [D, H, W] tensor (disparity is
a batch axis, as in ops/stereo.py BM). Each SGM path is a `lax.scan`
along its scan axis whose carry is the whole perpendicular slice — the
banded min-plus update is O(D) vectorized element ops over [H, D] (or
[W, D]) per step, so one scan is H·W·D total VPU work, identical to the
sequential CPU algorithm but with every pixel of the wavefront in
flight. Diagonal paths reuse the row scan: the predecessor along (±1,±1)
is the previous row's carry shifted one column — no image skewing, no
gathers. (A log-depth `lax.associative_scan` formulation exists via
min-plus matrix composition, but composing [D,D] tropical matrices costs
D³ log W vs this scan's D·W — for D=64..256 the sequential-depth scan is
orders of magnitude less work and each step already saturates the VPU
lanes across the wavefront.)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc

# plain Python floats: module-level jnp constants would initialise the
# XLA backend at import, which breaks jax.distributed.initialize in
# multi-host workers (it must run before any backend-touching call)
INF = 1e9
# finite "masked" cost: keeps the DP normalization (c + best - m) NaN-free
# when every disparity of a column is out of range (left border)
BIG = 3e4


@dataclasses.dataclass(frozen=True)
class SGBMConfig:
    """Mirrors cv::StereoSGBM::create parameters (calib3d.hpp:2476)."""

    min_disparity: int = 0
    num_disparities: int = 64
    block_size: int = 5
    p1: float | None = None  # default 8 * block_size**2
    p2: float | None = None  # default 32 * block_size**2
    prefilter_cap: float = 63.0
    uniqueness_ratio: float = 10.0  # percent, as in OpenCV
    disp12_max_diff: float = 1.0  # <0 disables the LR check
    speckle_window_size: int = 100  # 0 disables
    speckle_range: float = 2.0
    num_paths: int = 8  # 8 = MODE_HH; 4 = axis-aligned only

    def penalties(self) -> tuple[float, float]:
        p1 = 8.0 * self.block_size**2 if self.p1 is None else self.p1
        p2 = 32.0 * self.block_size**2 if self.p2 is None else self.p2
        return float(p1), float(max(p2, p1 + 1.0))


def _bt_cost(left: jnp.ndarray, right: jnp.ndarray, d: int) -> jnp.ndarray:
    """Birchfield-Tomasi sampling-insensitive |left(x) - right(x-d)|.

    Each pixel is compared against the half-sample interpolated range of
    the other image (stereosgbm.cpp calcPixelCostBT semantics).
    """

    def half_range(img):
        l = 0.5 * (img + imgproc.shift2d(img, 0, 1, fill=0.0))
        r = 0.5 * (img + imgproc.shift2d(img, 0, -1, fill=0.0))
        lo = jnp.minimum(jnp.minimum(l, r), img)
        hi = jnp.maximum(jnp.maximum(l, r), img)
        return lo, hi

    rs = imgproc.shift2d(right, 0, -d, fill=0.0)  # rs[x] = right[x - d]
    lo_r, hi_r = half_range(rs)
    lo_l, hi_l = half_range(left)
    c_l = jnp.maximum(0.0, jnp.maximum(left - hi_r, lo_r - left))
    c_r = jnp.maximum(0.0, jnp.maximum(rs - hi_l, lo_l - rs))
    return jnp.minimum(c_l, c_r)


def cost_volume(
    left: jnp.ndarray, right: jnp.ndarray, cfg: SGBMConfig
) -> jnp.ndarray:
    """Aggregated BT cost volume [D, H, W]; out-of-range pixels get INF."""
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    w = left.shape[1]

    def prefilter(img):
        dx, _ = imgproc.sobel_derivatives(img)
        return jnp.clip(dx, -cfg.prefilter_cap, cfg.prefilter_cap)

    lp, rp = prefilter(left), prefilter(right)
    xs = jnp.arange(w)[None, :]
    planes = []
    for i in range(cfg.num_disparities):
        d = cfg.min_disparity + i
        c = _bt_cost(lp, rp, d) + 0.25 * _bt_cost(left, right, d)
        # window SUM (not mean): keeps cost magnitude in the same units
        # as the reference so the canonical P1/P2 = {8,32}·blockSize²
        # defaults transfer (stereosgbm.cpp hsumBuf accumulation)
        c = imgproc.box_sum_integral(c, cfg.block_size)
        planes.append(jnp.where(xs >= d + cfg.block_size // 2, c, BIG))
    return jnp.stack(planes, axis=0)


def _dp_update(l_prev: jnp.ndarray, c: jnp.ndarray, p1: float, p2: float):
    """One SGM step: l_prev, c are [..., D] slices along the path."""
    m = jnp.min(l_prev, axis=-1, keepdims=True)
    up = jnp.concatenate([l_prev[..., 1:], jnp.full_like(l_prev[..., :1], BIG)], -1)
    dn = jnp.concatenate([jnp.full_like(l_prev[..., :1], BIG), l_prev[..., :-1]], -1)
    best = jnp.minimum(
        jnp.minimum(l_prev, m + p2), jnp.minimum(up, dn) + p1
    )
    # cap so masked-cost columns don't blow up the normalized carry
    return jnp.minimum(c + best - m, BIG)


def _scan_path(cvol_dlast: jnp.ndarray, p1: float, p2: float, dx: int):
    """Aggregate along rows (top->bottom), predecessor offset dx columns.

    cvol_dlast: [H, W, D]. dx=0: vertical path; dx=±1: diagonals. The
    diagonal predecessor (y-1, x∓1) is the previous carry shifted by dx —
    reusing the row wavefront instead of skewing the volume.
    """

    def shift_cols(a, k):
        if k == 0:
            return a
        pad = jnp.full_like(a[:1], BIG)
        return (
            jnp.concatenate([pad, a[:-1]], 0) if k > 0
            else jnp.concatenate([a[1:], pad], 0)
        )

    def step(carry, c_row):  # carry, c_row: [W, D]
        l_row = _dp_update(shift_cols(carry, dx), c_row, p1, p2)
        return l_row, l_row

    # first row has no predecessor: L = C (standard SGM boundary)
    _, out = lax.scan(step, cvol_dlast[0], cvol_dlast[1:])
    return jnp.concatenate([cvol_dlast[:1], out], axis=0)


def aggregate(cvol: jnp.ndarray, cfg: SGBMConfig) -> jnp.ndarray:
    """Sum of per-path SGM costs, [D, H, W] -> [H, W, D]."""
    p1, p2 = cfg.penalties()
    v = jnp.moveaxis(cvol, 0, -1)  # [H, W, D]
    paths = []
    if cfg.num_paths >= 8:
        dxs = (-1, 0, 1)
    else:
        dxs = (0,)
    for dx in dxs:  # top->bottom family
        paths.append(_scan_path(v, p1, p2, dx))
        paths.append(_scan_path(v[::-1], p1, p2, dx)[::-1])  # bottom->top
    # left->right family: transpose W<->H and reuse the row scanner
    vt = jnp.swapaxes(v, 0, 1)  # [W, H, D]
    paths.append(jnp.swapaxes(_scan_path(vt, p1, p2, 0), 0, 1))
    paths.append(jnp.swapaxes(_scan_path(vt[::-1], p1, p2, 0)[::-1], 0, 1))
    return functools.reduce(jnp.add, paths)


def _subpixel(s: jnp.ndarray, best: jnp.ndarray) -> jnp.ndarray:
    """Parabola fit around the argmin along the last axis of s [H,W,D]."""
    d = s.shape[-1]
    bm1 = jnp.clip(best - 1, 0, d - 1)
    bp1 = jnp.clip(best + 1, 0, d - 1)
    take = functools.partial(jnp.take_along_axis, s)
    c0 = take(bm1[..., None], axis=-1)[..., 0]
    c1 = take(best[..., None], axis=-1)[..., 0]
    c2 = take(bp1[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(c0 + c2 - 2 * c1, 1e-6)
    delta = jnp.clip(0.5 * (c0 - c2) / denom, -0.5, 0.5)
    interior = (best > 0) & (best < d - 1)
    return best.astype(jnp.float32) + jnp.where(interior, delta, 0.0)


def compute_disparity_sgbm(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: SGBMConfig = SGBMConfig(),
) -> jnp.ndarray:
    """Disparity f32 [H, W]; invalid pixels = min_disparity - 1."""
    s = aggregate(cost_volume(left, right, cfg), cfg)  # [H, W, D]
    h, w, d = s.shape
    best = jnp.argmin(s, axis=-1)
    smin = jnp.min(s, axis=-1)

    # uniqueness: any disparity outside best±1 within ratio% kills it
    ds = jnp.arange(d)
    far = jnp.abs(ds[None, None, :] - best[..., None]) > 1
    competitor = jnp.min(jnp.where(far, s, INF), axis=-1)
    ok = competitor * 100.0 >= smin * (100.0 + cfg.uniqueness_ratio)
    # all-masked columns (left border) aggregate to ~n_paths*BIG
    ok &= smin < 0.9 * cfg.num_paths * BIG

    disp = _subpixel(s, best)

    if cfg.disp12_max_diff >= 0:
        # right-image disparity from the same volume: S(y, x+d, d)
        xs = jnp.arange(w)[None, :, None]
        cols = jnp.clip(xs + ds[None, None, :], 0, w - 1)
        s_r = jnp.take_along_axis(s, cols, axis=1)  # [H, W_right, D]
        s_r = jnp.where(xs + ds[None, None, :] < w, s_r, INF)
        best_r = jnp.argmin(s_r, axis=-1).astype(jnp.float32)  # [H, W]
        # disp at x in left maps to x-d in right
        xr = jnp.clip(
            (jnp.arange(w)[None, :] - jnp.round(disp)).astype(jnp.int32), 0, w - 1
        )
        dr = jnp.take_along_axis(best_r, xr, axis=1)
        ok &= jnp.abs(disp - dr) <= cfg.disp12_max_diff

    disp = disp + float(cfg.min_disparity)
    invalid = jnp.float32(cfg.min_disparity - 1)
    disp = jnp.where(ok, disp, invalid)
    if cfg.speckle_window_size > 0:
        disp = filter_speckles(
            disp, invalid, cfg.speckle_window_size, cfg.speckle_range
        )
    return disp


def filter_speckles(
    disp: jnp.ndarray,
    invalid: float,
    max_size: int,
    max_diff: float,
) -> jnp.ndarray:
    """cv::filterSpeckles semantics: kill connected blobs (4-connectivity
    under |Δd| <= max_diff) smaller than max_size pixels.

    Label propagation by iterated min-pooling over the masked adjacency —
    the same fixed-point trick as ops/ccomp.connected_components but with
    per-edge validity (neighbor similarity), so it stays jittable.
    """
    h, w = disp.shape
    valid = disp != invalid
    ids0 = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    ids0 = jnp.where(valid, ids0, jnp.int32(h * w))

    def neighbors(a, fill):
        return (
            imgproc.shift2d(a, 1, 0, fill=fill),
            imgproc.shift2d(a, -1, 0, fill=fill),
            imgproc.shift2d(a, 0, 1, fill=fill),
            imgproc.shift2d(a, 0, -1, fill=fill),
        )

    nd = neighbors(disp, invalid)
    similar = tuple(
        (jnp.abs(disp - x) <= max_diff) & (x != invalid) for x in nd
    )

    def sweep(ids):
        best = ids
        for sim, nb in zip(similar, neighbors(ids, jnp.int32(h * w))):
            best = jnp.minimum(best, jnp.where(sim, nb, h * w))
        return jnp.where(valid, best, h * w)

    def cond(c):
        return c[1]

    def body(c):
        ids, _ = c
        nxt = sweep(ids)
        return nxt, jnp.any(nxt != ids)

    ids, _ = lax.while_loop(cond, body, (ids0, jnp.bool_(True)))
    sizes = jnp.zeros(h * w + 1, jnp.int32).at[ids.reshape(-1)].add(1)
    keep = valid & (sizes[ids] >= max_size)
    return jnp.where(keep, disp, invalid)
