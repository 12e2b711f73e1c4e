"""Hough transforms: lines and line segments.

Reference: cv::HoughLines / HoughLinesP (imgproc/src/hough.cpp:108,462)
and the GPU pipeline used by the fork's lane-detection sample —
cuda::HoughSegmentDetector (cudaimgproc/src/cuda/hough_segments.cu,
sample samples/gpu/lane_detection.cpp:244).

TPU-native re-design:
- the vote accumulator is a dense [n_theta, n_rho] histogram built with
  one `bincount` per theta bin over the whole edge mask (no scatter
  contention — the GPU version needs shared-memory atomics);
- HoughLinesP's sequential random walk along edges is replaced by a
  deterministic batched variant: take the top-K accumulator peaks, then
  walk each line's pixels *in parallel* (fixed-length sampling), close
  gaps with a 1-D morphological pass, and extract the longest run with a
  prefix scan. One `vmap` over lines.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import masked_top_k


def hough_lines_accumulator(
    edges: jnp.ndarray, rho_res: float = 1.0, theta_res: float = math.pi / 180.0
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense vote accumulator. Returns (acc [n_theta, n_rho], thetas,
    rhos)."""
    h, w = edges.shape
    diag = math.hypot(h, w)
    n_rho = int(2 * math.ceil(diag / rho_res)) + 1
    n_theta = int(round(math.pi / theta_res))
    thetas = jnp.arange(n_theta, dtype=jnp.float32) * theta_res
    rho_off = (n_rho - 1) / 2

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    weights = edges.reshape(-1).astype(jnp.float32)

    def one_theta(theta):
        rho = xx * jnp.cos(theta) + yy * jnp.sin(theta)
        idx = jnp.round(rho / rho_res + rho_off).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_rho - 1)
        return jnp.bincount(idx, weights=weights, length=n_rho)

    acc = jax.vmap(one_theta)(thetas)
    rhos = (jnp.arange(n_rho, dtype=jnp.float32) - rho_off) * rho_res
    return acc, thetas, rhos


def hough_lines(
    edges: jnp.ndarray,
    threshold: float,
    max_lines: int = 32,
    rho_res: float = 1.0,
    theta_res: float = math.pi / 180.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K (rho, theta) line peaks with 3x3 accumulator NMS.
    Returns (lines [K, 2] as (rho, theta), valid [K])."""
    acc, thetas, rhos = hough_lines_accumulator(edges, rho_res, theta_res)
    peak = imgproc.nms_2d(acc) & (acc > threshold)
    idx, keep = masked_top_k(acc.reshape(-1), peak.reshape(-1), max_lines)
    n_rho = rhos.shape[0]
    t_idx = idx // n_rho
    r_idx = idx % n_rho
    lines = jnp.stack([rhos[r_idx], thetas[t_idx]], axis=-1)
    return lines, keep


class Segments(NamedTuple):
    xyxy: jnp.ndarray  # [K, 4] (x0, y0, x1, y1)
    valid: jnp.ndarray  # [K]


def hough_segments(
    edges: jnp.ndarray,
    threshold: float = 30.0,
    min_line_length: int = 20,
    max_line_gap: int = 4,
    max_lines: int = 32,
    rho_res: float = 1.0,
    theta_res: float = math.pi / 180.0,
) -> Segments:
    """Line segments (HoughSegmentDetector analog): for each peak line,
    march along it, bridge gaps <= max_line_gap, keep the longest run if
    >= min_line_length."""
    h, w = edges.shape
    lines, lvalid = hough_lines(edges, threshold, max_lines, rho_res, theta_res)
    # points on the line lie within +/- diag of the foot point
    diag = int(math.ceil(math.hypot(h, w)))
    n_steps = 2 * diag + 1
    ts = jnp.arange(n_steps, dtype=jnp.float32) - diag

    def one_line(rho, theta, ok):
        c, s = jnp.cos(theta), jnp.sin(theta)
        # line point closest to origin + direction (-sin, cos)
        x0, y0 = rho * c, rho * s
        xs = x0 - ts * s
        ys = y0 + ts * c
        inside = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
        xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
        # tolerate 1px off-line: OR over the 3x3 neighbourhood of samples
        hit = jnp.zeros_like(inside)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                hit = hit | edges[
                    jnp.clip(yi + dy, 0, h - 1), jnp.clip(xi + dx, 0, w - 1)
                ]
        hit = hit & inside & ok
        # close gaps: dilate then erode by max_line_gap along t
        g = max_line_gap
        closed = hit
        for _ in range(g):
            closed = closed | jnp.roll(closed, 1) | jnp.roll(closed, -1)
        for _ in range(g):
            closed = closed & jnp.roll(closed, 1) & jnp.roll(closed, -1)
        closed = closed & inside & ok
        # longest run via scan: run[t] = closed[t] ? run[t-1]+1 : 0
        def scan_fn(carry, b):
            run = jnp.where(b, carry + 1, 0)
            return run, run

        _, runs = lax.scan(scan_fn, jnp.int32(0), closed)
        end = jnp.argmax(runs)
        length = runs[end]
        start = end - length + 1
        seg = jnp.stack([xs[start], ys[start], xs[end], ys[end]])
        return seg, length >= min_line_length

    xyxy, valid = jax.vmap(one_line)(lines[:, 0], lines[:, 1], lvalid)
    return Segments(xyxy=xyxy, valid=valid & lvalid)


# ------------------------------------------------------------- circles ---

class Circles(NamedTuple):
    xyr: jnp.ndarray   # [K, 3] (cx, cy, r)
    votes: jnp.ndarray # [K] center accumulator support
    valid: jnp.ndarray # [K]


def hough_circles(
    img: jnp.ndarray,
    min_radius: int = 5,
    max_radius: int = 40,
    radius_step: int = 1,
    canny_threshold: float = 100.0,
    acc_threshold: float = 18.0,
    min_dist: int = 10,
    max_circles: int = 32,
) -> Circles:
    """HOUGH_GRADIENT circle detection (cv::HoughCircles,
    imgproc/src/hough.cpp icvHoughCirclesGradient; GPU
    cudaimgproc/src/hough_circles.cpp).

    TPU-native two-phase shape kept: (1) every edge pixel votes for
    centers along +/- its gradient direction at each radius in the ladder
    — one bincount scatter per radius, no atomics; (2) the radius of each
    center candidate is read off a per-candidate distance histogram over
    all edge pixels at once (a [K, H*W] masked reduce instead of the
    reference's per-center sort).
    """
    from opencv_tpu.ops import edges as edges_mod

    img = img.astype(jnp.float32)
    h, w = img.shape
    e = edges_mod.canny(img, canny_threshold * 0.5, canny_threshold)
    gx, gy = imgproc.sobel_derivatives(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    inv = 1.0 / jnp.maximum(mag, 1e-6)
    cosd, sind = gx * inv, gy * inv

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    wts = e.reshape(-1).astype(jnp.float32)
    cf, sf = cosd.reshape(-1), sind.reshape(-1)

    radii = list(range(min_radius, max_radius + 1, radius_step))
    acc = jnp.zeros((h * w,), jnp.float32)
    for r in radii:
        for sgn in (1.0, -1.0):
            cx = xx + sgn * r * cf
            cy = yy + sgn * r * sf
            inside = (cx >= 0) & (cx <= w - 1) & (cy >= 0) & (cy <= h - 1)
            ci = (
                jnp.clip(jnp.round(cy), 0, h - 1) * w
                + jnp.clip(jnp.round(cx), 0, w - 1)
            ).astype(jnp.int32)
            acc = acc + jnp.bincount(
                ci, weights=wts * inside, length=h * w
            )
    acc2d = acc.reshape(h, w)
    peak = imgproc.nms_2d(acc2d, radius=max(1, min_dist // 2)) & (
        acc2d > acc_threshold
    )
    idx, keep = masked_top_k(acc, peak.reshape(-1), max_circles)
    cys = (idx // w).astype(jnp.float32)
    cxs = (idx % w).astype(jnp.float32)

    # phase 2: per-candidate radius histogram over edge pixels
    n_bins = len(radii)
    r0 = jnp.float32(min_radius)

    def radius_of(cx, cy):
        d = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        b = jnp.round((d - r0) / radius_step).astype(jnp.int32)
        ok = (b >= 0) & (b < n_bins) & (wts > 0)
        hist = jnp.bincount(
            jnp.clip(b, 0, n_bins - 1), weights=ok.astype(jnp.float32),
            length=n_bins,
        )
        bi = jnp.argmax(hist)
        return r0 + bi.astype(jnp.float32) * radius_step, hist[bi]

    rads, support = jax.vmap(radius_of)(cxs, cys)
    valid = keep & (support > acc_threshold)
    return Circles(
        xyr=jnp.stack([cxs, cys, rads], axis=-1),
        votes=jnp.where(keep, acc[idx], 0.0),
        valid=valid,
    )


# -------------------------------------------------- generalized Hough ---

class GHoughTable(NamedTuple):
    """Ballard R-table: displacement vectors from edge points to the
    template reference point, binned by gradient orientation."""
    disp: jnp.ndarray   # [n_bins, cap, 2] (dx, dy)
    count: jnp.ndarray  # [n_bins] valid entries per bin
    n_bins: int


def build_r_table(
    template: jnp.ndarray,
    canny_threshold: float = 100.0,
    n_bins: int = 32,
    cap: int = 64,
) -> GHoughTable:
    """R-table from a template image (GeneralizedHoughBallard::setTemplate,
    imgproc/src/generalized_hough.cpp). Reference point = template center."""
    from opencv_tpu.ops import edges as edges_mod

    t = template.astype(jnp.float32)
    th, tw = t.shape
    e = edges_mod.canny(t, canny_threshold * 0.5, canny_threshold)
    gx, gy = imgproc.sobel_derivatives(t)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    binidx = jnp.mod(
        jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * n_bins).astype(jnp.int32),
        n_bins,
    )
    yy = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
    dx = (tw - 1) / 2.0 - xx  # displacement to the reference point
    dy = (th - 1) / 2.0 - yy

    flat_e = e.reshape(-1)
    flat_bin = binidx.reshape(-1)
    flat_dx = dx.reshape(-1)
    flat_dy = dy.reshape(-1)

    # per-bin compaction to fixed capacity: rank edge pixels within their
    # bin by gradient magnitude and keep the strongest `cap`
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(-1)
    disp = jnp.zeros((n_bins, cap, 2), jnp.float32)
    count = jnp.zeros((n_bins,), jnp.int32)
    for b in range(n_bins):  # static unroll: n_bins is a config constant
        inbin = flat_e & (flat_bin == b)
        idx, keep = masked_top_k(mag, inbin, cap)
        disp = disp.at[b].set(
            jnp.stack([flat_dx[idx], flat_dy[idx]], -1)
            * keep[:, None].astype(jnp.float32)
        )
        count = count.at[b].set(jnp.sum(keep))
    return GHoughTable(disp=disp, count=count, n_bins=n_bins)


class GHoughDetections(NamedTuple):
    xy: jnp.ndarray     # [K, 2] detected reference points
    votes: jnp.ndarray  # [K]
    angle: jnp.ndarray  # [K] best template rotation (rad)
    scale: jnp.ndarray  # [K]
    valid: jnp.ndarray  # [K]


def generalized_hough(
    img: jnp.ndarray,
    table: GHoughTable,
    canny_threshold: float = 100.0,
    vote_threshold: float = 30.0,
    max_detections: int = 8,
    min_dist: int = 16,
    max_edge_points: int = 4096,
    angles: tuple[float, ...] = (0.0,),
    scales: tuple[float, ...] = (1.0,),
) -> GHoughDetections:
    """Generalized Hough detection (GeneralizedHoughBallard::detect; with
    angle/scale grids it covers the Guil position+rotation+scale variant,
    imgproc/src/generalized_hough.cpp + cudaimgproc generalized_hough.cu).

    TPU-native: image edge pixels are compacted to a fixed-size masked
    list; votes are one [P, cap, 2] broadcast + bincount per (angle,
    scale) cell — brute-force over the transform grid instead of the
    reference's sequential 4-stage Guil pipeline (grids of a few dozen
    cells are cheap when each cell is a fused scatter)."""
    from opencv_tpu.ops import edges as edges_mod

    img = img.astype(jnp.float32)
    h, w = img.shape
    e = edges_mod.canny(img, canny_threshold * 0.5, canny_threshold)
    gx, gy = imgproc.sobel_derivatives(img)
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(-1)
    ang = jnp.arctan2(gy, gx).reshape(-1)

    idx, keep = masked_top_k(mag, e.reshape(-1), max_edge_points)
    px = (idx % w).astype(jnp.float32)
    py = (idx // w).astype(jnp.float32)
    pang = ang[idx]

    n_bins = table.n_bins
    slot = jnp.arange(table.disp.shape[1])
    best_acc = None
    best_meta = None
    for a in angles:
        for s in scales:
            # orientation shifts by the template rotation
            b = jnp.mod(
                jnp.floor((pang - a + jnp.pi) / (2 * jnp.pi) * n_bins).astype(
                    jnp.int32
                ),
                n_bins,
            )
            d = table.disp[b]  # [P, cap, 2]
            ca, sa = jnp.cos(a), jnp.sin(a)
            dxr = s * (ca * d[..., 0] - sa * d[..., 1])
            dyr = s * (sa * d[..., 0] + ca * d[..., 1])
            okslot = slot[None, :] < table.count[b][:, None]
            cx = px[:, None] + dxr
            cy = py[:, None] + dyr
            inside = (
                (cx >= 0) & (cx <= w - 1) & (cy >= 0) & (cy <= h - 1)
                & okslot & keep[:, None]
            )
            ci = (
                jnp.clip(jnp.round(cy), 0, h - 1) * w
                + jnp.clip(jnp.round(cx), 0, w - 1)
            ).astype(jnp.int32)
            acc = jnp.bincount(
                ci.reshape(-1),
                weights=inside.reshape(-1).astype(jnp.float32),
                length=h * w,
            )
            # light 3x3 smoothing so votes off by one pixel still stack
            acc2 = imgproc.box_filter(acc.reshape(h, w), 3) * 9.0
            if best_acc is None:
                best_acc, best_meta = acc2, (
                    jnp.full((h, w), a), jnp.full((h, w), s)
                )
            else:
                better = acc2 > best_acc
                best_acc = jnp.where(better, acc2, best_acc)
                best_meta = (
                    jnp.where(better, a, best_meta[0]),
                    jnp.where(better, s, best_meta[1]),
                )

    peak = imgproc.nms_2d(best_acc, radius=max(1, min_dist // 2)) & (
        best_acc > vote_threshold
    )
    fidx, fkeep = masked_top_k(
        best_acc.reshape(-1), peak.reshape(-1), max_detections
    )
    return GHoughDetections(
        xy=jnp.stack(
            [(fidx % w).astype(jnp.float32), (fidx // w).astype(jnp.float32)],
            -1,
        ),
        votes=jnp.where(fkeep, best_acc.reshape(-1)[fidx], 0.0),
        angle=best_meta[0].reshape(-1)[fidx],
        scale=best_meta[1].reshape(-1)[fidx],
        valid=fkeep,
    )
