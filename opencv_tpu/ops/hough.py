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
