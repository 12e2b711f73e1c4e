"""Histogram back-projection + meanShift/CamShift tracking.

Reference: modules/video/src/camshift.cpp:44 (meanShift), :110 (CamShift);
modules/imgproc/src/histogram.cpp:1519 (calcBackProject) — a named
tracking capability of the reference's video module.

TPU-first design: the reference recomputes dense ROI moments with
cv::moments every iteration (O(window) work, dynamic ROI shapes). Here
the moment integral images S, S·x, S·y (+ second orders for CamShift)
are built ONCE as cumulative sums; each mean-shift iteration is then
four O(1) corner gathers per moment inside a lax.while_loop — no
dynamic shapes, no per-iteration image passes. Histogram operations are
scatter-add / gather over quantized bin indices (static bin counts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _bin_indices(channel, n_bins, lo, hi):
    """cv2 uniform-histogram binning: idx = floor((v-lo)*n/(hi-lo)),
    valid only inside [lo, hi)."""
    v = channel.astype(jnp.float32)
    idx = jnp.floor((v - lo) * (n_bins / (hi - lo))).astype(jnp.int32)
    ok = (v >= lo) & (v < hi)
    return jnp.clip(idx, 0, n_bins - 1), ok


def calc_hist(channels, bins, ranges, mask=None, density=False):
    """N-dimensional uniform histogram over the given channels
    (imgproc/src/histogram.cpp calcHist semantics). channels: list of
    [H,W] arrays; bins: list of ints; ranges: list of (lo, hi).
    Returns hist with shape `bins`.

    (ops/histogram.calc_hist is the single-channel fast path used by
    equalize/CLAHE; this is the general N-D masked form back-projection
    needs.)"""
    flat_idx = jnp.zeros(channels[0].shape, jnp.int32)
    ok = jnp.ones(channels[0].shape, bool)
    stride = 1
    for ch, nb, (lo, hi) in reversed(list(zip(channels, bins, ranges))):
        idx, good = _bin_indices(ch, nb, float(lo), float(hi))
        flat_idx = flat_idx + idx * stride
        ok &= good
        stride *= nb
    if mask is not None:
        ok &= mask.astype(bool)
    w = ok.astype(jnp.float32).reshape(-1)
    hist = jnp.zeros((stride,), jnp.float32).at[flat_idx.reshape(-1)].add(w)
    hist = hist.reshape(tuple(bins))
    if density:
        hist = hist / jnp.maximum(jnp.sum(hist), 1e-12)
    return hist


def calc_back_project(channels, hist, ranges, scale=1.0):
    """Per-pixel histogram lookup (histogram.cpp:1519 calcBackProject):
    out[p] = hist[bin(p)] * scale, 0 outside the ranges."""
    bins = hist.shape
    flat_idx = jnp.zeros(channels[0].shape, jnp.int32)
    ok = jnp.ones(channels[0].shape, bool)
    stride = 1
    for ch, nb, (lo, hi) in reversed(list(zip(channels, bins, ranges))):
        idx, good = _bin_indices(ch, nb, float(lo), float(hi))
        flat_idx = flat_idx + idx * stride
        ok &= good
        stride *= nb
    vals = hist.reshape(-1)[flat_idx]
    return jnp.where(ok, vals * scale, 0.0)


def _moment_integrals(prob, order2=False):
    """Exclusive 2-D prefix sums of P, P·x, P·y (+ P·x², P·y², P·xy):
    window moments become 4-corner reads."""
    h, w = prob.shape
    p = prob.astype(jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    planes = [p, p * xx, p * yy]
    if order2:
        planes += [p * xx * xx, p * yy * yy, p * xx * yy]
    stack = jnp.stack(planes)  # [M,H,W]
    ii = jnp.cumsum(jnp.cumsum(stack, axis=1), axis=2)
    # pad to exclusive form [M,H+1,W+1]
    return jnp.pad(ii, ((0, 0), (1, 0), (1, 0)))


def _window_sums(ii, x, y, w, h):
    """Σ over rows [y,y+h) cols [x,x+w) for every moment plane."""
    tl = ii[:, y, x]
    tr = ii[:, y, x + w]
    bl = ii[:, y + h, x]
    br = ii[:, y + h, x + w]
    return br - tr - bl + tl


def mean_shift(prob, window, max_iter=100, eps=1.0):
    """cv::meanShift (camshift.cpp:44): iterate the window to its center
    of mass. prob [H,W] non-negative; window (x, y, w, h).
    Returns (n_iters, (x, y, w, h)). jit-friendly (static max_iter)."""
    h_img, w_img = prob.shape
    x0, y0, w0, h0 = [int(v) for v in window]
    # entry clip (reference: window &= Rect(0,0,W,H))
    x0 = max(x0, 0)
    y0 = max(y0, 0)
    w0 = max(min(w0, w_img - x0), 1)
    h0 = max(min(h0, h_img - y0), 1)

    ii = _moment_integrals(prob)
    eps2 = jnp.float32(round(max(eps, 0.0) ** 2))

    def cond(state):
        i, x, y, done = state
        return (i < max_iter) & ~done

    def body(state):
        i, x, y, done = state
        s, sx, sy = _window_sums(ii, x, y, w0, h0)
        empty = jnp.abs(s) < 1e-12
        # ROI-local centroid = global centroid - x
        dx = jnp.round(sx / jnp.where(empty, 1.0, s) - x - w0 * 0.5)
        dy = jnp.round(sy / jnp.where(empty, 1.0, s) - y - h0 * 0.5)
        nx = jnp.clip(x + dx.astype(jnp.int32), 0, w_img - w0)
        ny = jnp.clip(y + dy.astype(jnp.int32), 0, h_img - h0)
        shift2 = ((nx - x) ** 2 + (ny - y) ** 2).astype(jnp.float32)
        stop = empty | (shift2 < eps2)
        # reference returns the loop index at which it broke (the break
        # fires BEFORE ++i), so a stopping iteration does not count
        return (
            jnp.where(stop, i, i + 1),
            jnp.where(empty, x, nx),
            jnp.where(empty, y, ny),
            stop,
        )

    i, x, y, _ = lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(x0), jnp.int32(y0),
                     jnp.array(False))
    )
    return i, (x, y, jnp.int32(w0), jnp.int32(h0))


def cam_shift(prob, window, max_iter=100, eps=1.0):
    """cv::CamShift (camshift.cpp:110): meanShift, then orientation and
    size from second-order central moments of the (TOLERANCE-expanded)
    converged window. Returns ((cx, cy), (width, length), angle_deg),
    next_window — the reference's RotatedRect plus the follow-up search
    window."""
    TOLERANCE = 10
    h_img, w_img = prob.shape
    _, (x, y, w, h) = mean_shift(prob, window, max_iter, eps)

    # expand by TOLERANCE with the reference's clamp order
    x = jnp.maximum(x - TOLERANCE, 0)
    y = jnp.maximum(y - TOLERANCE, 0)
    w = jnp.minimum(w + 2 * TOLERANCE, w_img - x)
    h = jnp.minimum(h + 2 * TOLERANCE, h_img - y)

    ii = _moment_integrals(prob, order2=True)
    s, sx, sy, sxx, syy, sxy = _window_sums(ii, x, y, w, h)
    inv = 1.0 / jnp.maximum(s, 1e-12)
    xc = sx * inv  # global coords (translation-invariant central moments)
    yc = sy * inv
    mu20 = (sxx - sx * sx * inv) * inv
    mu02 = (syy - sy * sy * inv) * inv
    mu11 = (sxy - sx * sy * inv) * inv

    square = jnp.sqrt(4 * mu11 ** 2 + (mu20 - mu02) ** 2)
    theta = jnp.arctan2(2 * mu11, mu20 - mu02 + square)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    rot_a = jnp.maximum(cs * cs * mu20 + 2 * cs * sn * mu11 + sn * sn * mu02, 0.0)
    rot_c = jnp.maximum(sn * sn * mu20 - 2 * cs * sn * mu11 + cs * cs * mu02, 0.0)
    length = jnp.sqrt(rot_a) * 4
    width = jnp.sqrt(rot_c) * 4
    swap = length < width
    length, width = (
        jnp.where(swap, width, length),
        jnp.where(swap, length, width),
    )
    cs, sn = jnp.where(swap, sn, cs), jnp.where(swap, cs, sn)
    theta = jnp.where(swap, jnp.pi * 0.5 - theta, theta)

    xci = jnp.round(xc).astype(jnp.int32)
    yci = jnp.round(yc).astype(jnp.int32)
    t0 = jnp.maximum(
        jnp.round(jnp.abs(length * cs)), jnp.round(jnp.abs(width * sn))
    ).astype(jnp.int32) + 2
    nw = jnp.minimum(t0, (w_img - xci) * 2)
    t0 = jnp.maximum(
        jnp.round(jnp.abs(length * sn)), jnp.round(jnp.abs(width * cs))
    ).astype(jnp.int32) + 2
    nh = jnp.minimum(t0, (h_img - yci) * 2)
    nx = jnp.maximum(0, xci - nw // 2)
    ny = jnp.maximum(0, yci - nh // 2)
    nw = jnp.minimum(w_img - nx, nw)
    nh = jnp.minimum(h_img - ny, nh)

    angle = jnp.rad2deg(jnp.pi * 0.5 + theta)
    angle = jnp.mod(jnp.mod(angle, 360.0) + 360.0, 360.0)
    angle = jnp.where(angle >= 180.0, angle - 180.0, angle)
    center = (nx + nw * 0.5, ny + nh * 0.5)
    return (center, (width, length), angle), (nx, ny, nw, nh)


def track_window_sequence(frames_channels, hist, ranges, window,
                          max_iter=100, eps=1.0):
    """Convenience: back-project + CamShift over a frame sequence (the
    classic camshiftdemo loop). frames_channels: list per frame of
    channel lists. Returns list of (box, window) per frame."""
    out = []
    for chs in frames_channels:
        prob = calc_back_project(chs, hist, ranges)
        box, window = cam_shift(prob, window, max_iter, eps)
        window = tuple(int(v) for v in jax.device_get(window))
        out.append((box, window))
    return out
