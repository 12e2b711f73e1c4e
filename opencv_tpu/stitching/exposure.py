"""Exposure compensation + timelapser for the panorama pipeline.

Reference: modules/stitching/src/exposure_compensate.cpp:1
(GainCompensator::singleFeed least-squares at :85-182 with alpha=0.01,
beta=100; BlocksGainCompensator per-block gains + smoothing at :300+),
modules/stitching/src/timelapsers.cpp:1.

TPU-first shape: the repo's stitcher warps every image onto the shared
canvas (stitching/global_stitch.py), so pairwise overlap statistics are
masked reductions over aligned tensors — no per-pair ROI arithmetic.
The block compensator builds its per-block N/I matrices with one
block-sum pooling (reshape-sum) and solves ALL blocks' small systems in
one batched jnp.linalg.solve — the reference loops blocks serially.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_ALPHA = 0.01
_BETA = 100.0
# the reference measures per-pixel sqrt(r^2+g^2+b^2) (exposure_
# compensate.cpp:131) — on a gray triplet that is gray*sqrt(3). The
# alpha*I^2 / beta balance depends on that absolute scale, so gray
# inputs here are scaled identically for behavior parity.
_RGB_NORM = 3.0 ** 0.5


def _solve_gains(Nmat, Imat, skip):
    """The reference's gain normal equations (exposure_compensate.cpp:
    141-166), batched over leading dims. Nmat/Imat: [..., n, n];
    skip: [..., n] images with no overlap (gain forced to 1)."""
    n = Nmat.shape[-1]
    keep = ~skip
    kf = keep.astype(jnp.float32)
    pair = kf[..., :, None] * kf[..., None, :]
    Nk = Nmat * pair
    off = 1.0 - jnp.eye(n)
    b = _BETA * jnp.sum(Nk, axis=-1)
    diag = (
        _BETA * jnp.sum(Nk, axis=-1)
        + 2.0 * _ALPHA * jnp.sum(off * Imat**2 * Nk, axis=-1)
    )
    A = (
        -2.0 * _ALPHA * Imat * jnp.swapaxes(Imat, -1, -2) * Nk * off
        + diag[..., :, None] * jnp.eye(n)
    )
    # skipped images: identity row -> gain 1
    eye = jnp.eye(n)
    A = jnp.where(keep[..., :, None] & keep[..., None, :], A, eye)
    b = jnp.where(keep, b, 1.0)
    gains = jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.where(keep, gains, 1.0)


def _pair_stats(stack, masks):
    """N (overlap counts) and I (mean overlap intensity of image i
    against each j) from canvas-aligned images/masks: [n, H, W]."""
    mf = masks.astype(jnp.float32)
    inter = jnp.einsum("ihw,jhw->ij", mf, mf)  # pixel counts (incl. i==i)
    Nmat = jnp.maximum(inter, 1.0)
    Isum = jnp.einsum("ihw,ihw,jhw->ij", stack * _RGB_NORM, mf, mf)
    Imat = Isum / Nmat
    off = ~jnp.eye(masks.shape[0], dtype=bool)
    has_overlap = jnp.any((inter > 0) & off, axis=1)
    return Nmat, Imat, ~has_overlap


def gain_compensate(images, masks):
    """GainCompensator: one multiplicative gain per image minimizing
    overlap intensity mismatch. images/masks: lists of [H, W] canvas
    tensors. Returns (compensated images list, gains [n])."""
    stack = jnp.stack([jnp.asarray(im, jnp.float32) for im in images])
    mstack = jnp.stack([jnp.asarray(m, bool) for m in masks])
    Nmat, Imat, skip = _pair_stats(stack, mstack)
    gains = _solve_gains(Nmat, Imat, skip)
    out = [im * gains[i] for i, im in enumerate(stack)]
    return out, gains


def block_gain_compensate(images, masks, block=32, smooth_sigma=1.0):
    """BlocksGainCompensator: per-block gains solved jointly across
    images (batched over blocks), then smoothed and bilinearly upsampled
    to a per-pixel gain map. Returns (compensated images, gain maps)."""
    from opencv_tpu.core import imgproc

    stack = jnp.stack([jnp.asarray(im, jnp.float32) for im in images])
    mstack = jnp.stack([jnp.asarray(m, bool) for m in masks])
    n, h, w = stack.shape
    hb = -(-h // block)
    wb = -(-w // block)
    ph, pw = hb * block, wb * block
    spad = jnp.pad(stack, ((0, 0), (0, ph - h), (0, pw - w)))
    mpad = jnp.pad(mstack, ((0, 0), (0, ph - h), (0, pw - w)))

    # block sums: [n, hb, wb]
    def blocksum(x):
        return x.reshape(n, hb, block, wb, block).sum(axis=(2, 4))

    mf = mpad.astype(jnp.float32)
    cnt = blocksum(mf)
    ssum = blocksum(spad * mf)

    # per block: N_ij = count of joint presence approximated at block
    # granularity (min of the two block counts — the aligned-canvas
    # analog of the reference's per-block intersect), I_ij = block mean
    cb = cnt.reshape(n, -1).T  # [B, n]
    sb = ssum.reshape(n, -1).T  # [B, n]
    inter = jnp.minimum(cb[:, :, None], cb[:, None, :])  # [B, n, n]
    Nmat = jnp.maximum(inter, 1.0)
    mean_i = sb * _RGB_NORM / jnp.maximum(cb, 1.0)  # [B, n]
    Imat = jnp.broadcast_to(mean_i[:, :, None], inter.shape)
    present = cb > 0
    off = ~jnp.eye(n, dtype=bool)
    overlap = (inter > 0) & off[None]
    skip = ~(present & jnp.any(overlap, axis=2))

    gains_b = _solve_gains(Nmat, Imat, skip)  # [B, n]
    gmap = gains_b.T.reshape(n, hb, wb)

    # smooth the coarse gain grid, then bilinear-upsample to the canvas
    # (the reference gaussian-blurs the upsampled map)
    if smooth_sigma > 0:
        gmap = jnp.stack(
            [imgproc.gaussian_blur(g, 3, smooth_sigma) for g in gmap]
        )
    import jax

    gfull = jax.image.resize(gmap, (n, ph, pw), method="bilinear")[:, :h, :w]
    out = [stack[i] * gfull[i] for i in range(n)]
    return out, gfull


def timelapse(images, masks, crop=False):
    """Timelapser (timelapsers.cpp:1): one output canvas per input frame
    with just that warped frame placed (AS_IS), optionally cropped to
    the union bounding box (the CROP variant)."""
    mstack = np.stack([np.asarray(m, bool) for m in masks])
    union = mstack.any(axis=0)
    ys, xs = np.where(union)
    if crop and len(ys):
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
    else:
        y0, y1, x0, x1 = 0, union.shape[0], 0, union.shape[1]
    out = []
    for im, m in zip(images, masks):
        frame = np.where(np.asarray(m, bool), np.asarray(im), 0.0)
        out.append(frame[y0:y1, x0:x1])
    return out
