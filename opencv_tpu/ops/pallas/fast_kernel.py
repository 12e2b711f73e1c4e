"""Pallas TPU kernel: fused FAST corner score.

The XLA formulation (ops/fast.py) materializes 16 shifted copies of the
image plus a shift-min tree — ~40 HBM passes. This kernel strip-mines
the image through VMEM with a 3-row halo: each grid step DMAs one strip,
computes every circle tap as an in-VMEM slice/lane-roll, runs the
min-tree in registers, and writes one score strip — 2 HBM passes total.

This is the stencil analog of the one-thread-per-pixel CUDA kernel
(cudafeatures2d/src/cuda/fast.cu:219 calcKeypoints) with the LUT bit
trick replaced by the arc max-min formulation (see ops/fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencv_tpu.ops.fast import CIRCLE16

_NEG = -1e9


def _window_min(arrs: list, n: int, _memo=None) -> list:
    """out[i] = min(arrs[i], ..., arrs[(i+n-1) % 16]) — circular window
    minima over the 16 ring arrays via the doubling identity
    w(a+b)[i] = min(w(a)[i], w(b)[i+a])."""
    if _memo is None:
        _memo = {}
    if n in _memo:
        return _memo[n]
    if n == 1:
        out = list(arrs)
    else:
        half = 1 << (n.bit_length() - 1)
        if half == n:
            prev = _window_min(arrs, n // 2, _memo)
            out = [jnp.minimum(prev[i], prev[(i + n // 2) % 16]) for i in range(16)]
        else:
            a = _window_min(arrs, half, _memo)
            b = _window_min(arrs, n - half, _memo)
            out = [jnp.minimum(a[i], b[(i + half) % 16]) for i in range(16)]
    _memo[n] = out
    return out


def _fast_strip_kernel(img_ref, out_ref, buf, sem, *, th: int, arc: int,
                       spi: int):
    i = pl.program_id(0)
    # grid runs images-major: image b = i // spi, strip s = i % spi.
    # strip s covers rows [s*th, s*th+th) of image b's output; each
    # image's input block is padded by 4 rows on each side (Mosaic DMA
    # slices must be 8-row aligned, so the halo is 4 even though the
    # stencil only needs 3), hence the b*8 offset between images
    b = i // spi
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * th + b * 8, th + 8), :], buf, sem
    )
    dma.start()
    dma.wait()
    center = buf[4 : 4 + th, :]
    width = buf.shape[1]

    def taps(sign):
        out = []
        for (dx, dy) in CIRCLE16:
            rows = buf[4 + dy : 4 + dy + th, :]
            # pltpu.roll wants non-negative shifts; (-dx) mod width is
            # the same circular move (wrap lands in the masked border)
            tap = pltpu.roll(rows, (-dx) % width, axis=1) if dx != 0 else rows
            out.append(sign * (tap - center))
        return out

    def arc_score(arrs):
        mins = _window_min(arrs, arc)
        out = mins[0]
        for a in mins[1:]:
            out = jnp.maximum(out, a)
        return out

    # bright then dark sequentially: keeps the peak number of live
    # [th, W] temporaries (and thus the Mosaic VMEM stack) halved
    vb = arc_score(taps(1.0))
    vd = arc_score(taps(-1.0))
    out_ref[:] = jnp.maximum(vb, vd)


def _fast_nms_strip_kernel(img_ref, score_ref, nms_ref, buf, sem, *, th: int,
                           arc: int, threshold: float, h: int, w: int,
                           spi: int):
    """Like _fast_strip_kernel but also emits the corner-thresholded,
    3x3-NMS'd score (the full FAST detection stencil in one pass). Needs
    score on th+2 rows, so the circle taps span dy in [-4, 4] — exactly
    the 4-row halo. Images-major grid like _fast_strip_kernel."""
    i = pl.program_id(0)
    b = i // spi
    s = i - b * spi
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * th + b * 8, th + 8), :], buf, sem
    )
    dma.start()
    dma.wait()
    the = th + 2  # extended row count (one NMS halo row each side)
    center = buf[3 : 3 + the, :]
    width = buf.shape[1]

    def taps(sign):
        out = []
        for (dx, dy) in CIRCLE16:
            rows = buf[3 + dy : 3 + dy + the, :]
            tap = pltpu.roll(rows, (-dx) % width, axis=1) if dx != 0 else rows
            out.append(sign * (tap - center))
        return out

    def arc_score(arrs):
        mins = _window_min(arrs, arc)
        out = mins[0]
        for a in mins[1:]:
            out = jnp.maximum(out, a)
        return out

    s_ext = jnp.maximum(arc_score(taps(1.0)), arc_score(taps(-1.0)))  # [th+2, W]
    score_ref[:] = s_ext[1:-1, :]
    # invalidate the global 3-px border BEFORE NMS: border rows/cols carry
    # garbage scores (zero padding / lane wrap) that must never suppress a
    # valid neighbour (the XLA path applies the same mask)
    grow = (
        jax.lax.broadcasted_iota(jnp.int32, s_ext.shape, 0) + s * th - 1
    )
    gcol = jax.lax.broadcasted_iota(jnp.int32, s_ext.shape, 1)
    valid = (grow >= 3) & (grow < h - 3) & (gcol >= 3) & (gcol < w - 3)
    masked = jnp.where(valid & (s_ext > threshold), s_ext, jnp.float32(_NEG))
    cur = masked[1:-1, :]
    keep = cur > jnp.float32(_NEG)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = masked[1 + dy : 1 + dy + th, :]
            if dx != 0:
                nb = pltpu.roll(nb, (-dx) % width, axis=1)
            # tie-break toward the earlier (top-left) pixel, matching
            # imgproc.nms_2d
            keep = keep & ((cur > nb) if (dy, dx) < (0, 0) else (cur >= nb))
    nms_ref[:] = jnp.where(keep, cur, jnp.float32(_NEG))


def _stack_padded(imgs: jnp.ndarray, strip: int):
    """[B,h,w] -> one tall [B*(hp+8), wp] array: each image's block is
    4-row zero-padded top+bottom (the DMA halo), images stacked
    vertically so a batch is just more independent strips in the SAME
    kernel grid (images-major). The cross-image halo reads land in the
    zero padding, exactly like the single-image borders."""
    bsz, h, w = imgs.shape
    wp = ((w + 127) // 128) * 128
    hp = ((h + strip - 1) // strip) * strip
    padded = jnp.zeros((bsz, hp + 8, wp), jnp.float32)
    padded = jax.lax.dynamic_update_slice(
        padded, imgs.astype(jnp.float32), (0, 4, 0)
    )
    return padded.reshape(bsz * (hp + 8), wp), hp, wp


def _inside_mask(bsz, h, w):
    yy = jax.lax.broadcasted_iota(jnp.int32, (bsz, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (bsz, h, w), 2)
    return (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)


def _corners_batched(imgs, threshold, arc_length, strip, interpret):
    bsz, h, w = imgs.shape
    stacked, hp, wp = _stack_padded(imgs, strip)
    spi = hp // strip
    kernel = functools.partial(
        _fast_nms_strip_kernel, th=strip, arc=arc_length,
        threshold=float(threshold), h=h, w=w, spi=spi,
    )
    score, nms = pl.pallas_call(
        kernel,
        grid=(bsz * spi,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((strip, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((strip, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz * hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz * hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((strip + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(stacked)
    inside = _inside_mask(bsz, h, w)
    neg = jnp.float32(_NEG)
    score = jnp.where(inside, score.reshape(bsz, hp, wp)[:, :h, :w], neg)
    nms = jnp.where(inside, nms.reshape(bsz, hp, wp)[:, :h, :w], neg)
    return score, nms


def _score_batched(imgs, arc_length, strip, interpret):
    bsz, h, w = imgs.shape
    stacked, hp, wp = _stack_padded(imgs, strip)
    spi = hp // strip
    kernel = functools.partial(
        _fast_strip_kernel, th=strip, arc=arc_length, spi=spi
    )
    score = pl.pallas_call(
        kernel,
        grid=(bsz * spi,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (strip, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((strip + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(stacked)
    inside = _inside_mask(bsz, h, w)
    return jnp.where(
        inside, score.reshape(bsz, hp, wp)[:, :h, :w], jnp.float32(_NEG)
    )


def fast_corners_pallas(
    img: jnp.ndarray, threshold: float, arc_length: int = 9,
    strip: int = 16, interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused FAST detection: returns (score, nms_score) where nms_score
    is > -1e8 exactly at thresholded NMS survivors. One kernel pass.

    vmap-able (one level): the batching rule folds the batch into the
    strip grid (strips are independent), avoiding the generic pallas
    batcher which cannot lower ANY-memory-space operands."""

    @jax.custom_batching.custom_vmap
    def _call(im):
        s, n = _corners_batched(
            im[None], threshold, arc_length, strip, interpret
        )
        return s[0], n[0]

    @_call.def_vmap
    def _rule(axis_size, in_batched, ims):  # noqa: ANN001
        out = _corners_batched(ims, threshold, arc_length, strip, interpret)
        return out, (True, True)

    return _call(img)


def fast_score_pallas(
    img: jnp.ndarray, arc_length: int = 9, strip: int = 16, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for ops.fast.fast_score on TPU (border/padding handled
    here; column wrap-around from the lane roll lands in the 3-px border
    that is invalidated anyway). vmap-able, like fast_corners_pallas."""

    @jax.custom_batching.custom_vmap
    def _call(im):
        return _score_batched(im[None], arc_length, strip, interpret)[0]

    @_call.def_vmap
    def _rule(axis_size, in_batched, ims):  # noqa: ANN001
        return (
            _score_batched(ims, arc_length, strip, interpret),
            True,
        )

    return _call(img)
