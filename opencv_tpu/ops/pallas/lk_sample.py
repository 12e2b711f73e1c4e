"""Pallas TPU kernel: LK window sampling via per-point tile DMA.

The queued fix for DESIGN.md §7: the XLA banded template einsum
(`ops/lk.py _sample_windows`) loses its fast lowering 3.3x when the
image operand is scan-sliced, and its [N, win, H] weight tensors cost
~70 MB/frame of HBM traffic regardless. This kernel samples the
win x win bilinear windows directly: for each block of points it DMAs
one small ALIGNED tile around each point from HBM into VMEM (Mosaic
requires 8-row / 128-lane aligned slice starts, so the tile is anchored
at the aligned floor of the window origin and the residual offset is
resolved in-register), then forms the window with two-tap row/column
combines — per-point traffic is the tile (~40 KB), independent of image
size and immune to the scan-operand penalty (the DMA source is an
ANY-space ref, like the FAST kernel's).

Two kernels live here:

- `sample_windows_pallas` — the single-channel probe kernel (banded
  in-register matmuls, edge-clamped boundaries; callers keep points a
  half-window inside the image).
- `sample_templates_pallas` — the production kernel wired into
  ops/lk.py `_level_templates`: samples the (image, dx, dy) template
  triple in ONE tile DMA per point with double-buffered prefetch, and
  reproduces the XLA sampler's zero-outside-image convention exactly
  (per-tap row/column validity masks), so it is safe for arbitrary
  point positions. The window is formed with two dynamic lane/sublane
  rotates + four masked bilinear taps (VPU only — per-point matmuls
  would be MXU-latency-bound at these sizes).

Both are parity-tested in tests/test_pallas_lk_sample.py (interpret
mode on CPU; the same tests run on-chip when JAX_PLATFORMS is the TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 40   # window rows (<=22) + max 8-row alignment residual + taps
_TILE_W = 256  # window cols + max 128-lane alignment residual + taps


def _sample_kernel(ty_ref, tx_ref, oy_ref, ox_ref, fy_ref, fx_ref,
                   img_ref, out_ref, tile, sem, *, win: int, blk: int):
    i = pl.program_id(0)

    def per_point(k, _):
        p = i * blk + k
        # starts expressed as 8*q / 128*q so Mosaic can PROVE the
        # required slice alignment for runtime scalars
        dma = pltpu.make_async_copy(
            img_ref.at[pl.ds(ty_ref[p] * 8, _TILE_H),
                       pl.ds(tx_ref[p] * 128, _TILE_W)],
            tile, sem,
        )
        dma.start()
        dma.wait()
        fy = fy_ref[p]
        fx = fx_ref[p]
        # bilinear selection as BANDED two-tap matmuls (exactly
        # _interp_weights, built in-register at the residual offsets
        # oy in [0,8), ox in [0,128)): w = Wy @ tile @ Wx^T. No shifted
        # ref/value slices — sublane-misaligned slices of VMEM scratch
        # lower silently wrong in Mosaic (measured), matmuls always work
        def band(off, frac, dim):
            rows = jax.lax.broadcasted_iota(jnp.int32, (win, dim), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (win, dim), 1)
            lo = (cols == off + rows).astype(jnp.float32) * (1.0 - frac)
            hi = (cols == off + rows + 1).astype(jnp.float32) * frac
            return lo + hi

        wy = band(oy_ref[p], fy, _TILE_H)
        wx = band(ox_ref[p], fx, _TILE_W)
        w = jnp.dot(
            jnp.dot(wy, tile[:], preferred_element_type=jnp.float32),
            wx.T,
            preferred_element_type=jnp.float32,
        )
        out_ref[k, :, :] = w
        return 0

    jax.lax.fori_loop(0, blk, per_point, 0)


def sample_windows_pallas(
    img: jnp.ndarray,
    pts: jnp.ndarray,
    win: int = 21,
    blk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear win x win windows centered at pts [N,2] (x, y) from
    img [H, W] f32 — the Pallas analog of ops/lk.py `_sample_at` with
    edge-clamped (NOT zeroed) out-of-range rows; callers keep points
    >= half a window inside the image for exact parity with the XLA
    sampler's zero-padding convention."""
    h, w = img.shape
    n = pts.shape[0]
    assert n % blk == 0, "point count must be a multiple of blk"
    half = win // 2
    start_y = pts[:, 1] - half
    start_x = pts[:, 0] - half
    iy = jnp.floor(start_y)
    ix = jnp.floor(start_x)
    fy = (start_y - iy).astype(jnp.float32)
    fx = (start_x - ix).astype(jnp.float32)
    # pad so every aligned tile is in range; image origin sits at (8, 128)
    pad_img = jnp.pad(img.astype(jnp.float32),
                      ((8, _TILE_H), (128, _TILE_W)), mode="edge")
    gy = iy.astype(jnp.int32) + 8     # window origin in padded coords
    gx = ix.astype(jnp.int32) + 128
    ty = gy // 8                      # aligned tile anchor / 8
    tx = gx // 128                    # aligned tile anchor / 128
    oy = gy - ty * 8                  # residual offset in [0, 8)
    ox = gx - tx * 128                # residual offset in [0, 128)

    grid = (n // blk,)
    kernel = functools.partial(_sample_kernel, win=win, blk=blk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (blk, win, win), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, win, win), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TILE_H, _TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ty, tx, oy, ox, fy, fx, pad_img)
    return out


# ---------------------------------------------------------------------------
# Production sampling kernel: C channels, zero-convention-exact, prefetched.
# Serves three ops/lk.py call sites: the template triple (C=3, win=21),
# the final polish sample (C=1, win=21) and integer patch extraction
# (C=1, win=_PATCH=48, frac=0) — each was a dense full-image einsum that
# pays the scan-operand penalty in clip pipelines.


def _tile_dims(win: int) -> tuple[int, int]:
    """Tile for window `win`: rows = 8-row alignment residual (<=7) +
    win + 1 hi tap, rounded to the 8-sublane grid; cols likewise on the
    128-lane grid."""
    th = -(-(win + 8) // 8) * 8
    tw = -(-(win + 128) // 128) * 128
    return th, tw


def _tmpl_kernel(ty_ref, tx_ref, oy_ref, ox_ref, fy_ref, fx_ref,
                 iy0_ref, ix0_ref, img_ref, out_ref, tiles, sems,
                 *, win: int, blk: int, n: int, h: int, w: int,
                 th: int, tw: int):
    """Per grid step: blk points. The tile DMA for point p+1 is issued
    before waiting on point p's (two slots, global parity — blk is even
    so the parity carries across grid steps and the scratch persists:
    the TPU grid is a sequential loop on one core)."""
    i = pl.program_id(0)

    def dma_for(p, slot):
        return pltpu.make_async_copy(
            img_ref.at[:, pl.ds(ty_ref[p] * 8, th),
                       pl.ds(tx_ref[p] * 128, tw)],
            tiles.at[slot], sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma_for(0, 0).start()

    def per_point(k, _):
        p = i * blk + k

        @pl.when(p + 1 < n)
        def _():
            dma_for(p + 1, (p + 1) % 2).start()

        dma_for(p, p % 2).wait()
        tile = tiles[p % 2]  # [C, th, tw] f32

        # window origin inside the tile is (oy, ox) (alignment residual,
        # in [0,8) x [0,128) for in-range points); rotate it to (0, 0).
        # pltpu.roll matches jnp.roll (result[i] = x[i - s]) and demands
        # non-negative shifts, so a left-shift by k is a roll by n - k.
        r0 = pltpu.roll(tile, jnp.remainder(-oy_ref[p], th), axis=1)
        r0 = pltpu.roll(r0, jnp.remainder(-ox_ref[p], tw), axis=2)
        # the +1-row / +1-col taps as further STATIC rotates: slices of
        # the rotated values below all start at 0, so no sublane-offset
        # relayouts are involved (see sample_windows_pallas's note)
        ry = pltpu.roll(r0, th - 1, axis=1)
        rx = pltpu.roll(r0, tw - 1, axis=2)
        ryx = pltpu.roll(ry, tw - 1, axis=2)
        t00 = r0[:, :win, :win]
        t01 = rx[:, :win, :win]
        t10 = ry[:, :win, :win]
        t11 = ryx[:, :win, :win]

        # per-tap validity (the XLA _interp_weights zero convention:
        # a tap contributes iff its true image row/col is in range)
        rr = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
        row_lo = iy0_ref[p] + rr
        col_lo = ix0_ref[p] + cc
        vr_lo = (row_lo >= 0) & (row_lo <= h - 1)
        vr_hi = (row_lo + 1 >= 0) & (row_lo + 1 <= h - 1)
        vc_lo = (col_lo >= 0) & (col_lo <= w - 1)
        vc_hi = (col_lo + 1 >= 0) & (col_lo + 1 <= w - 1)
        fy = fy_ref[p]
        fx = fx_ref[p]
        m00 = jnp.where(vr_lo & vc_lo, (1.0 - fy) * (1.0 - fx), 0.0)
        m01 = jnp.where(vr_lo & vc_hi, (1.0 - fy) * fx, 0.0)
        m10 = jnp.where(vr_hi & vc_lo, fy * (1.0 - fx), 0.0)
        m11 = jnp.where(vr_hi & vc_hi, fy * fx, 0.0)
        out_ref[:, k, :, :] = (
            t00 * m00[None] + t01 * m01[None]
            + t10 * m10[None] + t11 * m11[None]
        )
        return 0

    jax.lax.fori_loop(0, blk, per_point, 0)


def sample_channels_pallas(
    stacked: jnp.ndarray,
    pts: jnp.ndarray,
    win: int = 21,
    blk: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear win x win windows of every channel of stacked [C, H, W]
    centered at pts [N,2] (x, y) -> [C, N, win, win] f32, bit-matching
    the XLA sampler's zero-outside-image convention in f32 (any tap
    whose source pixel is outside [0,H) x [0,W) contributes zero; wholly
    out-of-range or non-finite points yield all-zero windows). One tile
    DMA per point serves all channels; immune to the scan-operand
    einsum penalty (DESIGN.md §7) because the image operand is read by
    DMA from an ANY-space ref, not consumed by an XLA einsum."""
    c, h, w = stacked.shape
    th, tw = _tile_dims(win)
    stacked = stacked.astype(jnp.float32)
    n_in = pts.shape[0]
    n = -(-n_in // blk) * blk
    half = win // 2
    start = pts.astype(jnp.float32) - jnp.float32(half)
    # non-finite points -> far outside -> fully masked zero windows
    start = jnp.where(jnp.isfinite(start), start, -1e6)
    start = jnp.clip(start, -1e6, 1e6)
    if n != n_in:
        start = jnp.pad(start, ((0, n - n_in), (0, 0)),
                        constant_values=-1e6)
    i0 = jnp.floor(start)
    frac = (start - i0).astype(jnp.float32)
    ix0 = i0[:, 0].astype(jnp.int32)
    iy0 = i0[:, 1].astype(jnp.int32)

    pad_h, pad_w = 16 + h + th, 128 + w + tw
    padded = jnp.pad(stacked, ((0, 0), (16, th), (128, tw)))
    gy = iy0 + 16
    gx = ix0 + 128
    ty = jnp.clip(gy // 8, 0, (pad_h - th) // 8)
    tx = jnp.clip(gx // 128, 0, (pad_w - tw) // 128)
    oy = gy - ty * 8    # in [0, 8) for in-range points
    ox = gx - tx * 128  # in [0, 128) for in-range points

    kernel = functools.partial(
        _tmpl_kernel, win=win, blk=blk, n=n, h=h, w=w, th=th, tw=tw
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 8
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (c, blk, win, win), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, n, win, win), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ty, tx, oy, ox, frac[:, 1], frac[:, 0], iy0, ix0, padded)
    return out[:, :n_in]


def sample_templates_pallas(
    img: jnp.ndarray,
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    pts: jnp.ndarray,
    win: int = 21,
    blk: int = 16,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The (image, dx, dy) template triple of ops/lk.py
    `_level_templates` in one kernel call (C=3)."""
    out = sample_channels_pallas(
        jnp.stack([img, dx, dy]), pts, win=win, blk=blk,
        interpret=interpret,
    )
    return out[0], out[1], out[2]


def sample_single_pallas(
    img: jnp.ndarray,
    pts: jnp.ndarray,
    win: int = 21,
    blk: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-channel windows [N, win, win] — the polish-sample /
    patch-extraction analog of ops/lk.py `_sample_at` (integer pts give
    frac = 0, i.e. an exact gather)."""
    return sample_channels_pallas(
        img[None], pts, win=win, blk=blk, interpret=interpret
    )[0]
