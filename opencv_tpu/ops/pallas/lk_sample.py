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

Status: numerics validated in interpret mode AND on-chip vs the XLA
sampler (tests/test_pallas_lk_sample.py); not yet wired into ops/lk.py
— the round-5 item is the in-kernel Newton iteration that would amortize
the tile residency across all ~30 iterations of a level.
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
            pl.BlockSpec(memory_space=pltpu.ANY),
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
