"""Pallas TPU kernel: streaming 2-NN Hamming matching.

Why a kernel: the XLA matcher (ops/matching.py) materializes the full
[Nq, Nt] distance matrix in HBM before top-k. Against a large landmark
map (Nt ~ 10^5..10^6) that matrix is GBs of HBM traffic. This kernel
streams train tiles through VMEM and keeps only a running top-2 per
query — the distance matrix never exists. It is the TPU analog of the
reference's shared-memory-cached CUDA matcher
(cudafeatures2d/src/cuda/bf_knnmatch.cu:377-1252: query block cached in
smem, train streamed, warp-reduced best/second-best) with the MXU doing
the distance arithmetic as a ±1 matmul.

Grid: (q_tiles, t_tiles), t innermost; VMEM scratch carries (d1, d2, i1)
across the t sweep ("arbitrary" dimension semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DESC_BITS = 256
BIG = float(2 * DESC_BITS)  # python scalar: jnp constants cannot be captured by kernels


def _knn2_kernel(q_ref, t_ref, d1_ref, d2_ref, i1_ref, t_tile: int):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        d1_ref[:] = jnp.full_like(d1_ref, BIG)
        d2_ref[:] = jnp.full_like(d2_ref, BIG)
        i1_ref[:] = jnp.zeros_like(i1_ref)

    q = q_ref[:]  # [TQ, D] bf16 (+/-1, plus validity column)
    t = t_ref[:]  # [TT, D] bf16
    dot = jax.lax.dot_general(
        q, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, TT]
    dist = (DESC_BITS - dot) * 0.5

    # local top-2 within this tile
    l1 = jnp.min(dist, axis=1, keepdims=True)  # [TQ,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    is_min = dist == l1
    # first column achieving the min
    l1_idx = jnp.min(jnp.where(is_min, cols, dist.shape[1]), axis=1, keepdims=True)
    masked = jnp.where(cols == l1_idx, BIG, dist)
    l2 = jnp.min(masked, axis=1, keepdims=True)
    l1_gidx = (l1_idx + ti * t_tile).astype(jnp.int32)

    # merge (l1, l2) into running (d1, d2, i1)
    d1 = d1_ref[:]  # [TQ,1]
    d2 = d2_ref[:]
    i1 = i1_ref[:]
    better1 = l1 < d1
    new_d1 = jnp.where(better1, l1, d1)
    new_i1 = jnp.where(better1, l1_gidx, i1)
    # invariant d1 <= d2: if the tile's best displaces d1, the new second
    # is min(old d1, tile second); otherwise min(old d2, tile best)
    new_d2 = jnp.where(
        better1, jnp.minimum(d1, l2), jnp.minimum(d2, jnp.minimum(l1, l2))
    )
    d1_ref[:] = new_d1
    d2_ref[:] = new_d2
    i1_ref[:] = new_i1


def knn2_hamming(
    q_signed: jnp.ndarray,
    t_signed: jnp.ndarray,
    q_tile: int = 256,
    t_tile: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming 2-NN: returns (d1 [Nq], d2 [Nq], i1 [Nq]).

    q_signed/t_signed: ±1 bf16 [N, 256] (see matching.signed_descriptors);
    rows of padding/invalid entries should be all +1 with the caller
    masking afterwards. Nq, Nt must divide by the tile sizes (pad first).
    """
    nq, dim = q_signed.shape
    nt = t_signed.shape[0]
    assert t_signed.shape[1] == dim and dim % 128 == 0
    assert nq % q_tile == 0 and nt % t_tile == 0, (nq, nt)
    grid = (nq // q_tile, nt // t_tile)

    kernel = functools.partial(_knn2_kernel, t_tile=t_tile)
    d1, d2, i1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, dim), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_tile, dim), lambda qi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda qi, ti: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_signed, t_signed)
    return d1[:, 0], d2[:, 0], i1[:, 0]


def knn_match_streaming(
    query_desc: jnp.ndarray,
    train_desc: jnp.ndarray,
    query_valid: jnp.ndarray | None = None,
    train_valid: jnp.ndarray | None = None,
    ratio: float = 0.8,
    max_distance: float = 256.0,
    interpret: bool = False,
):
    """Drop-in ratio-test matcher on packed uint32 descriptors using the
    streaming kernel (no cross-check — map-scale matching uses ratio +
    geometric verification instead). Returns a core.types.Matches."""
    from opencv_tpu.core.types import Matches
    from opencv_tpu.ops.matching import signed_descriptors

    nq = query_desc.shape[0]
    nt = train_desc.shape[0]
    q_tile = 256 if nq % 256 == 0 else _best_tile(nq)
    t_tile = 512 if nt % 512 == 0 else _best_tile(nt)
    q = signed_descriptors(query_desc)
    t = signed_descriptors(train_desc)
    # exact invalid-row masking folded into the matmul: one extra feature
    # column where queries carry +1 and invalid train rows carry -2048,
    # pushing their distance beyond any real Hamming value (the remaining
    # pad columns keep the feature dim a lane multiple).
    pad = jnp.zeros((nq, 128), jnp.bfloat16).at[:, 0].set(1.0)
    q = jnp.concatenate([q, pad], axis=1)
    if train_valid is not None:
        pen = jnp.where(train_valid, 0.0, -2048.0).astype(jnp.bfloat16)
    else:
        pen = jnp.zeros((nt,), jnp.bfloat16)
    tpad = jnp.zeros((nt, 128), jnp.bfloat16).at[:, 0].set(pen)
    t = jnp.concatenate([t, tpad], axis=1)
    d1, d2, i1 = knn2_hamming(q, t, q_tile, t_tile, interpret=interpret)
    ok = (d1 <= max_distance) & (d1 < ratio * d2)
    if train_valid is not None:
        ok &= train_valid[i1]
    if query_valid is not None:
        ok &= query_valid
    return Matches(
        query_idx=jnp.arange(nq, dtype=jnp.int32),
        train_idx=i1,
        distance=d1,
        valid=ok,
    )


def _best_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return 1
