"""Brute-force binary descriptor matching on the MXU.

The reference matches descriptors with popcount kernels: CPU
`batchDistance` (core/src/batch_distance.cpp) driven by
`BFMatcher::knnMatchImpl` (features2d/src/matchers.cpp:749-886), and CUDA
warp-reduction kernels with shared-memory query caching
(cudafeatures2d/src/cuda/bf_knnmatch.cu).

TPU-native design: Hamming distance between 256-bit descriptors becomes a
*matmul*. Descriptors are expanded to ±1 vectors; for a, b ∈ {−1,+1}^256,
    a·b = 256 − 2·hamming(a, b)   ⇒   hamming = (256 − a·b) / 2.
A [N,256]x[256,M] bf16 matmul runs on the 128x128 systolic array at
speed-of-light — the popcount loop becomes pure MXU work (±1 and sums
≤ 256 are exact in bf16 inputs with f32 accumulation).

Two measured lowering traps shape the implementation (v5e, 2048x8192):
 1. masking the distance matrix with `jnp.where(valid, dist, BIG)` fuses
    the mask into the dot's consumer and costs ~24 ms — the same op on a
    plain array costs 0.07 ms. Fix: fold the validity masks INTO the
    matmul as two extra ±penalty contraction dims (exact in bf16), so
    invalid rows/cols come out of the MXU already carrying +2·BIG.
 2. `lax.top_k` over the [Nq, Nt] matrix lowers to a ~24 ms TopK custom
    call. Fix: 2-NN via min/argmin passes over an
    `optimization_barrier`-materialized matrix (0.2 ms total) — the
    barrier stops XLA re-fusing the reductions back into the dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencv_tpu.core.config import MatchConfig
from opencv_tpu.core.types import Matches

DESC_BITS = 256


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """uint32 [N, 8] packed descriptors -> bool [N, 256]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (desc[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], -1).astype(bool)


def signed_descriptors(desc: jnp.ndarray) -> jnp.ndarray:
    """uint32 [N, 8] -> ±1 bf16 [N, 256] (MXU operand form)."""
    bits = unpack_bits(desc)
    return jnp.where(bits, 1.0, -1.0).astype(jnp.bfloat16)


def hamming_matrix(
    query: jnp.ndarray, train: jnp.ndarray,
    query_valid: jnp.ndarray | None = None,
    train_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pairwise Hamming distances f32 [Nq, Nt] via the ±1 matmul identity.

    Invalid rows/cols get distance BIG (=2*DESC_BITS) so they never win a
    top-k — the mask analog of the reference's match masks
    (matchers.cpp:749 `knnMatchImpl` masks).
    """
    q = signed_descriptors(query)
    t = signed_descriptors(train)
    bits = q.shape[-1]  # 256 for ORB/BRIEF, 512 BRISK, 486 AKAZE MLDB...
    dot = jnp.dot(q, t.T, preferred_element_type=jnp.float32)
    # barrier: without it the where-masks below fuse into the dot's
    # consumer and the whole thing runs ~300x slower (module docstring)
    dist = jax.lax.optimization_barrier((bits - dot) * 0.5)
    big = jnp.float32(2 * bits)
    if query_valid is not None:
        dist = jnp.where(query_valid[:, None], dist, big)
    if train_valid is not None:
        dist = jnp.where(train_valid[None, :], dist, big)
    return dist


def knn_match(
    query: jnp.ndarray, train: jnp.ndarray,
    query_valid: jnp.ndarray | None = None,
    train_valid: jnp.ndarray | None = None,
    config: MatchConfig = MatchConfig(),
) -> Matches:
    """2-NN match + Lowe ratio test + optional cross-check.

    Analog of BFMatcher::knnMatch(k=2) followed by the standard ratio
    filter (the reference's stitching matcher uses the same recipe,
    stitching/src/matchers.cpp `BestOf2NearestMatcher`), with cross-check
    as in BFMatcher(crossCheck=true) (features2d/src/matchers.cpp:521).
    Returns one row per query descriptor.

    Implementation: validity masks are folded into the Hamming matmul as
    two extra ±penalty contraction dims and the 2-NN comes from
    min/argmin passes over a barrier-materialized distance matrix — the
    naive where-mask + lax.top_k formulation is ~160x slower on TPU (see
    module docstring for the measured lowering traps).
    """
    nq = query.shape[0]
    sq = signed_descriptors(query)
    st = signed_descriptors(train)
    bits = sq.shape[-1]
    big = float(4 * bits)  # exact in bf16 (power-of-two scale)
    q_cols = [sq]
    t_cols = [st]
    if query_valid is not None:
        # dist[i, :] += 2*big for invalid queries
        q_cols.append(
            jnp.where(query_valid, 0.0, -big).astype(jnp.bfloat16)[:, None]
        )
        t_cols.append(jnp.ones((train.shape[0], 1), jnp.bfloat16))
    if train_valid is not None:
        # dist[:, j] += 2*big for invalid train entries
        q_cols.append(jnp.ones((nq, 1), jnp.bfloat16))
        t_cols.append(
            jnp.where(train_valid, 0.0, -big).astype(jnp.bfloat16)[:, None]
        )
    qx = jnp.concatenate(q_cols, axis=1) if len(q_cols) > 1 else sq
    tx = jnp.concatenate(t_cols, axis=1) if len(t_cols) > 1 else st
    dot = jnp.dot(qx, tx.T, preferred_element_type=jnp.float32)
    dist = jax.lax.optimization_barrier((bits - dot) * 0.5)  # [Nq, Nt]

    best = jnp.argmin(dist, axis=1).astype(jnp.int32)
    d1 = jnp.min(dist, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d2 = jnp.min(jnp.where(col == best[:, None], jnp.inf, dist), axis=1)

    ok = d1 <= config.max_distance
    ok &= d1 < config.ratio * d2
    if query_valid is not None:
        ok &= query_valid
    if config.cross_check:
        # train j's best query must be this query
        best_q_for_t = jnp.argmin(dist, axis=0)  # [Nt]
        ok &= best_q_for_t[best] == jnp.arange(nq)
    return Matches(
        query_idx=jnp.arange(nq, dtype=jnp.int32),
        train_idx=best,
        distance=d1,
        valid=ok,
    )


def radius_match_mask(
    query: jnp.ndarray, train: jnp.ndarray, max_distance: float,
    query_valid: jnp.ndarray | None = None,
    train_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Boolean [Nq, Nt]: pairs within `max_distance` Hamming (analog of
    DescriptorMatcher::radiusMatch, matchers.cpp:900). Callers reduce the
    mask themselves — on TPU the full matrix is cheaper than compaction."""
    return hamming_matrix(query, train, query_valid, train_valid) <= max_distance


# Map-scale matching: beyond this many train descriptors the dense
# [Nq, Nt] distance matrix (4·Nq·Nt bytes of HBM) costs more to stream
# back out of HBM than recomputing tiles in VMEM — switch to the Pallas
# streaming 2-NN kernel (ops/pallas/knn.py), the TPU analog of the
# reference's smem-cached CUDA matcher (cuda/bf_knnmatch.cu:377).
STREAMING_TRAIN_THRESHOLD = 16384


def knn_match_auto(
    query: jnp.ndarray, train: jnp.ndarray,
    query_valid: jnp.ndarray | None = None,
    train_valid: jnp.ndarray | None = None,
    config: MatchConfig = MatchConfig(),
    streaming_threshold: int = STREAMING_TRAIN_THRESHOLD,
    force_streaming: bool | None = None,
    interpret: bool = False,
) -> Matches:
    """knn_match that auto-dispatches to the streaming Pallas kernel for
    large train sets on TPU.

    The streaming path drops cross-check (a second full pass over the
    map); at map scale the ratio test + downstream geometric verification
    (PnP/E RANSAC) is the outlier filter, matching how the reference's
    GPU pipelines use knnMatch(k=2) without crossCheck. Below the
    threshold, or off-TPU, behavior is exactly `knn_match(config)`.
    """
    use_streaming = (
        train.shape[0] >= streaming_threshold
        and jax.default_backend() == "tpu"
        if force_streaming is None
        else force_streaming
    )
    if not use_streaming:
        return knn_match(query, train, query_valid, train_valid, config)
    from opencv_tpu.ops.pallas import knn as pallas_knn

    return pallas_knn.knn_match_streaming(
        query, train, query_valid, train_valid,
        ratio=config.ratio, max_distance=config.max_distance,
        interpret=interpret,
    )
