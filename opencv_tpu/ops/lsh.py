"""LSH index for binary descriptors — the FlannBasedMatcher/LSH analog.

Reference: flann/include/opencv2/flann/lsh_index.h + lsh_table.h:
multi-table bit-sampling LSH — each table hashes `key_bits` randomly
chosen descriptor bits to a bucket; queries probe one bucket per table
and rank the union by Hamming distance.

TPU-native design: FLANN's pointer-bucket hash tables become a dense
[tables, 2^key_bits, capacity] index tensor (bucket overflow drops the
extras, exactly like lsh_table.h's bucket limit). The query path is
fully batched: bucket ids for every query in one gather, candidate
descriptors in a second gather, Hamming distances via XOR +
`lax.population_count` on the uint32 words (no unpacking to ±1 — the
shortlist is too small to feed the MXU; the VPU popcount path wins).
Index build is one-time host work, like FLANN's build phase.

When to use: the MXU brute-force matcher (ops/matching.py, streaming
Pallas variant for big maps) is exact and already fast; LSH trades
recall for asymptotics. bench.py's map-scale benchmark measures both —
whichever wins at a given map size is a measured fact, not a guess.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core.config import MatchConfig
from opencv_tpu.core.types import Matches


class LSHIndex(NamedTuple):
    train: jnp.ndarray      # [N, W] uint32 descriptors
    buckets: jnp.ndarray    # [T, 2^k, C] i32 train indices (-1 = empty)
    bit_words: jnp.ndarray  # [T, k] i32 word index of each hashed bit
    bit_shifts: jnp.ndarray # [T, k] i32 shift of each hashed bit
    key_bits: int


def build_lsh_index(
    train: np.ndarray,
    n_tables: int = 8,
    key_bits: int = 14,
    bucket_capacity: int = 64,
    seed: int = 0,
) -> LSHIndex:
    """Build the multi-table index (LshIndex::buildIndex analog)."""
    train = np.asarray(train)
    n, w = train.shape
    bits = w * 32
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [rng.choice(bits, key_bits, replace=False) for _ in range(n_tables)]
    )  # [T, k]
    words = pos // 32
    shifts = pos % 32

    buckets = np.full((n_tables, 1 << key_bits, bucket_capacity), -1, np.int32)
    fill = np.zeros((n_tables, 1 << key_bits), np.int32)
    for t in range(n_tables):
        b = ((train[:, words[t]] >> shifts[t]) & 1).astype(np.int64)
        ids = (b << np.arange(key_bits, dtype=np.int64)).sum(1)
        for i, bid in enumerate(ids):
            c = fill[t, bid]
            if c < bucket_capacity:
                buckets[t, bid, c] = i
                fill[t, bid] = c + 1
    return LSHIndex(
        train=jnp.asarray(train.astype(np.uint32)),
        buckets=jnp.asarray(buckets),
        bit_words=jnp.asarray(words.astype(np.int32)),
        bit_shifts=jnp.asarray(shifts.astype(np.int32)),
        key_bits=key_bits,
    )


def knn_match_lsh(
    index: LSHIndex,
    query: jnp.ndarray,
    query_valid: jnp.ndarray | None = None,
    config: MatchConfig = MatchConfig(),
) -> Matches:
    """Approximate 2-NN + ratio test against the index
    (FlannBasedMatcher::knnMatch with an LSH index). Returns one row per
    query; queries whose buckets are all empty come back invalid."""
    q = query.astype(jnp.uint32)
    m = q.shape[0]
    if query_valid is None:
        query_valid = jnp.ones((m,), bool)
    bits = q.shape[1] * 32

    # bucket ids: [M, T]
    qw = q[:, index.bit_words]                      # [M, T, k] gathered words
    qb = (qw >> index.bit_shifts[None]) & jnp.uint32(1)
    weights = (jnp.uint32(1) << jnp.arange(index.key_bits, dtype=jnp.uint32))
    ids = jnp.sum(qb * weights[None, None, :], axis=-1).astype(jnp.int32)

    # candidates: [M, T*C]
    cand = index.buckets[jnp.arange(index.buckets.shape[0])[None, :], ids]
    cand = cand.reshape(m, -1)
    ok = cand >= 0
    cand_safe = jnp.maximum(cand, 0)

    # Hamming via XOR + popcount over the uint32 words
    cd = index.train[cand_safe]                     # [M, TC, W]
    x = jnp.bitwise_xor(cd, q[:, None, :])
    dist = jnp.sum(
        lax.population_count(x).astype(jnp.int32), axis=-1
    ).astype(jnp.float32)
    big = jnp.float32(2 * bits)
    dist = jnp.where(ok, dist, big)

    i1 = jnp.argmin(dist, axis=1)
    d1 = jnp.take_along_axis(dist, i1[:, None], 1)[:, 0]
    t1 = jnp.take_along_axis(cand, i1[:, None], 1)[:, 0]
    # second-best among candidates pointing at a DIFFERENT train index
    dist2 = jnp.where(cand == t1[:, None], big, dist)
    d2 = jnp.min(dist2, axis=1)

    valid = (
        query_valid
        & (t1 >= 0)
        & (d1 <= config.max_distance)
        & (d1 < config.ratio * d2)
    )
    return Matches(
        query_idx=jnp.arange(m, dtype=jnp.int32),
        train_idx=t1.astype(jnp.int32),
        distance=d1,
        valid=valid,
    )
