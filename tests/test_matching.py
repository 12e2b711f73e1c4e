"""Matcher vs NumPy popcount (mirrors the reference's matcher correctness
tests on constructed descriptor sets,
features2d/test/test_matchers_algorithmic.cpp)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.core.config import MatchConfig
from opencv_tpu.ops import matching


def np_hamming(a, b):
    """Popcount Hamming between packed uint32 [N,8] and [M,8]."""
    abits = np.unpackbits(a.view(np.uint8), axis=1)
    bbits = np.unpackbits(b.view(np.uint8), axis=1)
    return (abits[:, None, :] != bbits[None, :, :]).sum(-1)


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def flip_bits(rng, d, k):
    """Flip k random bits in each descriptor."""
    out = d.copy()
    for i in range(d.shape[0]):
        for b in rng.choice(256, size=k, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


def test_hamming_matrix_matches_popcount(rng):
    q = rand_desc(rng, 33)
    t = rand_desc(rng, 47)
    got = np.asarray(matching.hamming_matrix(jnp.asarray(q), jnp.asarray(t)))
    want = np_hamming(q, t)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_knn_match_recovers_permutation(rng):
    n = 64
    train = rand_desc(rng, n)
    perm = rng.permutation(n)
    query = flip_bits(rng, train[perm], 5)  # noisy copies
    m = matching.knn_match(jnp.asarray(query), jnp.asarray(train))
    valid = np.asarray(m.valid)
    ti = np.asarray(m.train_idx)
    # random 256-bit codes are ~128 apart; 5 flips is unambiguous
    assert valid.mean() > 0.95
    np.testing.assert_array_equal(ti[valid], perm[valid])
    assert np.all(np.asarray(m.distance)[valid] <= 5)


def test_ratio_test_kills_ambiguous(rng):
    train = rand_desc(rng, 16)
    train[1] = train[0]  # duplicate -> d1 == d2 for query 0
    query = train[:1].copy()
    m = matching.knn_match(jnp.asarray(query), jnp.asarray(train),
                           config=MatchConfig(cross_check=False))
    assert not bool(np.asarray(m.valid)[0])


def test_invalid_train_rows_never_match(rng):
    train = rand_desc(rng, 8)
    query = train.copy()
    tvalid = np.ones(8, bool)
    tvalid[3] = False
    m = matching.knn_match(
        jnp.asarray(query), jnp.asarray(train),
        train_valid=jnp.asarray(tvalid),
        config=MatchConfig(cross_check=False),
    )
    assert not bool(np.asarray(m.valid)[3])
    ok = np.asarray(m.valid)
    assert np.all(np.asarray(m.train_idx)[ok] != 3)


def test_cross_check_mutual_best(rng):
    train = rand_desc(rng, 32)
    query = flip_bits(rng, train, 3)
    m = matching.knn_match(jnp.asarray(query), jnp.asarray(train))
    valid = np.asarray(m.valid)
    assert valid.mean() > 0.9
    np.testing.assert_array_equal(
        np.asarray(m.train_idx)[valid], np.arange(32)[valid]
    )
