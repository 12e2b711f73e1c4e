"""LSH binary index tests (flann/lsh_index.h analog): recall against the
exact brute-force matcher on near-duplicate descriptors."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.core.config import MatchConfig
from opencv_tpu.ops import lsh, matching


def _random_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def _flip_bits(rng, desc, n_flips):
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.integers(0, 256, n_flips):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


def test_lsh_exact_duplicates_found(rng):
    train = _random_desc(rng, 4096)
    q_idx = rng.choice(4096, 128, replace=False)
    query = train[q_idx]
    index = lsh.build_lsh_index(train, n_tables=6, key_bits=12)
    m = lsh.knn_match_lsh(index, jnp.asarray(query),
                          config=MatchConfig(ratio=1.1, max_distance=256.0))
    ti = np.asarray(m.train_idx)
    found = (ti == q_idx)
    assert found.mean() > 0.95
    assert np.asarray(m.distance)[found].max() == 0.0


def test_lsh_recall_vs_bruteforce_with_noise(rng):
    train = _random_desc(rng, 8192)
    q_idx = rng.choice(8192, 256, replace=False)
    query = _flip_bits(rng, train[q_idx], 12)  # ~5% bits flipped
    index = lsh.build_lsh_index(train, n_tables=10, key_bits=12)
    cfg = MatchConfig(ratio=0.9, max_distance=64.0)
    approx = lsh.knn_match_lsh(index, jnp.asarray(query), config=cfg)
    exact = matching.knn_match(jnp.asarray(query), jnp.asarray(train),
                               config=cfg)
    ev = np.asarray(exact.valid)
    av = np.asarray(approx.valid)
    agree = (np.asarray(approx.train_idx) == np.asarray(exact.train_idx))
    # of the pairs the exact matcher accepts, LSH must find most
    recall = (av & agree)[ev].mean()
    assert recall > 0.85, recall
    # and LSH must not invent matches the exact matcher rejects
    fp = (av & ~ev).mean()
    assert fp < 0.05, fp
