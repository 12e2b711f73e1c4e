"""Streaming Pallas 2-NN kernel vs the dense XLA matcher (interpret mode
on CPU; the same kernel compiles for TPU — see bench_pallas.py)."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import matching
from opencv_tpu.ops.pallas import knn


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def test_streaming_knn2_matches_dense(rng):
    q = rand_desc(rng, 64)
    t = rand_desc(rng, 128)
    dense = np.asarray(matching.hamming_matrix(jnp.asarray(q), jnp.asarray(t)))
    qs = matching.signed_descriptors(jnp.asarray(q))
    ts = matching.signed_descriptors(jnp.asarray(t))
    d1, d2, i1 = knn.knn2_hamming(qs, ts, q_tile=32, t_tile=32, interpret=True)
    srt = np.sort(dense, axis=1)
    np.testing.assert_array_equal(np.asarray(d1), srt[:, 0])
    np.testing.assert_array_equal(np.asarray(d2), srt[:, 1])
    np.testing.assert_array_equal(np.asarray(i1), dense.argmin(axis=1))


def test_streaming_matcher_agrees_with_xla(rng):
    t = rand_desc(rng, 256)
    perm = rng.permutation(256)[:64]
    q = t[perm].copy()
    for i in range(q.shape[0]):
        for b in rng.choice(256, size=4, replace=False):
            q[i, b // 32] ^= np.uint32(1 << (b % 32))
    tvalid = np.ones(256, bool)
    tvalid[rng.choice(256, 30, replace=False)] = False

    from opencv_tpu.core.config import MatchConfig

    m_xla = matching.knn_match(
        jnp.asarray(q), jnp.asarray(t), train_valid=jnp.asarray(tvalid),
        config=MatchConfig(cross_check=False),
    )
    m_pl = knn.knn_match_streaming(
        jnp.asarray(q), jnp.asarray(t), train_valid=jnp.asarray(tvalid),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(m_pl.valid), np.asarray(m_xla.valid))
    v = np.asarray(m_xla.valid)
    np.testing.assert_array_equal(
        np.asarray(m_pl.train_idx)[v], np.asarray(m_xla.train_idx)[v]
    )
    np.testing.assert_allclose(
        np.asarray(m_pl.distance)[v], np.asarray(m_xla.distance)[v]
    )


def test_knn_match_auto_dispatch(rng):
    """Auto dispatcher: dense below threshold / off-TPU; forced streaming
    agrees with the dense matcher (dispatch plumbing, not kernel math)."""
    from opencv_tpu.core.config import MatchConfig

    q = rand_desc(rng, 32)
    t = rand_desc(rng, 64)
    cfg = MatchConfig(cross_check=False)
    m_auto = matching.knn_match_auto(jnp.asarray(q), jnp.asarray(t), config=cfg)
    m_dense = matching.knn_match(jnp.asarray(q), jnp.asarray(t), config=cfg)
    np.testing.assert_array_equal(np.asarray(m_auto.valid), np.asarray(m_dense.valid))
    np.testing.assert_array_equal(
        np.asarray(m_auto.train_idx), np.asarray(m_dense.train_idx)
    )
    m_forced = matching.knn_match_auto(
        jnp.asarray(q), jnp.asarray(t), config=cfg,
        force_streaming=True, interpret=True,
    )
    v = np.asarray(m_dense.valid)
    np.testing.assert_array_equal(np.asarray(m_forced.valid), v)
    np.testing.assert_array_equal(
        np.asarray(m_forced.train_idx)[v], np.asarray(m_dense.train_idx)[v]
    )
