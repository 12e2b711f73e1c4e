"""Loop closure: retrieval votes, PnP verification, pose-graph drift
correction on a synthetic drifted loop."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.geometry.rotation import rodrigues
from opencv_tpu.slam import loop_closure as lc


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def flip_bits(rng, d, k):
    out = d.copy()
    for i in range(d.shape[0]):
        for b in rng.choice(256, size=k, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


def test_retrieval_votes_right_keyframe(rng):
    K, N = 10, 64
    db = np.stack([rand_desc(rng, N) for _ in range(K)])
    dbv = np.ones((K, N), bool)
    # query revisits keyframe 2 (noisy copies of its descriptors)
    query = flip_bits(rng, db[2], 4)
    cands = lc.retrieve_candidates(query, np.ones(N, bool), db, dbv,
                                   exclude_recent=3, min_votes=20)
    assert len(cands) >= 1
    assert cands[0].kf_index == 2
    assert cands[0].n_votes > 40


def test_retrieval_excludes_recent(rng):
    K, N = 6, 32
    db = np.stack([rand_desc(rng, N) for _ in range(K)])
    dbv = np.ones((K, N), bool)
    query = flip_bits(rng, db[4], 3)  # kf 4 is "recent" with exclude=5
    cands = lc.retrieve_candidates(query, np.ones(N, bool), db, dbv,
                                   exclude_recent=5, min_votes=10)
    assert all(c.kf_index != 4 for c in cands)


def test_verification_recovers_pose(rng):
    n = 120
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(5, 12, n)], 1
    ).astype(np.float32)
    rvec = np.array([0.05, -0.1, 0.02], np.float32)
    tvec = np.array([0.3, -0.1, 0.2], np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    pc = pts @ R.T + tvec
    xy = (pc[:, :2] / pc[:, 2:3]).astype(np.float32)
    desc = rand_desc(rng, n)
    out = lc.verify_candidate(
        jax.random.PRNGKey(0), xy, flip_bits(rng, desc, 4), np.ones(n, bool),
        pts, desc, np.ones(n, bool),
    )
    assert out is not None
    rv, tv, n_inl = out
    assert n_inl > 80
    np.testing.assert_allclose(rv, rvec, atol=5e-3)
    np.testing.assert_allclose(tv, tvec, atol=2e-2)


def test_pose_graph_correction_removes_drift(rng):
    """Square loop with accumulated translation drift; a perfect loop
    edge between first and last keyframe pulls the loop closed."""
    K = 12
    # ground truth: straight line of keyframes then return (a loop in t)
    t_gt = np.stack(
        [np.sin(np.linspace(0, 2 * np.pi, K)),
         np.zeros(K),
         1.0 - np.cos(np.linspace(0, 2 * np.pi, K))], 1
    ).astype(np.float32) * 2.0
    rv_gt = np.zeros((K, 3), np.float32)
    # drifted estimates: linear error growing along the chain
    drift = np.linspace(0, 1, K)[:, None] * np.array([0.4, 0.1, -0.3])
    tv_est = (t_gt + drift).astype(np.float32)
    rv_est = rv_gt.copy()

    # measured loop relative pose between kf 0 and kf K-1 (exact)
    rel = lc.relative_from_world_poses(rv_gt[0], t_gt[0], rv_gt[K - 1], t_gt[K - 1])
    rv_new, tv_new = lc.correct_poses(rv_est, tv_est, 0, K - 1, rel)
    err_before = np.linalg.norm(tv_est[K - 1] - t_gt[K - 1])
    err_after = np.linalg.norm(tv_new[K - 1] - t_gt[K - 1])
    assert err_after < err_before * 0.2
    # intermediate drift also reduced on average
    assert np.linalg.norm(tv_new - t_gt, axis=1).mean() < \
        np.linalg.norm(tv_est - t_gt, axis=1).mean() * 0.8
