"""Distribution tests on the virtual 8-device CPU mesh: sharded results
must equal single-device results (SURVEY.md §4: multi-host strategy is
validated single-process via forced host device counts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencv_tpu.core.config import MatchConfig
from opencv_tpu.ops import matching
from opencv_tpu.optim import ba
from opencv_tpu.parallel import dist_ba, dist_match
from opencv_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh

from test_optim import make_ba_problem  # reuse synthetic BA scene


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_ba_matches_single_device(rng):
    prob, rvecs, tvecs, pts = make_ba_problem(rng, n_cams=4, n_pts=64)
    # pad observations to a multiple of 8
    O = prob.obs_cam.shape[0]
    pad = (-O) % 8
    prob = prob._replace(
        obs_cam=jnp.pad(prob.obs_cam, (0, pad)),
        obs_pt=jnp.pad(prob.obs_pt, (0, pad)),
        obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
        obs_valid=jnp.pad(prob.obs_valid, (0, pad)),
    )
    mesh = make_mesh(8, (DATA_AXIS,))

    U, V, W, bc, bp = ba.schur_normal_equations(prob, None)
    eqs_s = dist_ba.sharded_normal_equations(prob, mesh, None)
    np.testing.assert_allclose(np.asarray(eqs_s.U), np.asarray(U), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eqs_s.V), np.asarray(V), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eqs_s.bc), np.asarray(bc), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eqs_s.bp), np.asarray(bp), rtol=1e-4, atol=1e-4)
    # the sharded A rows, scatter-summed into W, must equal the dense W
    W_from_A = np.zeros_like(np.asarray(W))
    np.add.at(
        W_from_A,
        (np.asarray(prob.obs_cam), np.asarray(prob.obs_pt)),
        np.asarray(eqs_s.A),
    )
    np.testing.assert_allclose(W_from_A, np.asarray(W), rtol=1e-4, atol=1e-4)

    opt_s, cost_s = dist_ba.bundle_adjust_sharded(prob, mesh, iters=10)
    opt_1, cost_1 = ba.bundle_adjust(prob, iters=10)
    # same optimization trajectory up to float reassociation
    assert float(cost_s) < float(ba.cost(prob)) * 1e-2
    np.testing.assert_allclose(
        np.asarray(opt_s.cam_tvec), np.asarray(opt_1.cam_tvec), atol=1e-3
    )


def test_sharded_knn_matches_single_device(rng):
    def rand_desc(n):
        return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)

    train = rand_desc(256)
    perm = rng.permutation(256)[:64]
    query = train[perm].copy()
    # flip a few bits
    for i in range(query.shape[0]):
        for b in rng.choice(256, size=4, replace=False):
            query[i, b // 32] ^= np.uint32(1 << (b % 32))

    tvalid = np.ones(256, bool)
    tvalid[rng.choice(256, 20, replace=False)] = False

    mesh = make_mesh(8, (MODEL_AXIS,))
    cfgs = [MatchConfig(cross_check=False), MatchConfig(cross_check=True)]
    for cfg in cfgs:
        m1 = matching.knn_match(
            jnp.asarray(query), jnp.asarray(train),
            train_valid=jnp.asarray(tvalid), config=cfg,
        )
        m8 = dist_match.sharded_knn_match(
            jnp.asarray(query), jnp.asarray(train), mesh,
            train_valid=jnp.asarray(tvalid), config=cfg,
        )
        np.testing.assert_array_equal(np.asarray(m8.valid), np.asarray(m1.valid))
        v = np.asarray(m1.valid)
        np.testing.assert_array_equal(
            np.asarray(m8.train_idx)[v], np.asarray(m1.train_idx)[v]
        )
        np.testing.assert_allclose(
            np.asarray(m8.distance)[v], np.asarray(m1.distance)[v]
        )


def test_sharded_knn_adversarial_ties(rng):
    """VERDICT r1 weak #8: cross-check correctness when the SAME
    descriptor appears in several shards (distance ties across shards)
    and when queries tie for a train row's best. The sharded result may
    legitimately pick any of the tied train copies; what must hold is
    (a) tied-distance equality with the dense matcher and (b) no valid
    match whose distance the dense matcher beats."""
    import jax.numpy as jnp
    from opencv_tpu.core.config import MatchConfig
    from opencv_tpu.ops import matching
    from opencv_tpu.parallel import dist_match
    from opencv_tpu.parallel.mesh import MODEL_AXIS, make_mesh

    nq, nt = 64, 256
    train = rng.integers(0, 2**32, (nt, 8), dtype=np.uint32)
    # plant the same descriptor in all 8 shards (ties for 1st AND 2nd)
    dup = train[3].copy()
    shard = nt // 8
    for s in range(8):
        train[s * shard + 5] = dup
    # queries: half are exact duplicates of the planted descriptor
    # (0-distance ties everywhere), half are near-duplicates of random rows
    query = np.empty((nq, 8), np.uint32)
    query[: nq // 2] = dup
    src = rng.choice(nt, nq - nq // 2, replace=False)
    query[nq // 2:] = train[src]
    # duplicated queries also create ties in the per-train-row argmin
    # (the cross-check reduction)
    cfg = MatchConfig(ratio=1.01, max_distance=256.0, cross_check=True)

    mesh = make_mesh(8, (MODEL_AXIS,))
    got = dist_match.sharded_knn_match(
        jnp.asarray(query), jnp.asarray(train), mesh, config=cfg
    )
    want = matching.knn_match(jnp.asarray(query), jnp.asarray(train), config=cfg)

    gd = np.asarray(got.distance)
    wd = np.asarray(want.distance)
    gv = np.asarray(got.valid)
    wv = np.asarray(want.valid)
    gi = np.asarray(got.train_idx)
    # (b) any sharded-valid match has a distance the dense matcher cannot
    # beat (the winning index may be a different tied copy)
    dense_d = np.asarray(
        matching.hamming_matrix(jnp.asarray(query), jnp.asarray(train))
    )
    assert (gd[gv] <= dense_d[gv].min(axis=1) + 1e-6).all()
    # (a) where both declare valid, distances agree exactly
    both = gv & wv
    np.testing.assert_allclose(gd[both], wd[both])
    # the chosen index really has the reported distance
    np.testing.assert_allclose(gd[gv], dense_d[np.where(gv)[0], gi[gv]])
