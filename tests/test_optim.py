"""Optimizer tests: LM on a classic curve fit, BA convergence on a
synthetic perturbed scene, pose-graph relaxation with a loop closure."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.geometry.rotation import rodrigues, rodrigues_inv
from opencv_tpu.optim import ba, levmarq, pose_graph


def rot_angle(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.arccos(np.clip(c, -1, 1))


# ---------- generic LM ----------

def test_levmarq_rosenbrock():
    def resid(x):
        return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    res = levmarq.levmarq(resid, jnp.array([-1.2, 1.0]), iters=60)
    np.testing.assert_allclose(np.asarray(res.params), [1.0, 1.0], atol=1e-3)
    assert float(res.cost) < 1e-8


def test_levmarq_exponential_fit(rng):
    t = np.linspace(0, 1, 40).astype(np.float32)
    y = 2.0 * np.exp(-1.3 * t) + 0.05 * rng.normal(size=40).astype(np.float32)

    def resid(p):
        return p[0] * jnp.exp(p[1] * jnp.asarray(t)) - jnp.asarray(y)

    res = levmarq.levmarq(resid, jnp.array([1.0, 0.0]), iters=40)
    p = np.asarray(res.params)
    assert abs(p[0] - 2.0) < 0.1 and abs(p[1] + 1.3) < 0.2


# ---------- bundle adjustment ----------

def make_ba_problem(rng, n_cams=6, n_pts=120, noise=0.0, perturb=0.05):
    pts = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(6, 14, n_pts)],
        axis=1,
    ).astype(np.float32)
    rvecs, tvecs = [], []
    for c in range(n_cams):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        rvecs.append(axis * np.deg2rad(rng.uniform(0, 6)))
        tvecs.append(np.array([0.3 * c, 0.02 * c, 0.01 * c]))
    rvecs = np.asarray(rvecs, np.float32)
    tvecs = np.asarray(tvecs, np.float32)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        R = np.asarray(rodrigues(jnp.asarray(rvecs[c])))
        pc = pts @ R.T + tvecs[c]
        uv = pc[:, :2] / pc[:, 2:3]
        for p in range(n_pts):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uv.append(uv[p] + rng.normal(0, noise, 2))
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    obs_uv = np.asarray(obs_uv, np.float32)

    # perturb everything except gauge cameras 0, 1
    rv_p = rvecs.copy()
    tv_p = tvecs.copy()
    rv_p[2:] += rng.normal(0, perturb * 0.2, (n_cams - 2, 3))
    tv_p[2:] += rng.normal(0, perturb, (n_cams - 2, 3))
    pts_p = pts + rng.normal(0, perturb, pts.shape)

    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True
    prob = ba.BAProblem(
        cam_rvec=jnp.asarray(rv_p),
        cam_tvec=jnp.asarray(tv_p),
        points=jnp.asarray(pts_p.astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.ones((len(obs_cam),), bool),
        fixed_cams=jnp.asarray(fixed),
    )
    return prob, rvecs, tvecs, pts


def test_ba_converges_to_ground_truth(rng):
    prob, rvecs, tvecs, pts = make_ba_problem(rng)
    c0 = float(ba.cost(prob))
    opt, c1 = ba.bundle_adjust(prob, iters=25)
    assert float(c1) < c0 * 1e-4
    for c in range(2, rvecs.shape[0]):
        Rg = np.asarray(rodrigues(jnp.asarray(rvecs[c])))
        Ro = np.asarray(rodrigues(opt.cam_rvec[c]))
        assert rot_angle(Rg, Ro) < np.deg2rad(0.1)
        np.testing.assert_allclose(np.asarray(opt.cam_tvec[c]), tvecs[c], atol=5e-3)


def test_schur_cg_matches_dense_solve(rng):
    """The matrix-free PCG Schur solver must reproduce the explicit dense
    Schur factorization (the gold path) on the same normal equations."""
    prob, *_ = make_ba_problem(rng, n_cams=5, n_pts=80, perturb=0.08)
    lam = jnp.float32(1e-3)
    U, V, W, bc, bp = ba.schur_normal_equations(prob, None)
    dc_d, dp_d = ba.schur_solve(U, V, W, bc, bp, lam, prob.fixed_cams)
    eqs = ba.normal_equations(prob, None)
    dc_c, dp_c = ba.schur_cg_solve(
        eqs, prob.obs_cam, prob.obs_pt, lam, prob.fixed_cams, cg_iters=120
    )
    scale = max(float(jnp.max(jnp.abs(dc_d))), 1e-6)
    np.testing.assert_allclose(
        np.asarray(dc_c), np.asarray(dc_d), atol=2e-3 * scale, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dp_c), np.asarray(dp_d), atol=5e-3 * max(float(jnp.max(jnp.abs(dp_d))), 1e-6), rtol=5e-3
    )


def test_ba_cg_converges_at_scale(rng):
    """CG path converges on a larger sparse problem (each point seen by a
    random subset of cameras — real sparsity, not the dense all-pairs)."""
    prob, rvecs, tvecs, pts = make_ba_problem(rng, n_cams=10, n_pts=400)
    # knock out 60% of observations to create irregular sparsity
    keep = rng.random(prob.obs_valid.shape[0]) > 0.6
    prob = prob._replace(obs_valid=jnp.asarray(np.asarray(prob.obs_valid) & keep))
    c0 = float(ba.cost(prob))
    opt, c1 = ba.bundle_adjust(prob, iters=20, solver="cg")
    assert float(c1) < c0 * 1e-3


def test_ba_respects_fixed_cameras(rng):
    prob, rvecs, tvecs, pts = make_ba_problem(rng)
    opt, _ = ba.bundle_adjust(prob, iters=5)
    np.testing.assert_array_equal(np.asarray(opt.cam_rvec[:2]), np.asarray(prob.cam_rvec[:2]))
    np.testing.assert_array_equal(np.asarray(opt.cam_tvec[:2]), np.asarray(prob.cam_tvec[:2]))


def test_ba_masked_observations_ignored(rng):
    prob, *_ = make_ba_problem(rng, n_cams=4, n_pts=40)
    # corrupt half the observations but mark them invalid
    uv = np.asarray(prob.obs_uv)
    n = uv.shape[0]
    bad = np.zeros(n, bool)
    bad[: n // 2] = True
    uv_bad = uv.copy()
    uv_bad[bad] += 10.0
    prob2 = prob._replace(
        obs_uv=jnp.asarray(uv_bad), obs_valid=jnp.asarray(~bad)
    )
    opt, c1 = ba.bundle_adjust(prob2, iters=15)
    assert float(c1) < 1e-6  # valid half is still consistent


# ---------- pose graph ----------

def test_pose_graph_loop_closure(rng):
    """Odometry chain with drift + one loop-closure edge: optimization
    should distribute the error around the loop."""
    n = 8
    # ground truth: poses on a line
    rv_gt = np.zeros((n, 3), np.float32)
    tv_gt = np.stack(
        [np.arange(n, dtype=np.float32), np.zeros(n, np.float32), np.zeros(n, np.float32)],
        axis=1,
    )

    def T(rv, tv):
        return np.asarray(rodrigues(jnp.asarray(rv))), tv

    # odometry edges i -> i+1 with noise; loop edge 0 -> n-1 exact
    ei, ej, meas, wts = [], [], [], []
    for i in range(n - 1):
        Ri, ti = T(rv_gt[i], tv_gt[i])
        Rj, tj = T(rv_gt[i + 1], tv_gt[i + 1])
        Rrel = Ri @ Rj.T
        trel = ti - Rrel @ tj
        drift = rng.normal(0, 0.05, 3).astype(np.float32)
        meas.append(np.concatenate([np.zeros(3, np.float32), trel + drift]))
        ei.append(i)
        ej.append(i + 1)
        wts.append(1.0)
    # exact loop closure
    Ri, ti = T(rv_gt[0], tv_gt[0])
    Rj, tj = T(rv_gt[n - 1], tv_gt[n - 1])
    Rrel = Ri @ Rj.T
    trel = ti - Rrel @ tj
    meas.append(np.concatenate([np.zeros(3, np.float32), trel]))
    ei.append(0)
    ej.append(n - 1)
    wts.append(10.0)  # trusted

    # initial guess: integrate noisy odometry
    rv0 = np.zeros((n, 3), np.float32)
    tv0 = np.zeros((n, 3), np.float32)
    for i in range(n - 1):
        tv0[i + 1] = tv0[i] - meas[i][3:]
    fixed = np.zeros(n, bool)
    fixed[0] = True

    g = pose_graph.PoseGraph(
        rvec=jnp.asarray(rv0),
        tvec=jnp.asarray(tv0),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_meas=jnp.asarray(np.asarray(meas, np.float32)),
        edge_weight=jnp.asarray(wts, jnp.float32),
        fixed=jnp.asarray(fixed),
    )
    before = np.linalg.norm(tv0[n - 1] - tv_gt[n - 1])
    opt, c = pose_graph.optimize(g, iters=20)
    after = np.linalg.norm(np.asarray(opt.tvec[n - 1]) - tv_gt[n - 1])
    assert after < before * 0.35
    assert after < 0.06


def test_relative_pose_roundtrip(rng):
    rv_i = rng.normal(0, 0.3, 3).astype(np.float32)
    tv_i = rng.normal(0, 1.0, 3).astype(np.float32)
    rv_j = rng.normal(0, 0.3, 3).astype(np.float32)
    tv_j = rng.normal(0, 1.0, 3).astype(np.float32)
    rrel, trel = pose_graph.relative_pose(
        jnp.asarray(rv_i), jnp.asarray(tv_i), jnp.asarray(rv_j), jnp.asarray(tv_j)
    )
    # residual of an edge measuring exactly this relative pose must be 0
    r = pose_graph._edge_residual(
        jnp.asarray(rv_i), jnp.asarray(tv_i),
        jnp.asarray(rv_j), jnp.asarray(tv_j),
        jnp.concatenate([rrel, trel]),
    )
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)
