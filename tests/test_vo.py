"""End-to-end monocular VO on a synthetic 3D scene (the minimum
end-to-end slice of SURVEY.md §7: ORB -> match -> E-RANSAC -> recoverPose
-> PnP -> BA -> trajectory, judged by Sim(3)-aligned ATE)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import MatchConfig, ORBConfig
from opencv_tpu.geometry.rotation import rodrigues
from opencv_tpu.slam.vo import VisualOdometry, VOConfig
from opencv_tpu.utils.evaluate import ate_rmse, umeyama_alignment


H, W = 240, 320
F = 260.0
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def render_frame(world_pts, intensities, rvec, tvec):
    """Project world points and splat blurred sprites (true parallax)."""
    R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
    pc = world_pts @ R.T + tvec
    z = pc[:, 2]
    vis = z > 0.5
    u = F * pc[:, 0] / z + W / 2
    v = F * pc[:, 1] / z + H / 2
    vis &= (u >= 2) & (u < W - 2) & (v >= 2) & (v < H - 2)
    img = np.zeros((H, W), np.float32)
    # bilinear subpixel splat (integer splatting would quantize the scene
    # itself and swamp small-parallax geometry with 0.5px noise)
    uf, vf = u[vis], v[vis]
    u0 = np.floor(uf).astype(int)
    v0 = np.floor(vf).astype(int)
    au, av = uf - u0, vf - v0
    ii = intensities[vis]
    np.add.at(img, (v0, u0), ii * (1 - au) * (1 - av))
    np.add.at(img, (v0, u0 + 1), ii * au * (1 - av))
    np.add.at(img, (v0 + 1, u0), ii * (1 - au) * av)
    np.add.at(img, (v0 + 1, u0 + 1), ii * au * av)
    img = np.asarray(imgproc.gaussian_blur(jnp.asarray(img), 5, 1.1))
    return np.clip(img * 4.0, 0, 255)


@pytest.fixture(scope="module")
def synthetic_sequence():
    rng = np.random.default_rng(7)
    n_pts = 1600
    # points on a smooth depth surface (locally planar, like real scenes:
    # neighbouring features move coherently so descriptors survive motion)
    # strong relief (avoids planar E-degeneracy) at a spatial wavelength
    # much larger than a descriptor patch (stays locally planar)
    wx = rng.uniform(-6, 8, n_pts)
    wy = rng.uniform(-4, 4, n_pts)
    wz = (
        7.0
        + 2.8 * np.sin(0.85 * wx) * np.cos(0.7 * wy)
        + 1.5 * np.cos(1.3 * wx + 0.9 * wy)
        + 0.35 * wx
    )
    world = np.stack([wx, wy, wz], axis=1).astype(np.float32)
    inten = rng.uniform(60, 255, n_pts).astype(np.float32)

    n_frames = 20
    centers = []
    frames = []
    poses = []
    for i in range(n_frames):
        # camera slides right with slight forward motion and tiny yaw
        c = np.array([0.12 * i, 0.0, 0.05 * i], np.float32)
        yaw = np.deg2rad(0.3 * i)
        rvec = np.array([0.0, yaw, 0.0], np.float32)
        R = np.asarray(rodrigues(jnp.asarray(rvec)))
        tvec = (-R @ c).astype(np.float32)
        frames.append(render_frame(world, inten, rvec, tvec))
        centers.append(c)
        poses.append((rvec, tvec))
    return frames, np.asarray(centers), poses


@pytest.mark.slow
def test_vo_synthetic_sequence(synthetic_sequence):
    frames, gt_centers, _ = synthetic_sequence
    cfg = VOConfig(
        orb=ORBConfig(n_features=600, n_levels=3, fast_threshold=12.0),
        n_hypotheses=512,
        keyframe_min_inliers=80,
        window_size=5,
        ba_iters=8,
    )
    vo = VisualOdometry(K, cfg, seed=0)
    for f in frames:
        vo.process(f)
    traj = vo.trajectory()
    assert vo.state == "tracking", f"never bootstrapped: {vo.state}"
    assert len(vo.keyframes) >= 2
    path_len = np.linalg.norm(np.diff(gt_centers, axis=0), axis=1).sum()
    err = ate_rmse(traj, gt_centers, with_scale=True)
    # mono-scale ATE under 5% of trajectory length
    assert err < 0.05 * path_len, f"ATE {err:.4f} vs path {path_len:.3f}"


def test_umeyama_alignment_exact(rng):
    src = rng.normal(size=(50, 3))
    R_true = np.asarray(rodrigues(jnp.asarray([0.2, -0.3, 0.4])))
    dst = 1.7 * src @ R_true.T + np.array([1.0, -2.0, 0.5])
    R, t, s = umeyama_alignment(src, dst)
    np.testing.assert_allclose(s, 1.7, rtol=1e-5)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    assert ate_rmse(src, dst) < 1e-6


@pytest.mark.slow
def test_vo_near_planar_scene():
    """Near-planar terrain: the E-only bootstrap failed here (planar
    degeneracy); the H/E model selection must keep the trajectory sane."""
    rng = np.random.default_rng(7)
    n_pts = 1600
    wx = rng.uniform(-6, 8, n_pts)
    wy = rng.uniform(-4, 4, n_pts)
    wz = 7.0 + 0.6 * np.sin(0.5 * wx) * np.cos(0.45 * wy) + 0.25 * wx  # gentle relief
    world = np.stack([wx, wy, wz], axis=1).astype(np.float32)
    inten = rng.uniform(60, 255, n_pts).astype(np.float32)

    frames, centers = [], []
    for i in range(16):
        c = np.array([0.12 * i, 0.0, 0.05 * i], np.float32)
        yaw = np.deg2rad(0.3 * i)
        rvec = np.array([0.0, yaw, 0.0], np.float32)
        R = np.asarray(rodrigues(jnp.asarray(rvec)))
        tvec = (-R @ c).astype(np.float32)
        frames.append(render_frame(world, inten, rvec, tvec))
        centers.append(c)
    centers = np.asarray(centers)

    cfg = VOConfig(
        orb=ORBConfig(n_features=600, n_levels=3, fast_threshold=12.0),
        n_hypotheses=512,
        keyframe_min_inliers=80,
        window_size=5,
        ba_iters=8,
    )
    vo = VisualOdometry(K, cfg, seed=0)
    for f in frames:
        vo.process(f)
    assert vo.state == "tracking"
    traj = vo.trajectory()
    path_len = np.linalg.norm(np.diff(centers, axis=0), axis=1).sum()
    err = ate_rmse(traj, centers, with_scale=True)
    assert err < 0.12 * path_len, f"ATE {err:.4f} vs path {path_len:.3f}"
