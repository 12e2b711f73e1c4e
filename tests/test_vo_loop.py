"""Loop-closure + relocalization integration in the VO engine.

A loopy (out-and-back) synthetic sequence with a deliberately weak
odometry config (tiny BA window, image noise) accumulates drift; the
engine must detect the revisit, relax the keyframe pose graph, and the
trajectory ATE must drop measurably vs the same run with closure off.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from opencv_tpu.core.config import ORBConfig
from opencv_tpu.geometry.rotation import rodrigues
from opencv_tpu.slam.vo import VisualOdometry, VOConfig
from opencv_tpu.utils.evaluate import ate_rmse

from test_vo import render_frame, H, W, F, K


@pytest.fixture(scope="module")
def loopy_sequence():
    rng = np.random.default_rng(11)
    n_pts = 1600
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

    # out-and-back: slide right 14 frames, return to the start over 14
    n_out = 14
    xs = np.concatenate([0.12 * np.arange(n_out), 0.12 * np.arange(n_out - 1, -1, -1)])
    frames, centers, poses = [], [], []
    for i, x in enumerate(xs):
        c = np.array([x, 0.0, 0.0], np.float32)
        yaw = np.deg2rad(0.25) * (i if i < n_out else 2 * n_out - 1 - i)
        rvec = np.array([0.0, yaw, 0.0], np.float32)
        R = np.asarray(rodrigues(jnp.asarray(rvec)))
        tvec = (-R @ c).astype(np.float32)
        img = render_frame(world, inten, rvec, tvec)
        img = np.clip(img + rng.normal(0, 5.0, img.shape), 0, 255).astype(np.float32)
        frames.append(img)
        centers.append(c)
        poses.append((rvec, tvec))
    return frames, np.asarray(centers), poses


def _weak_cfg(enable_loop):
    # deliberately weak odometry (tiny window, few BA iters) so drift
    # accumulates over the loop and closure has something to correct
    return VOConfig(
        orb=ORBConfig(n_features=600, n_levels=3, fast_threshold=12.0),
        n_hypotheses=512,
        keyframe_min_inliers=80,
        keyframe_min_baseline=0.04,
        window_size=3,
        ba_iters=2,
        enable_loop_closure=enable_loop,
        loop_exclude_recent=4,
        loop_cooldown=2,
        loop_min_votes=30,
    )


def test_loop_closure_reduces_ate(loopy_sequence):
    frames, gt_centers, _ = loopy_sequence
    errs = {}
    closures = {}
    for on in (False, True):
        vo = VisualOdometry(K, _weak_cfg(on), seed=0)
        for f in frames:
            vo.process(f)
        assert vo.state == "tracking"
        errs[on] = ate_rmse(vo.trajectory(), gt_centers, with_scale=True)
        closures[on] = vo.loop_closures
    assert closures[False] == 0
    assert closures[True] >= 1, "loop closure never fired on a revisit"
    # closure must measurably reduce drift
    assert errs[True] < errs[False], (
        f"ATE with closure {errs[True]:.4f} !< without {errs[False]:.4f}"
    )


def test_relocalization_recovers_pose(loopy_sequence):
    frames, gt_centers, gt_poses = loopy_sequence
    cfg = _weak_cfg(False)
    vo = VisualOdometry(K, cfg, seed=0)
    for f in frames[:14]:
        vo.process(f)
    assert vo.state == "tracking"
    # a frame from a previously visited viewpoint, fed through the
    # relocalization path directly (the engine wires it to tracking loss)
    xy, desc, valid = vo._detect_frame(frames[6])
    out = vo._relocalize(xy, desc, valid)
    assert out is not None, "relocalization failed on a revisited view"
    rvec, tvec = out
    # compare camera centers (mono scale is shared with the map)
    c_est = vo._camera_center(rvec, tvec)
    kf_centers = np.stack(
        [vo._camera_center(kf.rvec, kf.tvec) for kf in vo.keyframes]
    )
    scale = np.linalg.norm(kf_centers[-1] - kf_centers[0]) / max(
        np.linalg.norm(gt_centers[vo.keyframes[-1].frame_id]
                       - gt_centers[vo.keyframes[0].frame_id]), 1e-9
    )
    c_gt = gt_centers[6] * scale
    assert np.linalg.norm(c_est - c_gt) < 0.25 * max(np.linalg.norm(c_gt), 1.0)


def test_blackout_holds_then_recovers(loopy_sequence):
    """Featureless frames mid-sequence: the engine must hold pose without
    crashing, then recover tracking when imagery returns."""
    frames, gt_centers, _ = loopy_sequence
    cfg = _weak_cfg(False)
    vo = VisualOdometry(K, cfg, seed=0)
    for f in frames[:12]:
        vo.process(f)
    assert vo.state == "tracking"
    blank = np.zeros_like(frames[0])
    for _ in range(2):
        vo.process(blank)
    p_before = vo.poses[-1]
    r, t = vo.process(frames[12])
    # pose must move again (tracking or relocalization), close to truth
    assert not (
        np.allclose(r, p_before[0]) and np.allclose(t, p_before[1])
    ) or np.linalg.norm(gt_centers[12] - gt_centers[11]) < 1e-6
