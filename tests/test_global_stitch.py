"""Global stitching pipeline tests: autocalib, MST rotations, ray BA,
DP seam, N-image stitch. Mirrors the reference's synthetic-geometry test
style for stitching (autocalib + motion_estimators have no direct tests
in the reference — these exceed it)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import morphology  # noqa: F401 (blend dependency)
from opencv_tpu.stitching import global_stitch as gs
from opencv_tpu.geometry.rotation import rodrigues


F_TRUE = 180.0
H_IMG, W_IMG = 140, 180


def _views(rng, yaws):
    """Render pure-rotation views of a plane-at-z=1 texture."""
    # big texture indexed by plane coords in [-1.6, 1.6]
    ts = 640
    tex = rng.uniform(40, 215, (ts // 8, ts // 8)).astype(np.float32)
    tex = np.asarray(
        imgproc.resize_bilinear(jnp.asarray(tex), ts, ts)
    )  # smooth blobs
    span = 1.6
    S = np.array(
        [[ts / (2 * span), 0, ts / 2], [0, ts / (2 * span), ts / 2], [0, 0, 1]]
    )
    K = np.array([[F_TRUE, 0, W_IMG / 2], [0, F_TRUE, H_IMG / 2], [0, 0, 1]])
    views, Rs = [], []
    for yaw in yaws:
        R = np.asarray(rodrigues(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
        M = S @ np.linalg.inv(K @ R)  # output pixel -> texture pixel
        v = imgproc.warp_perspective(
            jnp.asarray(tex), jnp.asarray(M, jnp.float32), H_IMG, W_IMG
        )
        views.append(np.asarray(v))
        Rs.append(R)
    return views, np.stack(Rs)


def test_focals_from_synthetic_homography():
    K = np.array([[F_TRUE, 0, 0], [0, F_TRUE, 0], [0, 0, 1]])
    R = np.asarray(rodrigues(jnp.asarray([0.05, 0.3, -0.02], jnp.float32)))
    H = K @ R @ np.linalg.inv(K)
    f0, f1 = gs.focals_from_homography(H / H[2, 2])
    assert f0 is not None and f1 is not None
    assert abs(np.sqrt(f0 * f1) - F_TRUE) / F_TRUE < 0.05


def test_dp_seam_follows_low_cost_column():
    h, w = 32, 40
    cost = np.ones((h, w), np.float32) * 5.0
    col = 11 + (np.arange(h) // 8)  # slowly drifting cheap column
    cost[np.arange(h), col] = 0.0
    seam = np.asarray(gs.dp_seam(jnp.asarray(cost)))
    assert np.abs(seam - col).max() <= 1


@pytest.mark.slow
def test_estimate_panorama_recovers_geometry(rng):
    yaws = [-0.35, 0.0, 0.35]
    views, Rs = _views(rng, yaws)
    R_est, f_est, diag = gs.estimate_panorama(views, n_features=600, seed=1)
    assert abs(f_est - F_TRUE) / F_TRUE < 0.12, f_est
    # relative rotations up to global gauge
    for k in range(1, 3):
        rel_true = Rs[k] @ Rs[0].T
        rel_est = R_est[k] @ R_est[0].T
        err = rel_est @ rel_true.T
        ang = np.degrees(np.arccos(np.clip((np.trace(err) - 1) / 2, -1, 1)))
        assert ang < 3.0, (k, ang)
    assert len(diag["tree"]) == 2


@pytest.mark.slow
def test_stitch_panorama_end_to_end(rng):
    yaws = [-0.3, 0.0, 0.3]
    views, _ = _views(rng, yaws)
    pano = gs.stitch_panorama(views, n_features=600, seed=1, blend_bands=2)
    assert pano.shape[0] >= H_IMG
    assert pano.shape[1] > W_IMG * 1.5  # canvas widened by the rotation span
    assert np.isfinite(pano).all()
    assert (pano > 1.0).mean() > 0.4  # most of the canvas is covered
