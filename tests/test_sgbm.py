"""StereoSGBM vs StereoBM on a rendered stereo pair with exact GT.

Mirrors the reference's synthetic-geometry test style
(calib3d/test/test_stereomatching.cpp evaluates bad-pixel rates against
ground truth). The scene has a slanted wall — where fronto-parallel
block matching smears — plus a near slab for a depth discontinuity.
VERDICT.md round-1 item 9: SGBM must beat BM's bad-pixel rate.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_tpu.ops import stereo
from opencv_tpu.ops.sgbm import SGBMConfig, compute_disparity_sgbm
from opencv_tpu.utils.synth import OrientedPlane, TexturedPlane, render_frame

REF_DATA = "/root/reference/samples/data"

H, W = 192, 256
F = 240.0
BASELINE = 0.30
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def _load_gray(name):
    from PIL import Image

    return np.asarray(Image.open(f"{REF_DATA}/{name}").convert("L"), np.float32)


@pytest.fixture(scope="module")
def stereo_pair():
    tex = _load_gray("baboon.jpg")
    tex2 = _load_gray("fruits.jpg")
    # slanted background wall (normal ~25 deg off the optical axis) and a
    # fronto-parallel near slab
    yaw = np.deg2rad(25.0)
    walls = [
        OrientedPlane(
            origin=np.array([0.0, 0.0, 9.0]),
            ax_u=np.array([np.cos(yaw), 0.0, -np.sin(yaw)]),
            ax_v=np.array([0.0, 1.0, 0.0]),
            half_u=9.0, half_v=6.0, tex=tex,
        ),
        TexturedPlane(
            z0=5.0, x0=-0.5, x1=1.7, y0=-1.5, y1=0.3, tex=tex2,
            tex_scale=(tex2.shape[1] - 2) / 2.2,
        ),
    ]
    eye = np.eye(3)
    left, depth_l = render_frame(
        walls, K, eye, np.zeros(3), H, W, return_depth=True
    )
    right, _ = render_frame(
        walls, K, eye, np.array([-BASELINE, 0.0, 0.0]), H, W, return_depth=True
    )
    gt = F * BASELINE / depth_l  # exact disparity on the left grid
    return left, right, gt


def _bad_rate(disp, gt, valid_region, thresh=2.0):
    d = np.asarray(disp)
    bad = (d < 0) | (np.abs(d - gt) > thresh)
    return float(bad[valid_region].mean())


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample images absent"
)
def test_sgbm_beats_bm(stereo_pair):
    left, right, gt = stereo_pair
    nd = 32
    # evaluable region: disparity in range, window margin off the border,
    # and away from the occlusion band at the depth discontinuity
    gy, gx = np.gradient(gt)
    smooth = (np.abs(gx) + np.abs(gy)) < 0.5
    ys, xs = np.mgrid[0:H, 0:W]
    region = (
        (gt < nd - 1.5) & (gt > 1.0) & smooth
        & (xs > nd + 8) & (xs < W - 8) & (ys > 8) & (ys < H - 8)
    )
    assert region.mean() > 0.4  # the test must score most of the image

    d_bm = stereo.compute_disparity_bm(
        jnp.asarray(left), jnp.asarray(right),
        num_disparities=nd, block_size=9,
    )
    d_sgbm = compute_disparity_sgbm(
        jnp.asarray(left), jnp.asarray(right),
        SGBMConfig(num_disparities=nd, block_size=5),
    )
    bad_bm = _bad_rate(d_bm, gt, region)
    bad_sgbm = _bad_rate(d_sgbm, gt, region)
    # SGBM must beat BM on the slanted scene and be absolutely good
    assert bad_sgbm < bad_bm, f"sgbm {bad_sgbm:.3f} vs bm {bad_bm:.3f}"
    assert bad_sgbm < 0.10, f"sgbm bad-pixel rate {bad_sgbm:.3f}"


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample images absent"
)
def test_sgbm_subpixel_accuracy(stereo_pair):
    """Median |error| on the smooth slanted wall should be subpixel."""
    left, right, gt = stereo_pair
    nd = 32
    d = np.asarray(
        compute_disparity_sgbm(
            jnp.asarray(left), jnp.asarray(right),
            SGBMConfig(num_disparities=nd, block_size=5),
        )
    )
    gy, gx = np.gradient(gt)
    smooth = (np.abs(gx) + np.abs(gy)) < 0.5
    ys, xs = np.mgrid[0:H, 0:W]
    region = (
        (gt < nd - 1.5) & (gt > 1.0) & smooth
        & (xs > nd + 8) & (xs < W - 8) & (ys > 8) & (ys < H - 8)
        & (d >= 0)
    )
    err = np.abs(d - gt)[region]
    assert np.median(err) < 0.5, f"median err {np.median(err):.3f}px"


def test_speckle_filter():
    from opencv_tpu.ops.sgbm import filter_speckles

    disp = np.full((40, 40), -1.0, np.float32)
    disp[5:25, 5:25] = 10.0  # 400 px blob: keep
    disp[30:33, 30:33] = 20.0  # 9 px speckle: kill
    out = np.asarray(
        filter_speckles(jnp.asarray(disp), -1.0, max_size=50, max_diff=1.0)
    )
    assert (out[5:25, 5:25] == 10.0).all()
    assert (out[30:33, 30:33] == -1.0).all()
