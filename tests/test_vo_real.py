"""End-to-end monocular VO on REAL-IMAGERY renders: a camera trajectory
through a piecewise-planar scene textured with the reference's own
sample photographs (utils/synth.py), so the front-end sees real-world
gradients and descriptor statistics. Covers both engine tracker modes:
per-frame ORB re-matching and KLT inter-keyframe tracking (the reference
pipeline shape, video/src/lkpyramid.cpp).

Also locks in the planar-degeneracy fixes this scene exposed: P3P RANSAC
kernel (coplanar-safe), parallax-gated bootstrap, pixel-domain
thresholds (camera-independent gates).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from opencv_tpu.core.config import ORBConfig
from opencv_tpu.slam.vo import VisualOdometry, VOConfig
from opencv_tpu.utils.evaluate import ate_rmse
from opencv_tpu.utils.synth import render_sequence, two_plane_scene

REF_DATA = "/root/reference/samples/data"

H, W = 240, 320
F = 260.0
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def _load_gray(name):
    from PIL import Image

    return np.asarray(Image.open(f"{REF_DATA}/{name}").convert("L"), np.float32)


needs_ref_data = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample images not present"
)


@pytest.fixture(scope="module")
def real_sequence():
    tex = _load_gray("baboon.jpg")
    tex2 = _load_gray("fruits.jpg")
    frames, gt = render_sequence(
        tex, K, H, W, n_frames=22, planes=two_plane_scene(tex, tex2)
    )
    return frames, gt


@needs_ref_data
@pytest.mark.parametrize("tracker", ["orb", "klt"])
def test_vo_real_texture_ate(real_sequence, tracker):
    frames, gt = real_sequence
    vo = VisualOdometry(
        K,
        VOConfig(
            orb=ORBConfig(n_features=700),
            tracker=tracker,
            keyframe_min_baseline=0.04,
            n_hypotheses=768,
        ),
    )
    for f in frames:
        vo.process(f)
    assert vo.state == "tracking", "engine failed to bootstrap"
    traj = vo.trajectory()
    ate = ate_rmse(traj, gt)
    span = np.linalg.norm(gt[-1] - gt[0])
    # Sim(3)-aligned ATE within 10% of trajectory span on real texture
    assert ate / span < 0.10, f"{tracker}: ATE {ate:.4f} over span {span:.3f}"
    # the estimate must actually travel (not freeze at bootstrap)
    est_span = np.linalg.norm(traj[-1] - traj[0])
    assert est_span > 0.2 * span
