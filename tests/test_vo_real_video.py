"""End-to-end: the SLAM engine on REAL VIDEO, decoded by the framework's
OWN reader — zero cv2/ffmpeg anywhere in the path.

The clip is the reference's own benchmark video (samples/data/Megamind.avi,
re-encoded once into the framework's MJPEG-AVI container — provenance in
benchmarks/reencode_clips.py). Reference parity point: the TBD app's frame
loop consumes exactly this kind of clip (samples/gpu/tbd.cpp:498-554).

What a monocular VO engine must do on THIS clip is refuse: it is animated
content from a (near-)static camera — there is no translational parallax,
so any bootstrap would be a hallucinated trajectory. The assertions below
pin that behavior: frames flow end-to-end (decode -> detect -> match ->
two-view RANSAC attempt) in both tracker modes, features are found, and
the decisiveness gates keep the engine out of tracking state. KITTI/TUM
parity (BASELINE.md) stays blocked on dataset availability, not on code —
io/kitti.py is the ready loader; see COVERAGE.md.
"""

import os

import numpy as np
import pytest

from opencv_tpu.core.config import ORBConfig
from opencv_tpu.io.video import read_mjpeg_avi
from opencv_tpu.slam.vo import VisualOdometry, VOConfig

CLIP = os.path.join(
    os.path.dirname(__file__), "..", "benchmarks", "data", "megamind_gray.avi"
)

needs_clip = pytest.mark.skipif(
    not os.path.exists(CLIP), reason="committed clip transcode missing"
)


@pytest.fixture(scope="module")
def clip_frames():
    frames = read_mjpeg_avi(CLIP).astype(np.float32)[:40]
    # 2x2 box decimate: full-res engine runs belong on the TPU (bench.py);
    # the CPU test lane uses half resolution
    return 0.25 * (
        frames[:, ::2, ::2] + frames[:, 1::2, ::2]
        + frames[:, ::2, 1::2] + frames[:, 1::2, 1::2]
    )


@needs_clip
def test_own_decoder_provides_real_frames(clip_frames):
    f = clip_frames
    assert f.shape == (40, 264, 360)
    # real image statistics, not a broken decode: intensity spread and
    # per-frame change both nonzero
    assert f.std() > 20.0
    assert np.abs(np.diff(f, axis=0)).mean() > 0.3


@needs_clip
@pytest.mark.parametrize("tracker", ["orb", "klt"])
@pytest.mark.slow
def test_engine_on_real_video_refuses_parallax_free_bootstrap(
    clip_frames, tracker
):
    h, w = clip_frames.shape[1:]
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    vo = VisualOdometry(
        K, VOConfig(orb=ORBConfig(n_features=700), tracker=tracker)
    )
    for f in clip_frames:
        vo.process(f)
    # the engine ingested every frame and found real features
    assert len(vo.poses) == clip_frames.shape[0]
    assert len(vo.keyframes) >= 1
    kf0 = vo.keyframes[0]
    assert int(np.asarray(kf0.kp_valid).sum()) >= 100, "front-end found no features"
    # static-camera animated content: bootstrap must NOT fire, and the
    # reported trajectory must stay at the origin (no hallucinated motion)
    assert vo.state != "tracking"
    traj = vo.trajectory()
    assert float(np.linalg.norm(traj[-1] - traj[0])) == 0.0
