"""videoio (Y4M + MJPEG-AVI + capture facade) and viz tests."""

import os

import numpy as np

from opencv_tpu.io import video
from opencv_tpu.utils import viz


def test_y4m_roundtrip(tmp_path, rng):
    frames = rng.integers(0, 256, (5, 32, 48)).astype(np.uint8)
    p = str(tmp_path / "clip.y4m")
    video.write_y4m(p, frames, fps=30)
    back, fps = video.read_y4m(p)
    assert fps == 30
    np.testing.assert_array_equal(back, frames)


def test_mjpeg_avi_roundtrip(tmp_path, rng):
    # smooth frames so JPEG stays near-lossless
    base = rng.uniform(60, 200, (8, 8)).astype(np.float32)
    from opencv_tpu.core import imgproc
    import jax.numpy as jnp

    big = np.asarray(imgproc.resize_bilinear(jnp.asarray(base), 64, 96))
    frames = np.stack([np.roll(big, k, axis=1) for k in range(4)])
    p = str(tmp_path / "clip.avi")
    video.write_mjpeg_avi(p, frames, fps=10)
    back = video.read_mjpeg_avi(p)
    assert back.shape == (4, 64, 96)
    assert np.abs(back.astype(np.float32) - frames).mean() < 3.0


def test_video_capture_facade(tmp_path, rng):
    frames = rng.integers(0, 256, (3, 24, 32)).astype(np.uint8)
    p = str(tmp_path / "c.y4m")
    video.write_y4m(p, frames)
    cap = video.VideoCapture(p)
    assert cap.is_opened() and cap.frame_count() == 3
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(f)
    assert len(got) == 3
    np.testing.assert_allclose(got[1], frames[1].astype(np.float32))

    w = video.VideoWriter(str(tmp_path / "o.avi"), fps=5)
    for f in frames:
        w.write(f)
    w.release()
    assert video.VideoCapture(str(tmp_path / "o.avi")).frame_count() == 3


def test_draw_and_text(rng):
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    rgb = viz.to_rgb(img)
    viz.draw_rect(rgb, (10, 10, 20, 15), thickness=2)
    assert (rgb[10, 10:31] == (0, 255, 0)).all()
    out = viz.draw_keypoints(img, [[5, 5], [60, 40]], color=(255, 0, 0))
    assert tuple(out[5, 5]) == (255, 0, 0)
    viz.put_text(rgb, "FPS: 12.5", (2, 40))
    m = viz.draw_matches(img, [[5, 5]], img, [[6, 6]], [[0, 0]])
    assert m.shape == (48, 128, 3)


def test_trajectory_plots(tmp_path, rng):
    t = np.linspace(0, 4 * np.pi, 60)
    poses = np.stack([np.cos(t), 0.1 * t, np.sin(t)], 1)
    lm = rng.normal(0, 1, (100, 3))
    p3 = str(tmp_path / "traj.png")
    viz.plot_trajectory(p3, poses, gt_poses=poses + 0.05, landmarks=lm)
    p2 = str(tmp_path / "bird.png")
    viz.plot_birdseye(p2, poses)
    assert os.path.getsize(p3) > 5000
    assert os.path.getsize(p2) > 5000
