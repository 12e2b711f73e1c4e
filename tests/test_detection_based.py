"""DetectionBasedTracker test (objdetect detection_based_tracker.cpp
analog): a textured square moves across frames; the detector only fires
every 4th frame, optical flow carries the box in between."""

import numpy as np

from opencv_tpu.tbd.detection_based import DetectionBasedTracker


def _frame(rng_tex, pos, h=96, w=128, size=28):
    img = np.full((h, w), 60.0, np.float32)
    x, y = int(pos[0]), int(pos[1])
    img[y:y + size, x:x + size] = rng_tex
    return img


def test_detection_based_tracking_between_detections(rng):
    size = 28
    tex = rng.uniform(100, 255, (size, size)).astype(np.float32)
    true_pos = [(10 + 3 * t, 20 + 2 * t) for t in range(10)]
    frames = [_frame(tex, p) for p in true_pos]

    calls = []

    def detector(img):
        calls.append(1)
        # "ground-truth" detector: bright-region bounding box
        ys, xs = np.where(img > 90)
        if len(xs) == 0:
            return np.zeros((0, 4), np.float32)
        return np.array(
            [[xs.min(), ys.min(), xs.max() - xs.min(), ys.max() - ys.min()]],
            np.float32,
        )

    dbt = DetectionBasedTracker(detector, detect_interval=4)
    last = None
    for k, f in enumerate(frames):
        tracks = dbt.process_frame(f)
        if k >= 3:
            assert len(tracks) == 1, k
            last = tracks[0]
            cx = last.bbox[0] + last.bbox[2] / 2
            cy = last.bbox[1] + last.bbox[3] / 2
            want = (true_pos[k][0] + size / 2, true_pos[k][1] + size / 2)
            assert abs(cx - want[0]) < 6 and abs(cy - want[1]) < 6, (
                k, (cx, cy), want
            )
    # detector ran only on every 4th frame
    assert len(calls) == 3  # frames 0, 4, 8
    assert last.track_id == 0 or last.track_id >= 0
