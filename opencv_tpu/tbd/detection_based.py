"""DetectionBasedTracker — heavy detection at intervals, cheap optical-
flow rectangle tracking in between.

Reference: objdetect/src/detection_based_tracker.cpp: a background
thread runs the cascade detector every few frames while the main loop
keeps rectangles alive with a lightweight tracker, and detections are
reconciled with tracked rectangles by overlap.

TPU-native re-expression: the "two cadences" survive (that's the point
of the component) but both run on-device synchronously — the detector
every `detect_interval` frames, pyramidal LK (ops/lk.py) on GFTT
features inside each live rectangle every frame, the median feature
displacement moving the box (the same median-flow idea the reference's
`weightsSizesSmoothing` update approximates). Track lifecycle reuses the
fork's TBD machinery (tbd/tracker.py) instead of the reference's ad-hoc
numTrackedSteps counters."""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax.numpy as jnp

from opencv_tpu.ops import gftt, lk
from opencv_tpu.tbd.tracker import TbdConfig, Tracker


class DetectionBasedTracker:
    """detector(img [H,W] f32) -> boxes np [D,4] (x, y, w, h)."""

    def __init__(
        self,
        detector: Callable[[np.ndarray], np.ndarray],
        detect_interval: int = 4,
        max_track_points: int = 32,
        config: TbdConfig | None = None,
    ):
        self.detector = detector
        self.detect_interval = detect_interval
        self.max_track_points = max_track_points
        self.tracker = Tracker(config or TbdConfig())
        self._frame_idx = 0
        self._prev: np.ndarray | None = None

    def _flow_boxes(self, prev: np.ndarray, cur: np.ndarray,
                    boxes: np.ndarray) -> np.ndarray:
        """Shift each box by the median LK displacement of GFTT corners
        found inside it."""
        if len(boxes) == 0:
            return boxes
        jp, jc = jnp.asarray(prev), jnp.asarray(cur)
        out = boxes.copy()
        for i, (x, y, w, h) in enumerate(boxes):
            x0, y0 = int(max(x, 0)), int(max(y, 0))
            x1 = int(min(x + w, prev.shape[1]))
            y1 = int(min(y + h, prev.shape[0]))
            if x1 - x0 < 8 or y1 - y0 < 8:
                continue
            roi = jp[y0:y1, x0:x1]
            kp = gftt.good_features_to_track(roi, self.max_track_points)
            pts = np.asarray(kp.xy) + [x0, y0]
            valid = np.asarray(kp.valid)
            if valid.sum() < 3:
                continue
            new_pts, status, _ = lk.calc_optical_flow_pyr_lk(
                jp, jc, jnp.asarray(pts, jnp.float32),
                jnp.asarray(valid),
            )
            ok = np.asarray(status) & valid
            if ok.sum() < 3:
                continue
            d = np.median(np.asarray(new_pts)[ok] - pts[ok], axis=0)
            out[i, 0] += d[0]
            out[i, 1] += d[1]
        return out

    def process_frame(self, img: np.ndarray):
        """Advance one frame; returns the live confirmed tracks."""
        img = np.asarray(img, np.float32)
        run_detector = self._frame_idx % self.detect_interval == 0

        if self._prev is not None and self.tracker.tracks:
            # per-frame cheap pass: feed the flow-moved boxes to each
            # track's Kalman filter as measurements
            boxes = np.stack([t.bbox for t in self.tracker.tracks])
            moved = self._flow_boxes(self._prev, img, boxes)
            for i, (t, b) in enumerate(zip(self.tracker.tracks, moved)):
                self.tracker._correct(i, b.astype(np.float32))
                t.bbox = b.astype(np.float32)

        if run_detector:
            det = np.asarray(self.detector(img), np.float32).reshape(-1, 4)
            tracks = self.tracker.step(det)
        else:
            # flow-tracked frames count as visible frames for lifecycle
            # (the reference's tracked rectangles keep their tracks alive
            # between detector runs)
            for t in self.tracker.tracks:
                t.age += 1
                t.total_visible += 1
            tracks = [t for t in self.tracker.tracks if t.confirmed]

        self._prev = img
        self._frame_idx += 1
        return tracks
