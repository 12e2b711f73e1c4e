"""Multi-object tracking-by-detection: the fork's signature module.

Behavioral parity with modules/trackingbydetection (the fork's addition):
- Detection / Track records with class ids and confidence
  (tbd.hpp:77-121)
- constant-velocity motion prediction (predictNewLocationsOfTracks,
  src/tbd.cpp:288)
- cost = 1 - IoU between predicted track boxes and detections
  (src/tbd.cpp:345-348)
- optimal assignment with a cost-of-non-assignment
  (solveAssignmentProblem / Munkres, src/tbd.cpp:381-905 — here the
  native Hungarian in opencv_tpu/native/munkres.cpp)
- track lifecycle: create on unassigned detection, age/visibility
  bookkeeping, delete stale tracks (Tracker::performTrackingStep,
  src/tbd.cpp:210)
- MOT metric counters TP/FN/FP/GT/overlap (tbd.hpp:146-151) -> MOTA/MOTP

TPU-native split: box prediction/update run as one batched Kalman step
over all tracks (ops/kalman.py); the IoU cost matrix is one vectorized
computation; only the O(n^3) assignment itself is host-native C++.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import kalman
from opencv_tpu.tbd.assignment import assign_with_unassigned_cost


@dataclasses.dataclass(frozen=True)
class TbdConfig:
    """Analog of TbdArgs (tbd.hpp:25-41)."""

    cost_of_non_assignment: float = 0.6  # in 1-IoU units
    invisible_threshold: int = 5  # consecutive misses before deletion
    min_age_threshold: int = 3  # age before a track counts as confirmed
    min_visibility_ratio: float = 0.5
    process_noise: float = 1e-2
    measurement_noise: float = 1e-1


@dataclasses.dataclass
class Track:
    """Analog of tbd::Track (tbd.hpp:96-121)."""

    track_id: int
    class_id: int
    bbox: np.ndarray  # [4] (x, y, w, h) current corrected box
    age: int = 1
    total_visible: int = 1
    consecutive_invisible: int = 0
    confidence: float = 1.0

    @property
    def confirmed(self) -> bool:
        return self.age >= 3 and self.total_visible / self.age >= 0.5


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (x, y, w, h) boxes: [Na, Nb]."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    a = np.asarray(boxes_a, np.float32)[:, None, :]
    b = np.asarray(boxes_b, np.float32)[None, :, :]
    x1 = np.maximum(a[..., 0], b[..., 0])
    y1 = np.maximum(a[..., 1], b[..., 1])
    x2 = np.minimum(a[..., 0] + a[..., 2], b[..., 0] + b[..., 2])
    y2 = np.minimum(a[..., 1] + a[..., 3], b[..., 1] + b[..., 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return (inter / np.maximum(union, 1e-9)).astype(np.float32)


class MotMetrics:
    """Per-frame MOT counters (tbd.hpp:146-151) and derived MOTA/MOTP."""

    def __init__(self):
        self.tp = 0
        self.fp = 0
        self.fn = 0
        self.gt = 0
        self.overlap_sum = 0.0

    def update(self, track_boxes, gt_boxes, iou_thresh=0.5):
        iou = iou_matrix(np.asarray(track_boxes), np.asarray(gt_boxes))
        self.gt += len(gt_boxes)
        if iou.size == 0:
            self.fp += len(track_boxes)
            self.fn += len(gt_boxes)
            return
        row_to_col, un_rows, un_cols = assign_with_unassigned_cost(
            1.0 - iou, 1.0 - iou_thresh
        )
        matched = row_to_col >= 0
        self.tp += int(matched.sum())
        self.fp += int((~matched).sum())
        self.fn += len(un_cols)
        self.overlap_sum += float(
            iou[np.flatnonzero(matched), row_to_col[matched]].sum()
        )

    @property
    def mota(self) -> float:
        return 1.0 - (self.fn + self.fp) / max(self.gt, 1)

    @property
    def motp(self) -> float:
        return self.overlap_sum / max(self.tp, 1)


class Tracker:
    """Analog of tbd::Tracker (tbd.hpp:139, src/tbd.cpp:210)."""

    def __init__(self, config: TbdConfig = TbdConfig()):
        self.cfg = config
        self.tracks: list[Track] = []
        self.next_id = 0
        F, H, Q, R, P0 = kalman.constant_velocity_model(
            4,
            process_noise=config.process_noise,
            measurement_noise=config.measurement_noise,
        )
        self._F, self._H, self._Q, self._R, self._P0 = F, H, Q, R, P0
        self._kf: Optional[kalman.KalmanState] = None  # batched over tracks

    # ---- internals ----

    def _predict(self) -> np.ndarray:
        """Advance all track filters one step; returns predicted boxes."""
        if not self.tracks:
            return np.zeros((0, 4), np.float32)
        self._kf = kalman.predict(self._kf, self._F, self._Q)
        return np.asarray(self._kf.x[:, :4])

    def _correct(self, idx: int, box: np.ndarray):
        st = kalman.KalmanState(self._kf.x[idx], self._kf.P[idx])
        st = kalman.correct(st, self._H, self._R, jnp.asarray(box, jnp.float32))
        self._kf = kalman.KalmanState(
            self._kf.x.at[idx].set(st.x), self._kf.P.at[idx].set(st.P)
        )

    def _add_track(self, box: np.ndarray, class_id: int, confidence: float):
        self.tracks.append(
            Track(self.next_id, class_id, np.asarray(box, np.float32),
                  confidence=confidence)
        )
        self.next_id += 1
        x0 = jnp.concatenate([jnp.asarray(box, jnp.float32), jnp.zeros(4)])
        if self._kf is None or len(self.tracks) == 1:
            self._kf = kalman.KalmanState(x0[None], self._P0[None])
        else:
            self._kf = kalman.KalmanState(
                jnp.concatenate([self._kf.x, x0[None]]),
                jnp.concatenate([self._kf.P, self._P0[None]]),
            )

    def _delete(self, keep_mask: np.ndarray):
        self.tracks = [t for t, k in zip(self.tracks, keep_mask) if k]
        if self._kf is not None and len(keep_mask):
            sel = jnp.asarray(np.flatnonzero(keep_mask))
            self._kf = kalman.KalmanState(self._kf.x[sel], self._kf.P[sel])
        if not self.tracks:
            self._kf = None

    # ---- public API ----

    def get_tracks(self):
        """Snapshot of the full track state (the reference app's
        getTracks, samples/gpu/tbd.cpp:704 — used by the
        --history_distribution stale-state experiments). Deep copy:
        mutating the live tracker never changes a stored snapshot."""
        import copy

        kf = None
        if self._kf is not None:
            kf = (np.asarray(self._kf.x), np.asarray(self._kf.P))
        return (copy.deepcopy(self.tracks), self.next_id, kf)

    def set_tracks(self, snapshot):
        """Restore a get_tracks() snapshot (the reference's setTracks,
        samples/gpu/tbd.cpp:685): the next step() runs against these
        possibly-stale tracks instead of the tracker's own latest."""
        import copy

        tracks, next_id, kf = snapshot
        self.tracks = copy.deepcopy(tracks)
        self.next_id = next_id
        if kf is None:
            self._kf = None
        else:
            self._kf = kalman.KalmanState(
                jnp.asarray(kf[0]), jnp.asarray(kf[1])
            )

    def reset(self):
        """Drop all tracks (the reference's Tracker::reset)."""
        self.tracks = []
        self.next_id = 0
        self._kf = None

    def step(
        self,
        det_boxes: np.ndarray,
        det_classes: np.ndarray | None = None,
        det_confidences: np.ndarray | None = None,
    ) -> list[Track]:
        """One tracking step (performTrackingStep, src/tbd.cpp:210).
        det_boxes: [D,4] (x, y, w, h). Returns the live confirmed tracks.
        """
        det_boxes = np.asarray(det_boxes, np.float32).reshape(-1, 4)
        d = det_boxes.shape[0]
        if det_classes is None:
            det_classes = np.zeros(d, np.int64)
        if det_confidences is None:
            det_confidences = np.ones(d, np.float32)

        predicted = self._predict()
        iou = iou_matrix(predicted, det_boxes)
        cost = 1.0 - iou
        row_to_col, un_tracks, un_dets = assign_with_unassigned_cost(
            cost, self.cfg.cost_of_non_assignment
        )

        # update assigned tracks
        for ti, di in enumerate(row_to_col):
            tr = self.tracks[ti]
            if di >= 0:
                self._correct(ti, det_boxes[di])
                tr.bbox = np.asarray(self._kf.x[ti, :4])
                tr.age += 1
                tr.total_visible += 1
                tr.consecutive_invisible = 0
                tr.confidence = float(det_confidences[di])
            else:
                tr.bbox = predicted[ti]
                tr.age += 1
                tr.consecutive_invisible += 1

        # delete stale
        keep = np.array(
            [
                t.consecutive_invisible <= self.cfg.invisible_threshold
                and (
                    t.age < self.cfg.min_age_threshold
                    or t.total_visible / t.age >= self.cfg.min_visibility_ratio
                )
                for t in self.tracks
            ],
            bool,
        ) if self.tracks else np.zeros(0, bool)
        self._delete(keep)

        # create tracks for unassigned detections
        for di in un_dets:
            self._add_track(det_boxes[di], int(det_classes[di]),
                            float(det_confidences[di]))

        return [t for t in self.tracks if t.confirmed]
