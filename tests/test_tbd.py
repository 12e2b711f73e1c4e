"""Tracking-by-detection tests: assignment vs scipy gold, Kalman sanity,
tracker lifecycle on synthetic crossing objects, MOT metrics."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from opencv_tpu.ops import kalman
from opencv_tpu.tbd import MotMetrics, TbdConfig, Tracker
from opencv_tpu.tbd.assignment import (
    assign_with_unassigned_cost,
    linear_assignment,
    _solve_native,
    _solve_numpy,
)
from opencv_tpu.tbd.tracker import iou_matrix


# ---------- assignment ----------

def total_cost(cost, assign):
    return sum(cost[r, c] for r, c in enumerate(assign) if c >= 0)


def test_hungarian_matches_scipy(rng):
    for (n, m) in [(5, 5), (8, 12), (12, 8), (1, 1), (3, 7)]:
        cost = rng.uniform(0, 10, size=(n, m))
        got = linear_assignment(cost)
        ri, ci = linear_sum_assignment(cost)
        assert abs(total_cost(cost, got) - cost[ri, ci].sum()) < 1e-9, (n, m)
        # every assignment is a valid matching
        cols = [c for c in got if c >= 0]
        assert len(cols) == len(set(cols))


def test_native_munkres_available_and_agrees(rng):
    cost = rng.uniform(0, 5, size=(10, 10))
    native = _solve_native(cost)
    assert native is not None, "C++ munkres failed to build/load"
    ri, ci = linear_sum_assignment(cost)
    assert abs(total_cost(cost, native) - cost[ri, ci].sum()) < 1e-9
    fallback = _solve_numpy(cost)
    assert abs(total_cost(cost, fallback) - cost[ri, ci].sum()) < 1e-9


def test_assign_with_unassigned_cost():
    # 2 tracks, 3 detections; track 1 has no plausible detection.
    # Semantics of the padded square (same as the reference's Munkres
    # padding): a match of cost c beats non-assignment iff
    # c < 2 * cost_unassigned (both parties pay when unmatched).
    cost = np.array([[0.1, 0.9, 0.9], [0.9, 0.95, 0.9]])
    r2c, un_r, un_c = assign_with_unassigned_cost(cost, 0.4)
    assert r2c[0] == 0
    assert r2c[1] == -1  # 0.9 > 2 * 0.4 -> unassigned
    assert 1 in un_c and 2 in un_c
    # with a laxer cost the 0.9 match is accepted
    r2c2, _, _ = assign_with_unassigned_cost(cost, 0.5)
    assert r2c2[0] == 0 and r2c2[1] == 2


# ---------- kalman ----------

def test_kalman_constant_velocity_tracks_line():
    F, H, Q, R, P0 = kalman.constant_velocity_model(2, measurement_noise=1e-3)
    st = kalman.KalmanState(jnp.zeros(4), P0)
    rng = np.random.default_rng(0)
    for t in range(1, 30):
        st = kalman.predict(st, F, Q)
        z = jnp.asarray([2.0 * t, -1.0 * t]) + rng.normal(0, 0.01, 2)
        st = kalman.correct(st, H, R, z)
    x = np.asarray(st.x)
    np.testing.assert_allclose(x[2:], [2.0, -1.0], atol=0.1)  # velocity learned


def test_kalman_batched_matches_loop(rng):
    F, H, Q, R, P0 = kalman.constant_velocity_model(2)
    n = 5
    xs = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    batched = kalman.KalmanState(xs, jnp.tile(P0[None], (n, 1, 1)))
    batched = kalman.predict(batched, F, Q)
    z = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    batched = kalman.correct(batched, H, R, z)
    for i in range(n):
        single = kalman.KalmanState(xs[i], P0)
        single = kalman.predict(single, F, Q)
        single = kalman.correct(single, H, R, z[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]), np.asarray(single.x), atol=1e-4)


# ---------- iou ----------

def test_iou_matrix_values():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]], np.float32)
    iou = iou_matrix(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


# ---------- tracker ----------

def simulate_tracks(n_frames=30):
    """Two objects crossing paths + noise detections."""
    rng = np.random.default_rng(5)
    gt = []
    for t in range(n_frames):
        b1 = [10 + 4 * t, 20, 12, 24]
        b2 = [150 - 4 * t, 22, 12, 24]
        gt.append(np.array([b1, b2], np.float32))
    return gt


def test_tracker_maintains_identity_through_crossing():
    gt = simulate_tracks()
    trk = Tracker(TbdConfig())
    id_history = {0: set(), 1: set()}
    for frame, boxes in enumerate(gt):
        trk.step(boxes + np.random.default_rng(frame).normal(0, 0.3, boxes.shape))
        if frame >= 3:
            confirmed = [t for t in trk.tracks if t.confirmed]
            assert len(confirmed) == 2, f"frame {frame}: {len(confirmed)}"
            # associate by position to gt
            iou = iou_matrix(np.stack([t.bbox for t in confirmed]), boxes)
            for gi in range(2):
                ti = int(np.argmax(iou[:, gi]))
                assert iou[ti, gi] > 0.3
                id_history[gi].add(confirmed[ti].track_id)
    # identities stay consistent (no fragmentation)
    assert len(id_history[0]) == 1
    assert len(id_history[1]) == 1
    assert id_history[0] != id_history[1]


def test_tracker_coasts_and_deletes():
    trk = Tracker(TbdConfig(invisible_threshold=3))
    box = np.array([[50, 50, 20, 20]], np.float32)
    for _ in range(5):
        trk.step(box)
    assert len(trk.tracks) == 1
    # object disappears: track coasts then dies
    for i in range(10):
        trk.step(np.zeros((0, 4), np.float32))
    assert len(trk.tracks) == 0


def test_tracker_new_object_creates_track():
    trk = Tracker()
    trk.step(np.array([[10, 10, 5, 5]], np.float32))
    assert len(trk.tracks) == 1
    trk.step(np.array([[10, 10, 5, 5], [100, 100, 8, 8]], np.float32))
    assert len(trk.tracks) == 2


def test_mot_metrics_perfect_and_misses():
    m = MotMetrics()
    gt = np.array([[0, 0, 10, 10], [50, 50, 10, 10]], np.float32)
    m.update(gt, gt)  # perfect frame
    assert m.tp == 2 and m.fp == 0 and m.fn == 0
    m.update(gt[:1], gt)  # one miss
    assert m.fn == 1
    assert 0 < m.mota <= 1.0
    assert m.motp > 0.99


def test_tracker_snapshot_roundtrip():
    """get_tracks/set_tracks (the --history_distribution machinery,
    samples/gpu/tbd.cpp:685,704): restoring a snapshot must reproduce
    the same tracking trajectory as never having stepped past it."""
    from opencv_tpu.tbd import TbdConfig, Tracker

    det = [np.array([[10.0 + 3 * t, 20.0, 12, 20]], np.float32)
           for t in range(8)]
    tr = Tracker(TbdConfig())
    for t in range(4):
        tr.step(det[t])
    snap = tr.get_tracks()
    # advance the live tracker two more steps, then restore
    tr.step(det[4])
    tr.step(det[5])
    boxes_diverged = [t.bbox.copy() for t in tr.tracks]
    tr.set_tracks(snap)
    out = tr.step(det[4])
    # a second tracker that never diverged
    tr2 = Tracker(TbdConfig())
    for t in range(4):
        tr2.step(det[t])
    out2 = tr2.step(det[4])
    assert len(tr.tracks) == len(tr2.tracks)
    for a, b in zip(tr.tracks, tr2.tracks):
        np.testing.assert_allclose(a.bbox, b.bbox, atol=1e-5)
    # and reset() empties
    tr.reset()
    assert tr.tracks == [] and tr.step(det[0]) == []
