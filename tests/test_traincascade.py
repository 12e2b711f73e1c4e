"""Cascade training end-to-end (apps/traincascade analog): train on
synthetic object crops, evaluate with the framework's OWN cascade
detector on held-out data at a fixed false-alarm budget.

Reference: apps/traincascade/traincascade.cpp:1,
cascadeclassifier.cpp (stage loop), boost.cpp (GAB stumps)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ml import traincascade
from opencv_tpu.ops import cascade as casc

pytestmark = pytest.mark.slow

WIN = (16, 16)


def _make_object(rng, jitter=1.0):
    """A bright ring on dark ground — orientation-free, Haar-friendly."""
    wh, ww = WIN
    yy, xx = np.mgrid[0:wh, 0:ww].astype(np.float32)
    cy = wh / 2 - 0.5 + rng.uniform(-jitter, jitter)
    cx = ww / 2 - 0.5 + rng.uniform(-jitter, jitter)
    r = np.hypot(yy - cy, xx - cx)
    ring = np.exp(-((r - 4.5) ** 2) / 3.0)
    img = 40 + 170 * ring + rng.normal(0, 8, (wh, ww))
    return np.clip(img, 0, 255).astype(np.float32)


def _make_background(rng, h=80, w=80):
    img = rng.uniform(20, 200, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    img += rng.normal(0, 12, (h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    pos = np.stack([_make_object(rng) for _ in range(400)])
    negs = [_make_background(rng) for _ in range(40)]
    model = traincascade.train_cascade(
        pos, negs, window=WIN, n_stages=5, max_weak_per_stage=12,
        n_neg_per_stage=600, pos_step=3, size_step=3, seed=1,
    )
    return model, rng


def test_trained_cascade_classifies_heldout(trained):
    model, rng = trained
    assert len(model.stage_thresholds) >= 3
    # held-out positives / negative crops through the DENSE evaluator
    pos = np.stack([_make_object(rng) for _ in range(200)])
    hits = 0
    for p in pos:
        acc = np.asarray(casc.cascade_score_map(jnp.asarray(p), model))
        hits += bool(acc.any())
    tpr = hits / len(pos)
    wh, ww = WIN
    fa = 0
    n_neg = 200
    for _ in range(n_neg):
        bg = _make_background(rng, 2 * wh, 2 * ww)
        crop = bg[:wh, :ww]
        acc = np.asarray(casc.cascade_score_map(jnp.asarray(crop), model))
        fa += bool(acc.any())
    fpr = fa / n_neg
    assert tpr >= 0.9, tpr
    # stage FA budget: <= max_false_alarm^n_stages + slack; with >=3
    # stages of 0.5 the crop-level budget is ~0.125 — allow 2x slack
    assert fpr <= 0.3, fpr


def test_trained_cascade_detects_in_scene(trained):
    model, rng = trained
    wh, ww = WIN
    scene = _make_background(rng, 96, 128)
    obj = _make_object(rng, jitter=0.0)
    oy, ox = 40, 70
    scene[oy : oy + wh, ox : ox + ww] = obj
    acc = np.asarray(casc.cascade_score_map(jnp.asarray(scene), model))
    ys, xs = np.nonzero(acc)
    assert len(ys), "no detection in scene"
    d = np.hypot(ys - oy, xs - ox).min()
    assert d <= 3.0, (d, list(zip(ys, xs))[:5])


def test_trained_lbp_cascade(trained):
    """LBP variant (-featureType LBP): train, then evaluate held-out
    crops with the framework's LBP score machinery."""
    from opencv_tpu.ml.traincascade import train_cascade_lbp
    from opencv_tpu.ops.cascade import _lbp_scale_impl

    rng = np.random.default_rng(3)
    pos = np.stack([_make_object(rng) for _ in range(300)])
    negs = [_make_background(rng) for _ in range(30)]
    model = train_cascade_lbp(
        pos, negs, window=WIN, n_stages=4, max_weak_per_stage=10,
        n_neg_per_stage=500, pos_step=2, seed=2,
    )
    assert len(model.stage_thresholds) >= 3

    hits = 0
    pos_hold = np.stack([_make_object(rng) for _ in range(150)])
    for p in pos_hold:
        acc = np.asarray(_lbp_scale_impl(jnp.asarray(p), model))
        hits += bool(acc.any())
    tpr = hits / len(pos_hold)
    fa = 0
    for _ in range(150):
        bg = _make_background(rng, 2 * WIN[0], 2 * WIN[1])
        acc = np.asarray(
            _lbp_scale_impl(jnp.asarray(bg[: WIN[0], : WIN[1]]), model)
        )
        fa += bool(acc.any())
    fpr = fa / 150
    assert tpr >= 0.9, tpr
    assert fpr <= 0.35, fpr


def test_cascade_xml_roundtrip(trained, tmp_path):
    """save_opencv_cascade emits the traincascade XML artifact: our own
    loader round-trips it exactly, and cv2.CascadeClassifier loads it."""
    from opencv_tpu.ml.traincascade import save_opencv_cascade
    from opencv_tpu.ops.cascade import load_opencv_cascade

    model, rng = trained
    path = str(tmp_path / "trained.xml")
    save_opencv_cascade(model, path)

    back = load_opencv_cascade(path)
    assert back.window == model.window
    np.testing.assert_allclose(back.rects, model.rects)
    np.testing.assert_array_equal(back.feature, model.feature)
    np.testing.assert_allclose(back.threshold, model.threshold, rtol=1e-6)
    np.testing.assert_allclose(back.left, model.left, rtol=1e-6)
    np.testing.assert_allclose(back.right, model.right, rtol=1e-6)
    np.testing.assert_allclose(back.stage_thresholds,
                               model.stage_thresholds, rtol=1e-6)

    import cv2
    if not hasattr(cv2, "CascadeClassifier"):
        # OpenCV 5 moved cascades out of the main module; the roundtrip
        # through our own loader above is the format assertion
        return
    clf = cv2.CascadeClassifier(path)
    assert not clf.empty(), "cv2 refused the exported cascade XML"
    scene = _make_background(rng, 96, 128)
    obj = _make_object(rng, jitter=0.0)
    scene[40:40 + WIN[0], 70:70 + WIN[1]] = obj
    dets = clf.detectMultiScale(
        np.clip(scene, 0, 255).astype(np.uint8), scaleFactor=1.1,
        minNeighbors=1,
    )
    dets = np.asarray(dets).reshape(-1, 4)
    assert len(dets), "cv2 found nothing with the exported cascade"
    centers = dets[:, :2] + dets[:, 2:] / 2
    target = np.array([70 + WIN[1] / 2, 40 + WIN[0] / 2])
    assert (np.linalg.norm(centers - target, axis=1) < 12).any(), dets


def test_lbp_cascade_xml_roundtrip(tmp_path):
    """LBP export round-trips through the framework's LBP loader."""
    from opencv_tpu.ml.traincascade import (
        save_opencv_lbp_cascade, train_cascade_lbp,
    )
    from opencv_tpu.ops.cascade import load_opencv_lbp_cascade

    rng = np.random.default_rng(9)
    pos = np.stack([_make_object(rng) for _ in range(150)])
    negs = [_make_background(rng) for _ in range(15)]
    model = train_cascade_lbp(
        pos, negs, window=WIN, n_stages=2, max_weak_per_stage=6,
        n_neg_per_stage=300, pos_step=3, seed=4,
    )
    path = str(tmp_path / "lbp.xml")
    save_opencv_lbp_cascade(model, path)
    back = load_opencv_lbp_cascade(path)
    assert back.window == model.window
    np.testing.assert_array_equal(back.rects, model.rects)
    np.testing.assert_array_equal(back.feature, model.feature)
    np.testing.assert_array_equal(
        back.subsets.astype(np.uint32), model.subsets.astype(np.uint32)
    )
    np.testing.assert_allclose(back.left, model.left, rtol=1e-6)
    np.testing.assert_allclose(back.right, model.right, rtol=1e-6)
