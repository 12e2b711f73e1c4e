"""Haar cascade tests: dense evaluation with a hand-built cascade, and
XML loader round-trip against a reference-format file when available."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_tpu.ops import cascade


def tiny_model():
    """One-stage cascade for a 8x8 'face': bright top half, dark bottom."""
    rects = np.zeros((1, 3, 5), np.float32)
    # feature = full window * 1 + bottom half * (-2): positive for bright-top
    rects[0, 0] = [0, 0, 8, 8, 1.0]
    rects[0, 1] = [0, 4, 8, 4, -2.0]
    return cascade.CascadeModel(
        window=(8, 8),
        rects=rects,
        feature=np.array([0], np.int32),
        threshold=np.array([0.3], np.float32),
        left=np.array([0.0], np.float32),   # value when feat < thr
        right=np.array([1.0], np.float32),  # value when feat >= thr
        stage_offsets=np.array([0, 1], np.int32),
        stage_thresholds=np.array([0.5], np.float32),
    )


def test_dense_cascade_localizes_pattern(rng):
    img = rng.uniform(90, 110, size=(40, 48)).astype(np.float32)
    # plant bright-top/dark-bottom pattern at (y=12, x=20)
    img[12:16, 20:28] = 220.0
    img[16:20, 20:28] = 30.0
    model = tiny_model()
    acc = np.asarray(cascade.cascade_score_map(jnp.asarray(img), model))
    assert acc[12, 20]
    # background windows rejected
    assert acc.mean() < 0.1


def test_detect_multi_scale_finds_scaled_pattern(rng):
    img = rng.uniform(90, 110, size=(64, 64)).astype(np.float32)
    # pattern at 2x window scale (16x16) at (y=24, x=30)
    img[24:32, 30:46] = 220.0
    img[32:40, 30:46] = 30.0
    boxes, valid = cascade.detect_multi_scale(
        jnp.asarray(img), tiny_model(), scale0=1.25, n_scales=6
    )
    boxes = np.asarray(boxes)[np.asarray(valid)]
    assert len(boxes) >= 1
    # some detection overlaps the pattern center (38, 32)
    hit = any(
        b[0] <= 38 <= b[0] + b[2] and b[1] <= 32 <= b[1] + b[3] for b in boxes
    )
    assert hit


REF_XML = "/root/reference/data/haarcascades/haarcascade_frontalface_default.xml"


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference data absent")
def test_loader_parses_reference_cascade():
    model = cascade.load_opencv_cascade(REF_XML)
    assert model.window == (24, 24)
    assert len(model.stage_thresholds) > 10
    assert model.stage_offsets[-1] == len(model.feature)
    assert model.rects.shape[1:] == (3, 5)
    # thresholds/leaves finite
    assert np.isfinite(model.threshold).all()
    assert np.isfinite(model.stage_thresholds).all()
