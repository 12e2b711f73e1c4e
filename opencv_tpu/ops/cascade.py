"""Haar cascade object detection, TPU-native.

Reference: CPU cascades (objdetect/src/cascadedetect.cpp, haar.cpp) and
the GPU NCV implementation (cudalegacy/src/cuda/NCVHaarObjectDetection.cu);
trained models ship as XML (data/haarcascades*).

TPU-native re-design: the reference evaluates windows one at a time with
per-window early exit. Here every stage is evaluated DENSELY for all
window positions at once — each Haar rectangle sum is four shifted reads
of the integral image, each stump an elementwise select, each stage a
sum — and the cascade's early-exit becomes a running boolean mask
multiplied through the stages (rejected windows keep computing but cost
nothing extra in lockstep SIMD; the win is zero divergence).

The XML loader reads the modern OpenCV cascade format (stump-based,
e.g. haarcascade_frontalface_default.xml).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import masked_top_k


class CascadeModel(NamedTuple):
    """Stump-based cascade.

    window: (h, w) base window.
    rects: [F, 3, 5] up to 3 weighted rects (x, y, w, h, weight) per feature.
    stumps: per weak classifier: feature index, threshold, left val, right val.
      feature [S_total] i32, threshold/left/right [S_total] f32.
    stage_offsets: [n_stages + 1] i32 — stumps of stage s are
      [offsets[s], offsets[s+1]).
    stage_thresholds: [n_stages] f32.
    """

    window: tuple[int, int]
    rects: np.ndarray
    feature: np.ndarray
    threshold: np.ndarray
    left: np.ndarray
    right: np.ndarray
    stage_offsets: np.ndarray
    stage_thresholds: np.ndarray


def load_opencv_cascade(path: str) -> CascadeModel:
    """Parse a modern-format OpenCV Haar cascade XML."""
    root = ET.parse(path).getroot()
    c = root.find("cascade")
    if c is None:
        raise ValueError("old-format cascade not supported")
    wh = (int(c.findtext("height")), int(c.findtext("width")))
    feats = []
    for f in c.find("features"):
        rects = np.zeros((3, 5), np.float32)
        for i, r in enumerate(f.find("rects")):
            vals = r.text.split()
            rects[i] = [float(v) for v in vals[:4]] + [float(vals[4])]
        feats.append(rects)
    rects = np.stack(feats)
    feature, threshold, left, right = [], [], [], []
    offsets = [0]
    thresholds = []
    for stage in c.find("stages"):
        thresholds.append(float(stage.findtext("stageThreshold")))
        for wc in stage.find("weakClassifiers"):
            inter = wc.findtext("internalNodes").split()
            leaf = wc.findtext("leafValues").split()
            feature.append(int(inter[2]))
            threshold.append(float(inter[3]))
            left.append(float(leaf[0]))
            right.append(float(leaf[1]))
        offsets.append(len(feature))
    return CascadeModel(
        window=wh,
        rects=rects,
        feature=np.asarray(feature, np.int32),
        threshold=np.asarray(threshold, np.float32),
        left=np.asarray(left, np.float32),
        right=np.asarray(right, np.float32),
        stage_offsets=np.asarray(offsets, np.int32),
        stage_thresholds=np.asarray(thresholds, np.float32),
    )


def _window_sums(ii: jnp.ndarray, y0, x0, h, w, out_h, out_w):
    """Rect sums for all window origins: [out_h, out_w]."""
    return (
        ii[y0 + h : y0 + h + out_h, x0 + w : x0 + w + out_w]
        - ii[y0 + h : y0 + h + out_h, x0 : x0 + out_w]
        - ii[y0 : y0 + out_h, x0 + w : x0 + w + out_w]
        + ii[y0 : y0 + out_h, x0 : x0 + out_w]
    )


def cascade_score_map(img: jnp.ndarray, model: CascadeModel) -> jnp.ndarray:
    """Dense cascade evaluation at the model's native scale.
    Returns acceptance mask [H - wh + 1, W - ww + 1] (True = all stages
    passed)."""
    wh, ww = model.window
    h, w = img.shape
    out_h, out_w = h - wh + 1, w - ww + 1
    img = img.astype(jnp.float32)
    ii = imgproc.integral(img)
    ii2 = imgproc.integral(img * img)
    area = float(wh * ww)
    s1 = _window_sums(ii, 0, 0, wh, ww, out_h, out_w)
    s2 = _window_sums(ii2, 0, 0, wh, ww, out_h, out_w)
    mean = s1 / area
    var = jnp.maximum(s2 / area - mean * mean, 1.0)
    inv_norm = 1.0 / jnp.sqrt(var)  # varNormFactor (cascadedetect.cpp)

    # per-feature maps, built lazily per stump to bound memory
    accept = jnp.ones((out_h, out_w), bool)
    n_stages = len(model.stage_thresholds)
    for s in range(n_stages):
        stage_sum = jnp.zeros((out_h, out_w), jnp.float32)
        for k in range(model.stage_offsets[s], model.stage_offsets[s + 1]):
            fidx = int(model.feature[k])
            fsum = jnp.zeros((out_h, out_w), jnp.float32)
            for r in range(3):
                x0, y0, rw, rh, wt = model.rects[fidx, r]
                if wt == 0.0:
                    continue
                fsum = fsum + wt * _window_sums(
                    ii, int(y0), int(x0), int(rh), int(rw), out_h, out_w
                )
            # normalized stump (threshold scales with window std)
            pred = fsum * inv_norm / area < model.threshold[k] * 1.0
            stage_sum = stage_sum + jnp.where(
                pred, model.left[k], model.right[k]
            )
        accept = accept & (stage_sum >= model.stage_thresholds[s])
    return accept


def detect_multi_scale(
    img: jnp.ndarray,
    model: CascadeModel,
    scale0: float = 1.2,
    n_scales: int = 6,
    max_detections: int = 64,
):
    """Multi-scale cascade detection; returns (boxes [K,4] xywh,
    valid [K])."""
    h, w = img.shape
    wh, ww = model.window
    boxes, valids = [], []
    for si in range(n_scales):
        s = scale0 ** si
        sh, sw = int(h / s), int(w / s)
        if sh < wh or sw < ww:
            break
        scaled = imgproc.resize_bilinear(img, sh, sw) if si else img.astype(jnp.float32)
        acc = cascade_score_map(scaled, model)
        oh, ow = acc.shape
        score = acc.astype(jnp.float32)
        idx, keep = masked_top_k(score.reshape(-1), acc.reshape(-1), max_detections)
        ys = (idx // ow).astype(jnp.float32) * s
        xs = (idx % ow).astype(jnp.float32) * s
        boxes.append(
            jnp.stack([xs, ys, jnp.full_like(xs, ww * s), jnp.full_like(ys, wh * s)], -1)
        )
        valids.append(keep)
    if not boxes:
        return jnp.zeros((max_detections, 4)), jnp.zeros((max_detections,), bool)
    b = jnp.concatenate(boxes)
    v = jnp.concatenate(valids)
    idx, keep = masked_top_k(v.astype(jnp.float32), v, max_detections)
    return b[idx], keep
