"""Haar cascade object detection, TPU-native.

Reference: CPU cascades (objdetect/src/cascadedetect.cpp,
cascadedetect.hpp:356 HaarEvaluator, :570 predictOrderedStump) and the
GPU NCV implementation (cudalegacy/src/cuda/NCVHaarObjectDetection.cu);
trained models ship as XML (data/haarcascades*).

Normalization matches the reference exactly (cascadedetect.cpp:717
HaarEvaluator::setWindow): the window statistic is computed over the
NORM RECT (window inset by 1 px), nf = sqrt(narea*sqsum - sum^2)
(= narea * std), each stump feature value is rawWeightedRectSum / nf,
and windows with area/nf >= 0.1 (std <= 10, flat texture) are rejected
outright.

TPU-native re-design: the reference evaluates windows one at a time
with per-window early exit. Here the first few stages are evaluated
DENSELY for all window positions at once (each Haar rectangle sum is
four shifted reads of the integral image); the survivors are then
COMPACTED to a fixed capacity (masked_top_k — the NCV kernel's
compaction step, cudalegacy) and the remaining stages run as a
`lax.scan` of batched integral-image gathers over the surviving
windows, with the cascade's early exit carried as an alive mask.

The XML loader reads the modern OpenCV cascade format (stump-based,
e.g. haarcascade_frontalface_alt.xml / _default.xml). Tilted (45°)
features are not supported (none of the frontal-face/body cascades the
fork ships use them).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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
    if (c.findtext("featureType") or "HAAR").strip() != "HAAR":
        raise ValueError("only HAAR cascades supported (no LBP yet)")
    wh = (int(c.findtext("height")), int(c.findtext("width")))
    feats = []
    for f in c.find("features"):
        tilted = f.findtext("tilted")
        if tilted is not None and tilted.strip() == "1":
            raise ValueError("tilted Haar features not supported")
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
            if len(inter) != 4:
                raise ValueError("tree-based cascade not supported (stumps only)")
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


# ---------------------------------------------------------------- tensors


class _StageTensors(NamedTuple):
    """Stage-padded stump tensors (T stages, Smax stumps per stage).
    Each stump reads up to 12 integral-image corners (3 rects x 4):
    corner value ii[y + dy, x + dx] weighted by w (0 = unused)."""

    dy: jnp.ndarray  # [T, Smax, 12] i32
    dx: jnp.ndarray  # [T, Smax, 12] i32
    w: jnp.ndarray  # [T, Smax, 12] f32
    thr: jnp.ndarray  # [T, Smax]
    left: jnp.ndarray  # [T, Smax] (0 where padded)
    right: jnp.ndarray  # [T, Smax]
    stage_thr: jnp.ndarray  # [T]


def _stage_tensors(model: CascadeModel) -> _StageTensors:
    T = len(model.stage_thresholds)
    counts = np.diff(model.stage_offsets)
    smax = int(counts.max())
    dy = np.zeros((T, smax, 12), np.int32)
    dx = np.zeros((T, smax, 12), np.int32)
    w = np.zeros((T, smax, 12), np.float32)
    thr = np.zeros((T, smax), np.float32)
    left = np.zeros((T, smax), np.float32)
    right = np.zeros((T, smax), np.float32)
    for s in range(T):
        for k, g in enumerate(range(model.stage_offsets[s], model.stage_offsets[s + 1])):
            fidx = int(model.feature[g])
            thr[s, k] = model.threshold[g]
            left[s, k] = model.left[g]
            right[s, k] = model.right[g]
            for r in range(3):
                x0, y0, rw, rh, wt = model.rects[fidx, r]
                if wt == 0.0:
                    continue
                x0, y0, rw, rh = int(x0), int(y0), int(rw), int(rh)
                # sum = ii[y0+h, x0+w] - ii[y0, x0+w] - ii[y0+h, x0] + ii[y0, x0]
                base = 4 * r
                dy[s, k, base : base + 4] = [y0 + rh, y0, y0 + rh, y0]
                dx[s, k, base : base + 4] = [x0 + rw, x0 + rw, x0, x0]
                w[s, k, base : base + 4] = [wt, -wt, -wt, wt]
    return _StageTensors(
        dy=jnp.asarray(dy), dx=jnp.asarray(dx), w=jnp.asarray(w),
        thr=jnp.asarray(thr), left=jnp.asarray(left), right=jnp.asarray(right),
        stage_thr=jnp.asarray(model.stage_thresholds),
    )


def _window_sums(ii: jnp.ndarray, y0, x0, h, w, out_h, out_w):
    """Rect sums for all window origins: [out_h, out_w]."""
    return (
        ii[y0 + h : y0 + h + out_h, x0 + w : x0 + w + out_w]
        - ii[y0 + h : y0 + h + out_h, x0 : x0 + out_w]
        - ii[y0 : y0 + out_h, x0 + w : x0 + w + out_w]
        + ii[y0 : y0 + out_h, x0 : x0 + out_w]
    )


def _norm_map(ii, ii2, wh, ww, out_h, out_w):
    """Reference variance normalization over the NORM RECT (window inset
    by 1 px; cascadedetect.cpp:623,731). Returns (inv_nf, texture_ok):
    inv_nf = 1/(narea*std); texture_ok False where std <= 10 (flat)."""
    narea = float((wh - 2) * (ww - 2))
    s1 = _window_sums(ii, 1, 1, wh - 2, ww - 2, out_h, out_w)
    s2 = _window_sums(ii2, 1, 1, wh - 2, ww - 2, out_h, out_w)
    nf2 = narea * s2 - s1 * s1
    nf = jnp.sqrt(jnp.maximum(nf2, 1e-12))
    inv_nf = jnp.where(nf2 > 0, 1.0 / nf, 1.0)
    texture_ok = (nf2 > 0) & (narea * inv_nf < 0.1)
    return inv_nf, texture_ok


def cascade_score_map(
    img: jnp.ndarray, model: CascadeModel, n_stages: int | None = None
) -> jnp.ndarray:
    """Dense cascade evaluation at the model's native scale over the
    first `n_stages` stages (all by default). Returns acceptance mask
    [H - wh + 1, W - ww + 1]."""
    wh, ww = model.window
    h, w = img.shape
    out_h, out_w = h - wh + 1, w - ww + 1
    img = img.astype(jnp.float32)
    ii = imgproc.integral(img)
    ii2 = imgproc.integral(img * img)
    inv_nf, accept = _norm_map(ii, ii2, wh, ww, out_h, out_w)
    total = len(model.stage_thresholds)
    for s in range(total if n_stages is None else min(n_stages, total)):
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
            pred = fsum * inv_nf < model.threshold[k]
            stage_sum = stage_sum + jnp.where(pred, model.left[k], model.right[k])
        accept = accept & (stage_sum >= model.stage_thresholds[s])
    return accept


def _eval_stages_gather(ii, by, bx, inv_nf_w, alive, t: _StageTensors, start: int):
    """Evaluate stages [start, T) for the window set (by, bx) by batched
    integral-image gathers; early exit carried as the alive mask."""
    dy, dx, w, thr, left, right, sthr = (
        t.dy[start:], t.dx[start:], t.w[start:],
        t.thr[start:], t.left[start:], t.right[start:], t.stage_thr[start:],
    )

    def step(al, stage):
        sdy, sdx, sw, sthr_, sleft, sright, sst = stage
        vals = ii[by[:, None, None] + sdy[None], bx[:, None, None] + sdx[None]]
        fsum = (vals * sw[None]).sum(-1)  # [M, Smax]
        pred = fsum * inv_nf_w[:, None] < sthr_[None, :]
        ssum = jnp.where(pred, sleft[None, :], sright[None, :]).sum(-1)
        return al & (ssum >= sst), None

    alive, _ = lax.scan(step, alive, (dy, dx, w, thr, left, right, sthr))
    return alive


def _detect_one_scale_impl(img, t: _StageTensors, model: CascadeModel,
                           dense_stages, capacity):
    wh, ww = model.window
    h, w = img.shape
    out_h, out_w = h - wh + 1, w - ww + 1
    img = img.astype(jnp.float32)
    ii = imgproc.integral(img)
    ii2 = imgproc.integral(img * img)
    inv_nf, accept = _norm_map(ii, ii2, wh, ww, out_h, out_w)
    # phase 1: first `dense_stages` stages densely over every window, as
    # per-stump shifted slices of the integral image (fused adds — no
    # gather, no padded-stage blowup; early stages are tiny)
    dense_stages = min(dense_stages, len(model.stage_thresholds))
    for s in range(dense_stages):
        stage_sum = jnp.zeros((out_h, out_w), jnp.float32)
        for k in range(int(model.stage_offsets[s]), int(model.stage_offsets[s + 1])):
            fidx = int(model.feature[k])
            fsum = jnp.zeros((out_h, out_w), jnp.float32)
            for r in range(3):
                x0, y0, rw, rh, wt = model.rects[fidx, r]
                if wt == 0.0:
                    continue
                fsum = fsum + float(wt) * _window_sums(
                    ii, int(y0), int(x0), int(rh), int(rw), out_h, out_w
                )
            pred = fsum * inv_nf < float(model.threshold[k])
            stage_sum = stage_sum + jnp.where(
                pred, float(model.left[k]), float(model.right[k])
            )
        accept = accept & (stage_sum >= float(model.stage_thresholds[s]))
    # phase 2: compact survivors, gather-evaluate the remaining stages
    flat = accept.reshape(-1)
    capacity = min(capacity, out_h * out_w)
    idx, kmask = masked_top_k(flat.astype(jnp.float32), flat, capacity)
    by = (idx // out_w).astype(jnp.int32)
    bx = (idx % out_w).astype(jnp.int32)
    inv_nf_w = inv_nf[by, bx]
    alive = _eval_stages_gather(ii, by, bx, inv_nf_w, kmask, t, dense_stages)
    return by, bx, alive


# model drives Python-level tracing (stump constants, numpy → unhashable),
# so the jitted per-scale function is cached per model identity
_scale_fn_cache: dict = {}


def _get_scale_fn(model: CascadeModel, dense_stages: int, capacity: int):
    key = (id(model), dense_stages, capacity)
    fn = _scale_fn_cache.get(key)
    if fn is None:
        fn = jax.jit(
            lambda img, t: _detect_one_scale_impl(
                img, t, model, dense_stages, capacity
            )
        )
        _scale_fn_cache[key] = fn
    return fn


def detect_multi_scale(
    img: jnp.ndarray,
    model: CascadeModel,
    scale0: float = 1.2,
    n_scales: int = 24,  # loops until the window outgrows the image
    dense_stages: int = 3,
    capacity: int = 2048,
    max_detections: int = 64,
    group_threshold: int = 2,
    group_eps: float = 0.2,
):
    """detectMultiScale analog: the image pyramid slides the ORIGINAL
    window (cascadedetect.cpp scales the image, not the features), raw
    hits are merged with groupRectangles semantics. Host-synchronizing
    (returns numpy), like the reference API. Returns (boxes [K,4] xywh
    float, counts [K])."""
    h, w = img.shape
    wh, ww = model.window
    t = _stage_tensors(model)
    scale_fn = _get_scale_fn(model, dense_stages, capacity)
    raw = []
    for si in range(n_scales):
        s = scale0 ** si
        sh, sw = int(h / s), int(w / s)
        if sh < wh + 2 or sw < ww + 2:
            break
        scaled = imgproc.resize_bilinear(img, sh, sw) if si else img.astype(jnp.float32)
        by, bx, alive = scale_fn(scaled, t)
        by, bx, alive = np.asarray(by), np.asarray(bx), np.asarray(alive)
        for y, x in zip(by[alive], bx[alive]):
            raw.append((x * s, y * s, ww * s, wh * s))
    if not raw:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
    boxes, counts = group_rectangles(
        np.asarray(raw, np.float32), group_threshold, group_eps
    )
    order = np.argsort(-counts)[:max_detections]
    return boxes[order], counts[order]


def group_rectangles(
    rects: np.ndarray, group_threshold: int = 2, eps: float = 0.2
) -> tuple[np.ndarray, np.ndarray]:
    """cv::groupRectangles (objdetect/src/cascadedetect.cpp:66): cluster
    by rectangle similarity, average each cluster, keep clusters with
    more than `group_threshold` members. rects: [N,4] xywh."""
    n = rects.shape[0]
    if n == 0:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * 0.5 * (
                min(rects[i, 2], rects[j, 2]) + min(rects[i, 3], rects[j, 3])
            )
            if (
                abs(rects[i, 0] - rects[j, 0]) <= delta
                and abs(rects[i, 1] - rects[j, 1]) <= delta
                and abs(rects[i, 0] + rects[i, 2] - rects[j, 0] - rects[j, 2]) <= delta
                and abs(rects[i, 1] + rects[i, 3] - rects[j, 1] - rects[j, 3]) <= delta
            ):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    roots = np.array([find(i) for i in range(n)])
    out_boxes, out_counts = [], []
    for r in np.unique(roots):
        members = rects[roots == r]
        if members.shape[0] > group_threshold:
            out_boxes.append(members.mean(0))
            out_counts.append(members.shape[0])
    if not out_boxes:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
    return np.stack(out_boxes).astype(np.float32), np.asarray(out_counts, np.int32)


# ------------------------------------------------------------- LBP ---

class LBPCascadeModel(NamedTuple):
    """LBP cascade (cascadedetect.hpp LBPEvaluator + predictCategoricalStump;
    shipped models in data/lbpcascades/). Each feature is ONE cell rect
    (x, y, w, h); the descriptor covers the 3x3 grid of such cells. Each
    stump carries a 256-bit subset (8 x int32): code-bit set -> left leaf.
    LBP needs NO window normalization (illumination-invariant by design)."""

    window: tuple[int, int]
    rects: np.ndarray        # [F, 4] i32 (x, y, w, h) of the top-left cell
    feature: np.ndarray      # [S] i32
    subsets: np.ndarray      # [S, 8] i32 (raw two's-complement words)
    left: np.ndarray         # [S] f32
    right: np.ndarray        # [S] f32
    stage_offsets: np.ndarray
    stage_thresholds: np.ndarray


def load_opencv_lbp_cascade(path: str) -> LBPCascadeModel:
    """Parse an LBP cascade XML (featureType LBP)."""
    root = ET.parse(path).getroot()
    c = root.find("cascade")
    if c is None or (c.findtext("featureType") or "").strip() != "LBP":
        raise ValueError("not an LBP cascade")
    wh = (int(c.findtext("height")), int(c.findtext("width")))
    rects = []
    for f in c.find("features"):
        vals = [int(v) for v in f.findtext("rect").split()]
        rects.append(vals[:4])
    feature, subsets, left, right = [], [], [], []
    offsets = [0]
    thresholds = []
    for stage in c.find("stages"):
        thresholds.append(float(stage.findtext("stageThreshold")))
        for wc in stage.find("weakClassifiers"):
            inter = [int(v) for v in wc.findtext("internalNodes").split()]
            # stump: [left-child=0, right-child=-1, featIdx, 8 subset words]
            if len(inter) != 11:
                raise ValueError("tree-based LBP cascade not supported")
            leaf = [float(v) for v in wc.findtext("leafValues").split()]
            feature.append(inter[2])
            subsets.append(inter[3:11])
            left.append(leaf[0])
            right.append(leaf[1])
        offsets.append(len(feature))
    return LBPCascadeModel(
        window=wh,
        rects=np.asarray(rects, np.int32),
        feature=np.asarray(feature, np.int32),
        subsets=np.asarray(subsets, np.int64).astype(np.uint32),
        left=np.asarray(left, np.float32),
        right=np.asarray(right, np.float32),
        stage_offsets=np.asarray(offsets, np.int32),
        stage_thresholds=np.asarray(thresholds, np.float32),
    )


def _lbp_scale_impl(img, model: LBPCascadeModel):
    """Evaluation of ALL stages at one scale: accept map [oh, ow].

    Fully batched over features: ONE [F, 4, 4, oh, ow] gather reads every
    feature's 16 integral-image grid corners, cell sums and the 8-bit LBP
    codes (reference bit order, LBPEvaluator::calc — clockwise from
    top-left, mid-left last) come out as [F, oh, ow], the 256-bit subset
    lookup is a take_along_axis per stump, and stage sums are one
    scatter-add over the stage ids — a handful of large fused ops instead
    of thousands of per-stump slices (which take minutes to compile)."""
    wh, ww = model.window
    h, w = img.shape
    out_h, out_w = h - wh + 1, w - ww + 1
    ii = imgproc.integral(img.astype(jnp.float32))  # [h+1, w+1]

    x0 = jnp.asarray(model.rects[:, 0])  # [F]
    y0 = jnp.asarray(model.rects[:, 1])
    cw = jnp.asarray(model.rects[:, 2])
    ch = jnp.asarray(model.rects[:, 3])
    gy = y0[:, None] + ch[:, None] * jnp.arange(4)[None, :]  # [F, 4]
    gx = x0[:, None] + cw[:, None] * jnp.arange(4)[None, :]
    yy = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
    Y = gy[:, :, None, None, None] + yy[None, None, None]  # [F,4,1,oh,ow]
    X = gx[:, None, :, None, None] + xx[None, None, None]  # [F,1,4,oh,ow]
    corners = ii[Y, X]  # [F, 4, 4, oh, ow] via one big gather

    cells = (
        corners[:, 1:, 1:] - corners[:, :-1, 1:]
        - corners[:, 1:, :-1] + corners[:, :-1, :-1]
    )  # [F, 3, 3, oh, ow]
    center = cells[:, 1, 1]
    bits = {(0, 0): 7, (0, 1): 6, (0, 2): 5, (1, 2): 4, (2, 2): 3,
            (2, 1): 2, (2, 0): 1, (1, 0): 0}
    code = jnp.zeros(center.shape, jnp.int32)
    for (r, cc), b in bits.items():
        code = code | ((cells[:, r, cc] >= center).astype(jnp.int32) << b)
    # codes per stump
    code_s = code[jnp.asarray(model.feature)]  # [S, oh, ow]
    subsets = jnp.asarray(model.subsets)  # [S, 8] uint32
    word = jnp.take_along_axis(
        subsets[:, :, None, None],
        (code_s >> 5)[:, None], axis=1,
    )[:, 0]  # [S, oh, ow]
    hit = (word >> (code_s & 31).astype(jnp.uint32)) & jnp.uint32(1)
    vals = jnp.where(
        hit == 1,
        jnp.asarray(model.left)[:, None, None],
        jnp.asarray(model.right)[:, None, None],
    )  # [S, oh, ow]
    # stage sums: scatter-add stump values onto their stage id
    n_stages = len(model.stage_thresholds)
    stage_of = np.repeat(
        np.arange(n_stages), np.diff(model.stage_offsets)
    ).astype(np.int32)
    sums = jnp.zeros((n_stages, out_h, out_w), jnp.float32).at[
        jnp.asarray(stage_of)
    ].add(vals)
    ok = sums >= jnp.asarray(model.stage_thresholds)[:, None, None]
    return jnp.all(ok, axis=0)


_lbp_fn_cache: dict = {}


def detect_multi_scale_lbp(
    img: jnp.ndarray,
    model: LBPCascadeModel,
    scale0: float = 1.2,
    n_scales: int = 24,
    max_detections: int = 64,
    group_threshold: int = 2,
    group_eps: float = 0.2,
):
    """detectMultiScale for LBP cascades: image pyramid + dense stage
    evaluation + groupRectangles (same driver shape as the Haar path)."""
    h, w = img.shape
    wh, ww = model.window
    fn = _lbp_fn_cache.get(id(model))
    if fn is None:
        fn = jax.jit(lambda im: _lbp_scale_impl(im, model))
        _lbp_fn_cache[id(model)] = fn
    raw = []
    for si in range(n_scales):
        s = scale0 ** si
        sh, sw = int(h / s), int(w / s)
        if sh < wh + 2 or sw < ww + 2:
            break
        scaled = imgproc.resize_bilinear(img, sh, sw) if si else img.astype(jnp.float32)
        accept = np.asarray(fn(scaled))
        ys, xs = np.where(accept)
        for y, x in zip(ys, xs):
            raw.append((x * s, y * s, ww * s, wh * s))
    if not raw:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int32)
    boxes, counts = group_rectangles(
        np.asarray(raw, np.float32), group_threshold, group_eps
    )
    order = np.argsort(-counts)[:max_detections]
    return boxes[order], counts[order]
