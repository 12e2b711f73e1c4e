"""Cascade training — the `apps/traincascade` analog.

Reference: /root/reference/apps/traincascade/traincascade.cpp:1 (CLI),
cascadeclassifier.cpp (stage loop: fill positives, mine hard negatives,
train a boosted stage, recompute the cascade), haarfeatures.cpp (the
BASIC pool: haar_x2/y2/x3/y3/x2_y2), boost.cpp (Gentle AdaBoost stumps
on variance-normalized feature values).

TPU-first design — the reference trains one feature at a time over
per-sample C++ loops; here every hot stage is a dense tensor program:
  * the WHOLE feature pool is one sparse corner matrix M [ii_size, F]
    (±weight at 12 integral-image corners per feature), so evaluating
    all features on all samples is ONE matmul ii_flat @ M on the MXU;
  * weighted stump fitting for ALL features at once: per-feature
    quantization to B bins, scatter-add of (w, w*y) into [F, B]
    histograms, cumulative sums -> best threshold/leaves/error per
    feature in closed form — no per-feature threshold scan;
  * Gentle AdaBoost (the reference's default GAB): stump leaves are
    weighted means of y, weights update w *= exp(-y * f(x)).
Host Python only drives the stage/negative-mining control loop.

The trained model is emitted as ops/cascade.py's CascadeModel, so the
framework's own detector (detect_multi_scale / cascade_score_map)
consumes it directly — the analog of traincascade writing cascade.xml
for CascadeClassifier::load.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops.cascade import CascadeModel


# ------------------------------------------------------------- feature pool


def haar_feature_pool(window=(24, 24), pos_step=3, size_step=3,
                      min_size=6) -> np.ndarray:
    """The BASIC Haar pool (haarfeatures.cpp): x2/y2 edges, x3/y3 lines,
    x2_y2 checkerboard, as up-to-3 weighted rects [F, 3, 5] of
    (x, y, w, h, weight) in the base window."""
    wh, ww = window
    feats = []

    def add(*rects):
        f = np.zeros((3, 5), np.float32)
        for i, r in enumerate(rects):
            f[i] = r
        feats.append(f)

    for fw in range(min_size, ww + 1, size_step):
        for fh in range(min_size, wh + 1, size_step):
            for x in range(0, ww - fw + 1, pos_step):
                for y in range(0, wh - fh + 1, pos_step):
                    if fw % 2 == 0:  # x2 edge: full(-1) + left half(+2)
                        add((x, y, fw, fh, -1.0),
                            (x, y, fw // 2, fh, 2.0))
                    if fh % 2 == 0:  # y2 edge
                        add((x, y, fw, fh, -1.0),
                            (x, y, fw, fh // 2, 2.0))
                    if fw % 3 == 0:  # x3 line: full(-1) + mid third(+3)
                        add((x, y, fw, fh, -1.0),
                            (x + fw // 3, y, fw // 3, fh, 3.0))
                    if fh % 3 == 0:  # y3 line
                        add((x, y, fw, fh, -1.0),
                            (x, y + fh // 3, fw, fh // 3, 3.0))
                    if fw % 2 == 0 and fh % 2 == 0:  # x2_y2 checkerboard
                        add((x, y, fw, fh, -1.0),
                            (x, y, fw // 2, fh // 2, 2.0),
                            (x + fw // 2, y + fh // 2,
                             fw // 2, fh // 2, 2.0))
    return np.stack(feats)


def _corner_matrix(rects: np.ndarray, window) -> np.ndarray:
    """Sparse corner matrix M [(wh+1)*(ww+1), F]: feature values for a
    whole sample batch are ii_flat @ M (one MXU matmul)."""
    wh, ww = window
    iw = ww + 1
    F = rects.shape[0]
    M = np.zeros(((wh + 1) * iw, F), np.float32)
    for f in range(F):
        for r in range(3):
            x0, y0, rw, rh, wt = rects[f, r]
            if wt == 0.0:
                continue
            x0, y0, rw, rh = int(x0), int(y0), int(rw), int(rh)
            M[(y0 + rh) * iw + (x0 + rw), f] += wt
            M[y0 * iw + (x0 + rw), f] -= wt
            M[(y0 + rh) * iw + x0, f] -= wt
            M[y0 * iw + x0, f] += wt
    return M


def _sample_features(samples: np.ndarray, M: jnp.ndarray, window):
    """samples [N, wh, ww] u8/f32 -> (values [N, F] variance-normalized,
    inv_nf [N]) exactly as the evaluator normalizes windows."""
    wh, ww = window
    x = jnp.asarray(samples, jnp.float32)
    ii = jax.vmap(imgproc.integral)(x)  # [N, wh+1, ww+1]
    ii2 = jax.vmap(imgproc.integral)(x * x)

    def rect_sum(a, y0, x0, h, w):
        return (a[:, y0 + h, x0 + w] - a[:, y0, x0 + w]
                - a[:, y0 + h, x0] + a[:, y0, x0])

    narea = float((wh - 2) * (ww - 2))
    s1 = rect_sum(ii, 1, 1, wh - 2, ww - 2)
    s2 = rect_sum(ii2, 1, 1, wh - 2, ww - 2)
    nf2 = narea * s2 - s1 * s1
    nf = jnp.sqrt(jnp.maximum(nf2, 1e-12))
    inv_nf = jnp.where(nf2 > 0, 1.0 / nf, 1.0)
    vals = ii.reshape(ii.shape[0], -1) @ M  # [N, F]
    return vals * inv_nf[:, None], inv_nf


# ------------------------------------------------ vectorized GAB stumps


def _fit_stumps_all(vals, y, w, n_bins=64):
    """Gentle-AdaBoost stump fit for EVERY feature at once.

    vals [N, F], y [N] in {-1, +1}, w [N] weights. Returns per-feature
    (err [F], thr [F], left [F], right [F]) where the stump predicts
    `left` when value < thr else `right` (the evaluator's convention,
    ops/cascade.py predictOrderedStump analog)."""
    n, f = vals.shape
    lo = vals.min(axis=0)
    hi = vals.max(axis=0)
    span = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((vals - lo) / span * n_bins).astype(jnp.int32),
                 0, n_bins - 1)  # [N, F]
    fidx = jnp.broadcast_to(jnp.arange(f)[None, :], (n, f))
    flat = (fidx * n_bins + q).reshape(-1)
    wsum = jnp.zeros((f * n_bins,), jnp.float32).at[flat].add(
        jnp.broadcast_to(w[:, None], (n, f)).reshape(-1)
    ).reshape(f, n_bins)
    wysum = jnp.zeros((f * n_bins,), jnp.float32).at[flat].add(
        jnp.broadcast_to((w * y)[:, None], (n, f)).reshape(-1)
    ).reshape(f, n_bins)

    # threshold candidates: bin boundaries b = 1..B-1 (split q < b)
    cw = jnp.cumsum(wsum, axis=1)  # [F, B]
    cwy = jnp.cumsum(wysum, axis=1)
    tot_w = cw[:, -1:]
    tot_wy = cwy[:, -1:]
    lw = cw[:, :-1]  # weight left of each boundary
    lwy = cwy[:, :-1]
    rw = tot_w - lw
    rwy = tot_wy - lwy
    left = lwy / jnp.maximum(lw, 1e-12)
    right = rwy / jnp.maximum(rw, 1e-12)
    # weighted squared error: sum w*y^2 - (lwy^2/lw + rwy^2/rw); the
    # first term is constant across features/thresholds (y^2 = 1)
    gain = lwy**2 / jnp.maximum(lw, 1e-12) + rwy**2 / jnp.maximum(rw, 1e-12)
    gain = jnp.where((lw > 1e-12) & (rw > 1e-12), gain, -jnp.inf)
    b = jnp.argmax(gain, axis=1)  # [F] best boundary per feature
    ar = jnp.arange(f)
    err = jnp.sum(w) - gain[ar, b]
    thr = lo + (b + 1).astype(jnp.float32) / n_bins * span
    return err, thr, left[ar, b], right[ar, b]


_fit_stumps_all_jit = jax.jit(_fit_stumps_all, static_argnames=("n_bins",))


# --------------------------------------------------------- stage training


class _Stump(NamedTuple):
    feature: int
    threshold: float
    left: float
    right: float


def _train_stage(pos_vals, neg_vals, min_hit_rate, max_false_alarm,
                 max_weak):
    """One boosted stage (CascadeBoost::train analog). Returns
    (stumps, stage_threshold, pos_scores, neg_scores)."""
    vals = jnp.concatenate([pos_vals, neg_vals], axis=0)
    n_pos, n_neg = pos_vals.shape[0], neg_vals.shape[0]
    y = jnp.concatenate([
        jnp.ones((n_pos,), jnp.float32), -jnp.ones((n_neg,), jnp.float32)
    ])
    w = jnp.concatenate([
        jnp.full((n_pos,), 0.5 / n_pos), jnp.full((n_neg,), 0.5 / n_neg)
    ])
    scores = jnp.zeros(vals.shape[0], jnp.float32)
    stumps = []
    for _ in range(max_weak):
        err, thr, left, right = _fit_stumps_all_jit(vals, y, w)
        fbest = int(jnp.argmin(err))
        t, lv, rv = float(thr[fbest]), float(left[fbest]), float(right[fbest])
        stumps.append(_Stump(fbest, t, lv, rv))
        pred = jnp.where(vals[:, fbest] < t, lv, rv)
        scores = scores + pred
        w = w * jnp.exp(-y * pred)
        w = w / jnp.sum(w)
        # stage threshold at the minHitRate percentile of positives
        ps = np.sort(np.asarray(scores[:n_pos]))
        k = int(np.floor((1.0 - min_hit_rate) * n_pos))
        sthr = float(ps[k]) - 1e-6
        fa = float(np.mean(np.asarray(scores[n_pos:]) >= sthr))
        if fa <= max_false_alarm:
            break
    return (stumps, sthr, np.asarray(scores[:n_pos]),
            np.asarray(scores[n_pos:]))


# ------------------------------------------------------------ cascade loop


def train_cascade(
    positives: np.ndarray,
    negative_images: list[np.ndarray],
    window=(24, 24),
    n_stages: int = 8,
    min_hit_rate: float = 0.995,
    max_false_alarm: float = 0.5,
    max_weak_per_stage: int = 25,
    n_neg_per_stage: int = 1000,
    pos_step: int = 3,
    size_step: int = 3,
    seed: int = 0,
    verbose: bool = False,
) -> CascadeModel:
    """Train a Haar cascade (traincascade.cpp flow): per stage, mine
    negatives that PASS all previous stages from `negative_images`
    (random crops — the reference's NegReader random-window walk), boost
    a stage to minHitRate/maxFalseAlarm, repeat.

    positives: [P, wh, ww] aligned object crops.
    Returns a CascadeModel consumable by ops/cascade.py.
    """
    rng = np.random.default_rng(seed)
    wh, ww = window
    rects = haar_feature_pool(window, pos_step, size_step)
    M = jnp.asarray(_corner_matrix(rects, window))
    pos_vals, _ = _sample_features(positives, M, window)

    def random_crops(n):
        out = np.empty((n, wh, ww), np.float32)
        for i in range(n):
            img = negative_images[rng.integers(len(negative_images))]
            y = rng.integers(0, img.shape[0] - wh + 1)
            x = rng.integers(0, img.shape[1] - ww + 1)
            out[i] = img[y : y + wh, x : x + ww]
        return out

    def model_from(stages, sthrs, used_feats):
        remap = {f: i for i, f in enumerate(used_feats)}
        feat, thr, lv, rv, offs = [], [], [], [], [0]
        for st in stages:
            for s in st:
                feat.append(remap[s.feature])
                thr.append(s.threshold)
                lv.append(s.left)
                rv.append(s.right)
            offs.append(len(feat))
        return CascadeModel(
            window=window,
            rects=rects[np.asarray(used_feats, np.int64)]
            if used_feats else rects[:1],
            feature=np.asarray(feat, np.int32),
            threshold=np.asarray(thr, np.float32),
            left=np.asarray(lv, np.float32),
            right=np.asarray(rv, np.float32),
            stage_offsets=np.asarray(offs, np.int32),
            stage_thresholds=np.asarray(sthrs, np.float32),
        )

    def passes(model, crops):
        """Windows accepted by the current cascade (training-side check
        with the same normalization as the evaluator)."""
        if not model.stage_thresholds.size:
            return np.ones(crops.shape[0], bool)
        vals, _ = _sample_features(crops, M, window)
        vals = np.asarray(vals)
        ok = np.ones(crops.shape[0], bool)
        g = 0
        for s, sthr in enumerate(model.stage_thresholds):
            ssum = np.zeros(crops.shape[0], np.float32)
            for k in range(model.stage_offsets[s], model.stage_offsets[s + 1]):
                pf = pool_idx[g]  # original pool index of this stump
                g += 1
                pred = vals[:, pf] < model.threshold[k]
                ssum += np.where(pred, model.left[k], model.right[k])
            ok &= ssum >= sthr
        return ok

    stages, sthrs, pool_idx = [], [], []
    neg = random_crops(n_neg_per_stage)
    for si in range(n_stages):
        neg_vals, _ = _sample_features(neg, M, window)
        stumps, sthr, ps, ns = _train_stage(
            pos_vals, jnp.asarray(neg_vals), min_hit_rate,
            max_false_alarm, max_weak_per_stage,
        )
        stages.append(stumps)
        sthrs.append(sthr)
        pool_idx.extend(s.feature for s in stumps)
        if verbose:
            hit = float(np.mean(ps >= sthr))
            fa = float(np.mean(ns >= sthr))
            print(f"stage {si}: {len(stumps)} stumps, "
                  f"hit={hit:.4f} fa={fa:.4f}")

        if si == n_stages - 1:
            break
        # mine hard negatives for the next stage: random crops that pass
        # every stage so far (NegReader + CascadeClassifier::predict)
        used = sorted(set(pool_idx))
        cur = model_from(stages, sthrs, used)
        mined = []
        need = n_neg_per_stage
        for _ in range(60):
            cand = random_crops(4 * n_neg_per_stage)
            keep = passes(cur, cand)
            mined.append(cand[keep])
            if sum(m.shape[0] for m in mined) >= need:
                break
        # mirror the LBP variant: when mining comes up dry, STOP rather
        # than substituting unfiltered random crops — those are easy
        # negatives the cascade already rejects, and training further
        # stages against them reports meaningless false-alarm rates
        # (ADVICE r4)
        neg = np.concatenate(mined)[:need]
        if neg.shape[0] < max(32, need // 20):
            if verbose:
                print(f"stage {si}: negatives exhausted "
                      f"({neg.shape[0]} left) — stopping early")
            break

    used = sorted(set(pool_idx))
    return model_from(stages, sthrs, used)


# ----------------------------------------------------------- LBP variant


def lbp_feature_pool(window=(24, 24), pos_step=2, size_step=1) -> np.ndarray:
    """LBP cell-rect pool (lbpfeatures.cpp): every (x, y, cw, ch) whose
    3x3 cell grid fits the window. [F, 4] i32."""
    wh, ww = window
    out = []
    for cw in range(1, ww // 3 + 1, size_step):
        for ch in range(1, wh // 3 + 1, size_step):
            for x in range(0, ww - 3 * cw + 1, pos_step):
                for y in range(0, wh - 3 * ch + 1, pos_step):
                    out.append((x, y, cw, ch))
    return np.asarray(out, np.int32)


def _lbp_codes(samples: np.ndarray, rects: np.ndarray) -> jnp.ndarray:
    """[N, F] 8-bit LBP codes, reference bit order (LBPEvaluator::calc,
    same order as ops/cascade.py's evaluator)."""
    x = jnp.asarray(samples, jnp.float32)
    ii = jax.vmap(imgproc.integral)(x)  # [N, wh+1, ww+1]
    x0 = jnp.asarray(rects[:, 0])
    y0 = jnp.asarray(rects[:, 1])
    cw = jnp.asarray(rects[:, 2])
    ch = jnp.asarray(rects[:, 3])
    gy = y0[:, None] + ch[:, None] * jnp.arange(4)[None, :]  # [F, 4]
    gx = x0[:, None] + cw[:, None] * jnp.arange(4)[None, :]
    corners = ii[:, gy[:, :, None], gx[:, None, :]]  # [N, F, 4, 4]
    cells = (
        corners[:, :, 1:, 1:] - corners[:, :, :-1, 1:]
        - corners[:, :, 1:, :-1] + corners[:, :, :-1, :-1]
    )  # [N, F, 3, 3]
    center = cells[:, :, 1, 1]
    bits = {(0, 0): 7, (0, 1): 6, (0, 2): 5, (1, 2): 4, (2, 2): 3,
            (2, 1): 2, (2, 0): 1, (1, 0): 0}
    code = jnp.zeros(center.shape, jnp.int32)
    for (r, c), b in bits.items():
        code = code | ((cells[:, :, r, c] >= center).astype(jnp.int32) << b)
    return code


def _fit_lbp_stumps_all(codes, y, w):
    """Categorical GAB stump for every LBP feature at once: per feature,
    per-code weighted means; the optimal two-leaf partition of a
    categorical variable under squared error splits the codes SORTED by
    their weighted mean (the classic Breiman trick) — one cumsum scan.

    codes [N, F] int 0..255. Returns (err, subset_mask [F, 256] bool
    = codes assigned to the LEFT leaf, left [F], right [F])."""
    n, f = codes.shape
    flat = (jnp.arange(f)[None, :] * 256 + codes).reshape(-1)
    wsum = jnp.zeros((f * 256,), jnp.float32).at[flat].add(
        jnp.broadcast_to(w[:, None], (n, f)).reshape(-1)
    ).reshape(f, 256)
    wysum = jnp.zeros((f * 256,), jnp.float32).at[flat].add(
        jnp.broadcast_to((w * y)[:, None], (n, f)).reshape(-1)
    ).reshape(f, 256)
    mean = wysum / jnp.maximum(wsum, 1e-12)
    mean = jnp.where(wsum > 0, mean, 0.0)  # empty codes: neutral
    order = jnp.argsort(mean, axis=1)  # [F, 256]
    sw = jnp.take_along_axis(wsum, order, axis=1)
    swy = jnp.take_along_axis(wysum, order, axis=1)
    cw_ = jnp.cumsum(sw, axis=1)[:, :-1]  # weight left of split k
    cwy = jnp.cumsum(swy, axis=1)[:, :-1]
    tw = jnp.sum(sw, axis=1, keepdims=True)
    twy = jnp.sum(swy, axis=1, keepdims=True)
    rw = tw - cw_
    rwy = twy - cwy
    gain = cwy**2 / jnp.maximum(cw_, 1e-12) + rwy**2 / jnp.maximum(rw, 1e-12)
    gain = jnp.where((cw_ > 1e-12) & (rw > 1e-12), gain, -jnp.inf)
    k = jnp.argmax(gain, axis=1)  # [F]
    ar = jnp.arange(f)
    err = jnp.sum(w) - gain[ar, k]
    left = cwy[ar, k] / jnp.maximum(cw_[ar, k], 1e-12)
    right = rwy[ar, k] / jnp.maximum(rw[ar, k], 1e-12)
    # subset = sorted codes [0..k] per feature
    rank = jnp.argsort(order, axis=1)  # rank of each code in the sort
    subset = rank <= k[:, None]  # [F, 256]
    return err, subset, left, right


_fit_lbp_stumps_all_jit = jax.jit(_fit_lbp_stumps_all)


def _subset_words(mask256: np.ndarray) -> np.ndarray:
    """[256] bool -> [8] u32 words (evaluator layout: word = code>>5,
    bit = code & 31)."""
    w = np.zeros(8, np.uint32)
    for code in np.nonzero(mask256)[0]:
        w[code >> 5] |= np.uint32(1) << np.uint32(code & 31)
    return w


def train_cascade_lbp(
    positives: np.ndarray,
    negative_images: list[np.ndarray],
    window=(24, 24),
    n_stages: int = 8,
    min_hit_rate: float = 0.995,
    max_false_alarm: float = 0.5,
    max_weak_per_stage: int = 20,
    n_neg_per_stage: int = 1000,
    pos_step: int = 2,
    seed: int = 0,
    verbose: bool = False,
):
    """traincascade -featureType LBP analog. Emits ops/cascade.py's
    LBPCascadeModel (subset-stump cascade, no window normalization)."""
    from opencv_tpu.ops.cascade import LBPCascadeModel

    rng = np.random.default_rng(seed)
    wh, ww = window
    rects = lbp_feature_pool(window, pos_step)
    pos_codes = _lbp_codes(positives, rects)

    def random_crops(n):
        out = np.empty((n, wh, ww), np.float32)
        for i in range(n):
            img = negative_images[rng.integers(len(negative_images))]
            yy = rng.integers(0, img.shape[0] - wh + 1)
            xx = rng.integers(0, img.shape[1] - ww + 1)
            out[i] = img[yy : yy + wh, xx : xx + ww]
        return out

    stages, sthrs = [], []

    def crop_scores_per_stage(codes):
        """[n_stages][N] stage sums for crops with the current model."""
        out = []
        for st in stages:
            ssum = np.zeros(codes.shape[0], np.float32)
            for (fidx, subset, lv, rv) in st:
                c = np.asarray(codes[:, fidx])
                hit = subset[c]
                ssum += np.where(hit, lv, rv)
            out.append(ssum)
        return out

    def passes(codes):
        ok = np.ones(codes.shape[0], bool)
        for ssum, sthr in zip(crop_scores_per_stage(codes), sthrs):
            ok &= ssum >= sthr
        return ok

    neg = random_crops(n_neg_per_stage)
    for si in range(n_stages):
        neg_codes = _lbp_codes(neg, rects)
        codes = jnp.concatenate([pos_codes, neg_codes], axis=0)
        n_pos, n_neg_cur = pos_codes.shape[0], neg_codes.shape[0]
        y = jnp.concatenate([
            jnp.ones((n_pos,), jnp.float32),
            -jnp.ones((n_neg_cur,), jnp.float32),
        ])
        w = jnp.concatenate([
            jnp.full((n_pos,), 0.5 / n_pos),
            jnp.full((n_neg_cur,), 0.5 / n_neg_cur),
        ])
        scores = jnp.zeros(codes.shape[0], jnp.float32)
        st = []
        for _ in range(max_weak_per_stage):
            err, subset, left, right = _fit_lbp_stumps_all_jit(codes, y, w)
            fb = int(jnp.argmin(err))
            sub = np.asarray(subset[fb])
            lv, rv = float(left[fb]), float(right[fb])
            st.append((fb, sub, lv, rv))
            hit = subset[fb][codes[:, fb]]
            pred = jnp.where(hit, lv, rv)
            scores = scores + pred
            w = w * jnp.exp(-y * pred)
            w = w / jnp.sum(w)
            ps = np.sort(np.asarray(scores[:n_pos]))
            k = int(np.floor((1.0 - min_hit_rate) * n_pos))
            sthr = float(ps[k]) - 1e-6
            fa = float(np.mean(np.asarray(scores[n_pos:]) >= sthr))
            if fa <= max_false_alarm:
                break
        stages.append(st)
        sthrs.append(sthr)
        if verbose:
            print(f"stage {si}: {len(st)} stumps, fa={fa:.3f}")
        if si == n_stages - 1:
            break
        mined, need = [], n_neg_per_stage
        for _ in range(60):
            cand = random_crops(4 * n_neg_per_stage)
            keep = passes(_lbp_codes(cand, rects))
            mined.append(cand[keep])
            if sum(m.shape[0] for m in mined) >= need:
                break
        got = np.concatenate(mined) if mined else np.zeros((0, wh, ww))
        if got.shape[0] < max(32, need // 20):
            if verbose:
                print(f"stage {si}: negatives exhausted — stopping")
            break
        neg = got[:need]

    feature, subsets, left, right, offs = [], [], [], [], [0]
    used = sorted({f for st in stages for (f, _, _, _) in st})
    remap = {f: i for i, f in enumerate(used)}
    for st in stages:
        for (f, sub, lv, rv) in st:
            feature.append(remap[f])
            subsets.append(_subset_words(sub))
            left.append(lv)
            right.append(rv)
        offs.append(len(feature))
    return LBPCascadeModel(
        window=window,
        rects=rects[np.asarray(used, np.int64)],
        feature=np.asarray(feature, np.int32),
        subsets=np.stack(subsets).astype(np.uint32),
        left=np.asarray(left, np.float32),
        right=np.asarray(right, np.float32),
        stage_offsets=np.asarray(offs, np.int32),
        stage_thresholds=np.asarray(sthrs, np.float32),
    )


# ------------------------------------------------------------ XML export


def save_opencv_cascade(model, path: str):
    """Write a trained Haar CascadeModel as the OpenCV cascade XML (the
    artifact traincascade emits for CascadeClassifier::load) — round-
    trippable by ops/cascade.py load_opencv_cascade and by cv2 itself."""
    import xml.etree.ElementTree as ET

    wh, ww = model.window
    root = ET.Element("opencv_storage")
    casc = ET.SubElement(root, "cascade")
    casc.set("type_id", "opencv-cascade-classifier")
    ET.SubElement(casc, "stageType").text = "BOOST"
    ET.SubElement(casc, "featureType").text = "HAAR"
    ET.SubElement(casc, "height").text = str(wh)
    ET.SubElement(casc, "width").text = str(ww)
    sp = ET.SubElement(casc, "stageParams")
    counts = np.diff(model.stage_offsets)
    ET.SubElement(sp, "maxWeakCount").text = str(int(counts.max()))
    fp = ET.SubElement(casc, "featureParams")
    ET.SubElement(fp, "maxCatCount").text = "0"
    ET.SubElement(casc, "stageNum").text = str(len(model.stage_thresholds))
    stages = ET.SubElement(casc, "stages")
    for s, sthr in enumerate(model.stage_thresholds):
        st = ET.SubElement(stages, "_")
        ET.SubElement(st, "maxWeakCount").text = str(int(counts[s]))
        ET.SubElement(st, "stageThreshold").text = f"{float(sthr):.10e}"
        wcs = ET.SubElement(st, "weakClassifiers")
        for k in range(model.stage_offsets[s], model.stage_offsets[s + 1]):
            wc = ET.SubElement(wcs, "_")
            ET.SubElement(wc, "internalNodes").text = (
                f"0 -1 {int(model.feature[k])} "
                f"{float(model.threshold[k]):.10e}"
            )
            ET.SubElement(wc, "leafValues").text = (
                f"{float(model.left[k]):.10e} {float(model.right[k]):.10e}"
            )
    feats = ET.SubElement(casc, "features")
    for f in range(model.rects.shape[0]):
        fe = ET.SubElement(feats, "_")
        rects = ET.SubElement(fe, "rects")
        for r in range(3):
            x, y, rw, rh, wt = model.rects[f, r]
            if wt == 0.0:
                continue
            ET.SubElement(rects, "_").text = (
                f"{int(x)} {int(y)} {int(rw)} {int(rh)} {float(wt):.1f}"
            )
        ET.SubElement(fe, "tilted").text = "0"
    tree = ET.ElementTree(root)
    ET.indent(tree)
    with open(path, "wb") as fh:
        fh.write(b"<?xml version=\"1.0\"?>\n")
        tree.write(fh)


def save_opencv_lbp_cascade(model, path: str):
    """Write a trained LBPCascadeModel as the OpenCV LBP cascade XML
    (featureType LBP; internalNodes = [0, -1, featIdx, 8 subset words]),
    round-trippable by ops/cascade.py load_opencv_lbp_cascade."""
    import xml.etree.ElementTree as ET

    wh, ww = model.window
    root = ET.Element("opencv_storage")
    casc = ET.SubElement(root, "cascade")
    casc.set("type_id", "opencv-cascade-classifier")
    ET.SubElement(casc, "stageType").text = "BOOST"
    ET.SubElement(casc, "featureType").text = "LBP"
    ET.SubElement(casc, "height").text = str(wh)
    ET.SubElement(casc, "width").text = str(ww)
    sp = ET.SubElement(casc, "stageParams")
    counts = np.diff(model.stage_offsets)
    ET.SubElement(sp, "maxWeakCount").text = str(int(counts.max()))
    fp = ET.SubElement(casc, "featureParams")
    ET.SubElement(fp, "maxCatCount").text = "256"
    ET.SubElement(casc, "stageNum").text = str(len(model.stage_thresholds))
    stages = ET.SubElement(casc, "stages")
    for s, sthr in enumerate(model.stage_thresholds):
        st = ET.SubElement(stages, "_")
        ET.SubElement(st, "maxWeakCount").text = str(int(counts[s]))
        ET.SubElement(st, "stageThreshold").text = f"{float(sthr):.10e}"
        wcs = ET.SubElement(st, "weakClassifiers")
        for k in range(model.stage_offsets[s], model.stage_offsets[s + 1]):
            wc = ET.SubElement(wcs, "_")
            # subset words are stored as SIGNED int32 in the XML
            words = " ".join(
                str(int(np.int32(np.uint32(v)))) for v in model.subsets[k]
            )
            ET.SubElement(wc, "internalNodes").text = (
                f"0 -1 {int(model.feature[k])} {words}"
            )
            ET.SubElement(wc, "leafValues").text = (
                f"{float(model.left[k]):.10e} {float(model.right[k]):.10e}"
            )
    feats = ET.SubElement(casc, "features")
    for f in range(model.rects.shape[0]):
        fe = ET.SubElement(feats, "_")
        x, y, rw, rh = (int(v) for v in model.rects[f])
        ET.SubElement(fe, "rect").text = f"{x} {y} {rw} {rh}"
    tree = ET.ElementTree(root)
    ET.indent(tree)
    with open(path, "wb") as fh:
        fh.write(b"<?xml version=\"1.0\"?>\n")
        tree.write(fh)
