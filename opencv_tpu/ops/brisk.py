"""BRISK — binary robust invariant scalable keypoints, TPU-native.

Reference: features2d/src/brisk.cpp (2.4k LoC): AGAST 9_16 detection over
a scale-space of octaves + intra-octaves with cross-scale nonmax and
sub-scale refinement; description from a fixed concentric sampling
pattern (rings of points, each smoothed with a sigma proportional to its
ring spacing), orientation from long-distance point pairs, and a 512-bit
descriptor of short-pair intensity comparisons
(`BriskDescriptorExtractor::generateKernel` / `computeImpl`).

TPU-native design:
- detection reuses the AGAST score (ops/agast.py — the same shift-min
  vector formulation, no decision trees) per pyramid level; per-level
  masked top-k replaces the sequential cross-scale suppression.
- per-point Gaussian smoothing becomes a *sigma ladder*: a small stack of
  pre-blurred images; every pattern sample reads all ladder levels with
  one batched bilinear gather and selects its level with a one-hot dot —
  branch-free, fuses into two gathers + one matmul-like contraction.
- rotation: pattern positions are rotated per keypoint (vmap), not the
  image; long pairs vote a gradient direction exactly as in the paper.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc, pyramid
from opencv_tpu.core.types import KeyPoints, masked_top_k
from opencv_tpu.ops import agast

# --- the BRISK sampling pattern (paper layout; brisk.cpp generateKernel
# radiusList {0, 2.865, 4.9, 7.4, 10.8}, numberList {1, 10, 14, 15, 20}) ---
_RADII = (0.0, 2.865, 4.9, 7.4, 10.8)
_COUNTS = (1, 10, 14, 15, 20)
N_POINTS = sum(_COUNTS)  # 60
N_SHORT = 512  # short pairs -> descriptor bits (paper: exactly 512)
_D_MAX = 9.75   # short-pair max distance (pattern units)
_D_MIN = 13.67  # long-pair min distance


def _make_pattern():
    pts, sigmas = [], []
    for r, n in zip(_RADII, _COUNTS):
        # sigma proportional to on-ring point spacing (paper sec. 4.2)
        sigma = 0.5 if n == 1 else max(0.5, 0.85 * r * math.sin(math.pi / n))
        for i in range(n):
            a = 2.0 * math.pi * i / n
            pts.append((r * math.cos(a), r * math.sin(a)))
            sigmas.append(sigma)
    pts = np.asarray(pts, np.float32)  # [60, 2] (x, y)
    sigmas = np.asarray(sigmas, np.float32)

    ii, jj = np.triu_indices(N_POINTS, k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=1)
    long_mask = d > _D_MIN
    # short pairs: the N_SHORT closest (all have d < _D_MAX for this pattern)
    order = np.argsort(d)
    short = order[:N_SHORT]
    assert d[short].max() < _D_MAX + 1.0
    return (
        pts,
        sigmas,
        np.stack([ii[short], jj[short]], 1),      # [512, 2]
        np.stack([ii[long_mask], jj[long_mask]], 1),  # [L, 2]
    )


PATTERN_XY, PATTERN_SIGMA, SHORT_PAIRS, LONG_PAIRS = _make_pattern()

# sigma ladder for smoothed sampling (geometric, covers sigma*scale range)
_LADDER = np.asarray([0.5, 0.8, 1.3, 2.1, 3.4, 5.4, 8.6, 13.8], np.float32)


def _blur_stack(img: jnp.ndarray) -> jnp.ndarray:
    """[S, H, W] stack of Gaussian-blurred copies at the sigma ladder."""
    outs = []
    for s in _LADDER:
        k = int(2 * math.ceil(2.5 * s) + 1)
        outs.append(imgproc.gaussian_blur(img, ksize=min(k, 31), sigma=float(s)))
    return jnp.stack(outs, axis=0)


def _pack_bits_u32(bits: jnp.ndarray) -> jnp.ndarray:
    """bool [N, B] -> uint32 [N, B//32] (bit j of word w = bits[:, 32w+j],
    the layout matching.unpack_bits expects)."""
    n, b = bits.shape
    words = bits.reshape(n, b // 32, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)


def _sample_pattern(
    stack: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """Smoothed pattern samples [K, 60] at rotated+scaled positions.

    stack [S,H,W]; xy [K,2]; angle [K] rad; scale [K] (pattern units ->
    pixels). Each point reads the ladder level nearest to sigma_i*scale.
    """
    pat = jnp.asarray(PATTERN_XY)  # [60, 2]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], -2
    )  # [K, 2, 2]
    pos = xy[:, None, :] + scale[:, None, None] * jnp.einsum(
        "kab,pb->kpa", rot, pat
    )  # [K, 60, 2]
    flat = pos.reshape(-1, 2)
    vals = jax.vmap(lambda im: imgproc.bilinear_sample(im, flat))(stack)
    vals = vals.reshape(len(_LADDER), -1, N_POINTS)  # [S, K, 60]

    sig = jnp.asarray(PATTERN_SIGMA)[None, :] * scale[:, None]  # [K, 60]
    ladder = jnp.asarray(_LADDER)
    lidx = jnp.argmin(jnp.abs(jnp.log(sig[..., None]) - jnp.log(ladder)), -1)
    onehot = jax.nn.one_hot(lidx, len(_LADDER), dtype=vals.dtype)  # [K,60,S]
    return jnp.einsum("skp,kps->kp", vals, onehot)


def brisk_compute(
    img: jnp.ndarray, kp: KeyPoints, pattern_scale: float = 1.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """512-bit BRISK descriptors for given keypoints.

    Returns (desc uint32 [K, 16], angle [K] rad). Keypoint scale comes
    from kp.size / 12 (the pattern's nominal diameter ~= 24 px at scale 2,
    brisk.cpp scales the pattern by size/12 equivalently).
    """
    img = img.astype(jnp.float32)
    stack = _blur_stack(img)
    scale = pattern_scale * jnp.maximum(kp.size, 1.0) / 12.0

    # orientation from long pairs on the unrotated pattern
    v0 = _sample_pattern(stack, kp.xy, jnp.zeros_like(scale), scale)  # [K,60]
    li, lj = jnp.asarray(LONG_PAIRS[:, 0]), jnp.asarray(LONG_PAIRS[:, 1])
    pat = jnp.asarray(PATTERN_XY)
    dxy = (pat[lj] - pat[li])[None] * scale[:, None, None]  # [K, L, 2]
    dval = v0[:, lj] - v0[:, li]  # [K, L]
    d2 = jnp.maximum(jnp.sum(dxy * dxy, -1), 1e-6)
    g = jnp.sum(dxy * (dval / d2)[..., None], axis=1)  # [K, 2]
    angle = jnp.arctan2(g[:, 1], g[:, 0])

    v = _sample_pattern(stack, kp.xy, angle, scale)  # [K, 60]
    si, sj = jnp.asarray(SHORT_PAIRS[:, 0]), jnp.asarray(SHORT_PAIRS[:, 1])
    bits = v[:, si] < v[:, sj]  # [K, 512]
    return _pack_bits_u32(bits), angle


def brisk_detect_and_compute(
    img: jnp.ndarray,
    max_keypoints: int = 512,
    threshold: float = 30.0,
    n_levels: int = 4,
    pattern_scale: float = 1.0,
) -> tuple[KeyPoints, jnp.ndarray]:
    """BRISK detect + describe (analog of BRISK::create(thresh=30,
    octaves=3, patternScale=1), brisk.cpp).

    Detection: AGAST 9_16 score per pyramid level (octave+intra layout is
    expressed as a sqrt(2)-spaced pyramid), per-level NMS, per-level
    budgets, global top-k. Returns (KeyPoints [K], desc uint32 [K, 16]).
    """
    img = img.astype(jnp.float32)
    scale_factor = math.sqrt(2.0)
    pyr = pyramid.build_pyramid(img, n_levels, scale_factor)
    per_level = max(1, max_keypoints // n_levels)

    xs, ys, resp, levels, valids = [], [], [], [], []
    for lvl in range(n_levels):
        level_img = pyr.levels[lvl]
        w = level_img.shape[1]
        score = agast.agast_score(level_img, agast.OAST_9_16)
        corner = score > threshold
        corner &= imgproc.nms_2d(jnp.where(corner, score, -jnp.inf))
        idx, keep = masked_top_k(score.reshape(-1), corner.reshape(-1), per_level)
        s = pyr.scales[lvl]
        xs.append((idx % w).astype(jnp.float32) * s)
        ys.append((idx // w).astype(jnp.float32) * s)
        resp.append(jnp.where(keep, score.reshape(-1)[idx], -jnp.inf))
        levels.append(jnp.full((per_level,), lvl, jnp.int32))
        valids.append(keep)

    n = per_level * n_levels
    kp = KeyPoints(
        xy=jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], -1),
        response=jnp.concatenate(resp),
        angle=jnp.zeros((n,), jnp.float32),
        level=jnp.concatenate(levels),
        size=12.0 * (scale_factor ** jnp.concatenate(levels).astype(jnp.float32)),
        valid=jnp.concatenate(valids),
    )
    desc, angle = brisk_compute(img, kp, pattern_scale)
    kp = KeyPoints(kp.xy, kp.response, angle, kp.level, kp.size, kp.valid)
    return kp, desc
