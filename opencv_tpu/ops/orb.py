"""ORB: oriented FAST + rotated BRIEF over a scale pyramid, TPU-native.

Reference pipeline (features2d/src/orb.cpp:965-1204 `detectAndCompute` and
the CUDA variant cudafeatures2d/src/orb.cpp:404-660): per-level FAST →
retain-best cull → Harris rescoring → intensity-centroid orientation →
7x7 σ=2 Gaussian blur → rotated 256-pair binary descriptor.

TPU-native re-design decisions:
- levels unroll at trace time (static shapes per level, SURVEY.md §7.1);
- dynamic keypoint vectors → per-level static budgets + masked top-k
  (replaces both `KeyPointsFilter::retainBest`, features2d/src/keypoint.cpp,
  and the thrust-sort cull, cudafeatures2d/src/cuda/orb.cu:62-89);
- per-keypoint work (orientation, descriptors) is ONE patch gather per
  keypoint followed by dense vectorized arithmetic — the analog of the
  one-CUDA-block-per-keypoint kernels (cuda/orb.cu:166-414) is a vmapped
  dynamic_slice;
- the sampling pattern is a fixed-seed BRIEF pattern generated at import
  (the reference ships a learned table, orb.cpp:375-633; we deliberately
  generate our own — this engine defines its own descriptor, matched
  end-to-end by its own matcher).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from opencv_tpu.core import imgproc, pyramid as pyr_mod
from opencv_tpu.core.config import ORBConfig
from opencv_tpu.core.types import KeyPoints, masked_top_k
from opencv_tpu.ops import fast as fast_mod

HALF_PATCH = 15  # orientation patch radius (reference: orb.cpp ICAngles)
PATTERN_BITS = 256
# BRIEF taps live in [-13, 13]; rotation expands the support by sqrt(2),
# so patches of radius 20 cover every rotated tap.
PATTERN_RADIUS = 13
PATCH_RADIUS = 20


@functools.cache
def brief_pattern() -> np.ndarray:
    """[256, 4] int32 (x1, y1, x2, y2) — fixed-seed Gaussian BRIEF pattern.

    BRIEF-paper sampling (G II): taps ~ N(0, (patch/5)^2) clipped to the
    pattern radius, deterministic seed (parity with the reference's fixed
    RNG seeds, orb.cpp:350,638).
    """
    rng = np.random.default_rng(8823)
    sigma = (2 * PATTERN_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(PATTERN_BITS, 4))
    pts = np.clip(np.round(pts), -PATTERN_RADIUS, PATTERN_RADIUS).astype(np.int32)
    # avoid degenerate identical pairs
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] = np.clip(pts[same, 2] + 1, -PATTERN_RADIUS, PATTERN_RADIUS)
    pts[same, 3] = np.clip(pts[same, 3] - 1, -PATTERN_RADIUS, PATTERN_RADIUS)
    return pts


def extract_patches(img: jnp.ndarray, xy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (2r+1)^2 patches centred at integer keypoint positions.

    img [H, W]; xy [N, 2] float (x, y) — rounded to ints. Starts are
    clamped so out-of-range (invalid/padding) keypoints read a safe window.
    Returns [N, 2r+1, 2r+1].
    """
    h, w = img.shape
    size = 2 * radius + 1
    if h < size or w < size:
        # coarse pyramid levels of small frames can be narrower than the
        # descriptor patch; pad so the slice stays in range (keypoints
        # there are border-masked invalid anyway)
        img = jnp.pad(img, ((0, max(0, size - h)), (0, max(0, size - w))))
        h, w = img.shape
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), radius, w - radius - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), radius, h - radius - 1)

    def one(cx_i, cy_i):
        return jax.lax.dynamic_slice(img, (cy_i - radius, cx_i - radius), (size, size))

    return jax.vmap(one)(cx, cy)


@functools.cache
def _ic_weights(radius: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    size = 2 * radius + 1
    v, u = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    mask = (u * u + v * v) <= radius * radius
    return (
        (u * mask).astype(np.float32),
        (v * mask).astype(np.float32),
        mask.astype(np.float32),
    )


def ic_angle_maps(img: jnp.ndarray, radius: int = HALF_PATCH) -> jnp.ndarray:
    """Dense (m01, m10) circular moments -> per-pixel angle map [H, W].

    The per-keypoint patch version costs a large gather per keypoint; the
    dense form is ~60 shifted reads of two cumsum images (bandwidth-bound,
    fully fused) followed by one tiny scalar gather per keypoint. For the
    circle row at offset v, the horizontal extent is
    umax(v) = floor(sqrt(r^2 - v^2)):
        m01 = sum_v v * rowsum_v,  m10 = sum_u u * colsum_u.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape
    r = radius
    ext = [int(math.floor(math.sqrt(r * r - t * t))) for t in range(-r, r + 1)]
    # horizontal prefix sums, padded so every shifted read is in-bounds
    px = jnp.pad(img, ((r, r), (r + 1, r)))
    ix = jnp.cumsum(px, axis=1)  # [h+2r, w+2r+1]
    m01 = jnp.zeros((h, w), jnp.float32)
    for i, v in enumerate(range(-r, r + 1)):
        if v == 0:
            continue
        u = ext[i]
        # rowsum_v(y, x) = sum_{du=-u..u} img[y+v, x+du]
        hi = ix[r + v : r + v + h, r + 1 + u : r + 1 + u + w]
        lo = ix[r + v : r + v + h, r - u : r - u + w]
        m01 = m01 + float(v) * (hi - lo)
    py = jnp.pad(img, ((r + 1, r), (r, r)))
    iy = jnp.cumsum(py, axis=0)
    m10 = jnp.zeros((h, w), jnp.float32)
    for i, u in enumerate(range(-r, r + 1)):
        if u == 0:
            continue
        v = ext[i]
        hi = iy[r + 1 + v : r + 1 + v + h, r + u : r + u + w]
        lo = iy[r - v : r - v + h, r + u : r + u + w]
        m10 = m10 + float(u) * (hi - lo)
    return jnp.arctan2(m01, m10)


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint, radians in (-pi, pi].

    Analog of ICAngles (orb.cpp:176-210) / the IC_Angle CUDA kernel
    (cuda/orb.cu:166-230): angle = atan2(m01, m10) over a circular patch
    of radius 15. Computed from the dense moment maps (see ic_angle_maps)
    plus one scalar gather per keypoint.
    """
    amap = ic_angle_maps(img)
    h, w = img.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    return amap[yi, xi]


ANGLE_BINS = 32  # rotation quantization of the matmul path (11.25 deg;
# the original ORB paper's lookup used 12 deg — orb.cpp rotates exactly,
# we expose both)


@functools.cache
def _binned_selection_matrix() -> np.ndarray:
    """[ANGLE_BINS * 512, patch_area] one-hot tap-selection matrix.

    Row (q*512 + k) selects the patch pixel hit by tap k rotated by bin
    angle q. Turns the per-keypoint descriptor gather into one big MXU
    matmul (see brief_descriptors)."""
    pat = brief_pattern()
    px = np.concatenate([pat[:, 0], pat[:, 2]]).astype(np.float64)
    py = np.concatenate([pat[:, 1], pat[:, 3]]).astype(np.float64)
    size = 2 * PATCH_RADIUS + 1
    S = np.zeros((ANGLE_BINS * 2 * PATTERN_BITS, size * size), np.float32)
    for q in range(ANGLE_BINS):
        a = 2.0 * math.pi * q / ANGLE_BINS - math.pi
        c, s = math.cos(a), math.sin(a)
        rx = np.round(px * c - py * s).astype(np.int64) + PATCH_RADIUS
        ry = np.round(px * s + py * c).astype(np.int64) + PATCH_RADIUS
        rows = q * 2 * PATTERN_BITS + np.arange(2 * PATTERN_BITS)
        S[rows, ry * size + rx] = 1.0
    return S


def _pack_bits(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    bits = (t1 < t2).astype(jnp.uint32)  # [N, 256]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits.reshape(-1, 8, 32) * weights, axis=2, dtype=jnp.uint32)


def brief_descriptors(
    blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray,
    method: str = "auto",
) -> jnp.ndarray:
    """Rotated 256-bit BRIEF descriptors, packed as uint32 [N, 8].

    Analog of computeOrbDescriptors WTA_K=2 (orb.cpp:214-345): each tap
    position is rotated by the keypoint angle, rounded to the nearest
    pixel of the blurred level image, and pairs are compared.

    method:
      "gather" — exact per-keypoint rotation, one flat N*512 gather
                 (random gathers are slow on TPU: ~7 ms at N=2000);
      "binned" — angle quantized to ANGLE_BINS; tap selection becomes a
                 patches @ one-hot matmul on the MXU (<1 ms) followed by
                 a contiguous per-row slice;
      "auto"   — binned on TPU, gather elsewhere.
    """
    if method == "auto":
        method = "binned" if jax.default_backend() == "tpu" else "gather"
    n = xy.shape[0]
    if method == "gather":
        pat = jnp.asarray(brief_pattern())  # [256, 4]
        px = jnp.concatenate([pat[:, 0], pat[:, 2]]).astype(jnp.float32)
        py = jnp.concatenate([pat[:, 1], pat[:, 3]]).astype(jnp.float32)
        cos = jnp.cos(angle)[:, None]
        sin = jnp.sin(angle)[:, None]
        rx = jnp.round(px[None] * cos - py[None] * sin).astype(jnp.int32)
        ry = jnp.round(px[None] * sin + py[None] * cos).astype(jnp.int32)
        h, w = blurred.shape
        cx = jnp.round(xy[:, 0:1]).astype(jnp.int32)
        cy = jnp.round(xy[:, 1:2]).astype(jnp.int32)
        xi = jnp.clip(cx + rx, 0, w - 1)
        yi = jnp.clip(cy + ry, 0, h - 1)
        vals = blurred.reshape(-1)[yi * w + xi]  # [N, 512]
    else:
        S = jnp.asarray(_binned_selection_matrix(), jnp.bfloat16)  # [B*512, A]
        patches = extract_patches(blurred, xy, PATCH_RADIUS).reshape(n, -1)
        all_vals = jnp.dot(
            patches.astype(jnp.bfloat16), S.T, preferred_element_type=jnp.float32
        )  # [N, B*512]
        qbin = jnp.round(
            (angle + math.pi) * (ANGLE_BINS / (2.0 * math.pi))
        ).astype(jnp.int32) % ANGLE_BINS
        av = all_vals.reshape(n, ANGLE_BINS, 2 * PATTERN_BITS)

        def pick(row, q):
            return jax.lax.dynamic_slice(
                row, (q, jnp.int32(0)), (1, 2 * PATTERN_BITS)
            )[0]

        vals = jax.vmap(pick)(av, qbin)  # [N, 512]
    return _pack_bits(vals[:, :PATTERN_BITS], vals[:, PATTERN_BITS:])


def subpixel_refine(score: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Quadratic sub-pixel peak refinement of integer keypoint positions.

    Fits a 1-D parabola per axis through the 3-neighbourhood of the score
    map (the cornerSubPix idea, imgproc/src/cornersubpix.cpp, reduced to
    the separable quadratic that GFTT-style trackers use). Integer FAST
    positions cost ~0.3 px of localization error — at bootstrap parallax
    of a few px that error dominates two-view geometry, so this matters.
    """
    h, w = score.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 1, w - 2)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 1, h - 2)

    def axis_offset(sm, s0, sp):
        denom = sm - 2.0 * s0 + sp
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (sm - sp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    s0 = score[yi, xi]
    dx = axis_offset(score[yi, xi - 1], s0, score[yi, xi + 1])
    dy = axis_offset(score[yi - 1, xi], s0, score[yi + 1, xi])
    return xy + jnp.stack([dx, dy], axis=-1)


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> list[int]:
    """Geometric per-level feature budget (reference: orb.cpp:798-808)."""
    factor = 1.0 / scale_factor
    first = n_features * (1.0 - factor) / (1.0 - factor ** n_levels)
    budgets = []
    acc = 0
    for lvl in range(n_levels - 1):
        b = int(round(first * factor ** lvl))
        budgets.append(b)
        acc += b
    budgets.append(max(n_features - acc, 0))
    return budgets


def detect_and_compute(
    img: jnp.ndarray, config: ORBConfig = ORBConfig()
) -> tuple[KeyPoints, jnp.ndarray]:
    """Full ORB pipeline (analog of ORB_Impl::detectAndCompute,
    orb.cpp:965-1204). Returns (KeyPoints, descriptors uint32 [N, 8])
    where N = sum of per-level budgets (== n_features up to rounding).
    """
    img = img.astype(jnp.float32)
    pyr = pyr_mod.build_pyramid(img, config.n_levels, config.scale_factor)
    budgets = level_budgets(config.n_features, config.n_levels, config.scale_factor)

    all_kp: list[KeyPoints] = []
    all_desc: list[jnp.ndarray] = []
    for lvl in range(config.n_levels):
        level = pyr.levels[lvl]
        scale = pyr.scales[lvl]
        budget = budgets[lvl]
        if budget == 0:
            continue
        h, w = level.shape
        border = max(config.edge_threshold, PATCH_RADIUS + 1)

        score, corner = fast_mod.fast_corners(level, config.fast_threshold)
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        corner &= (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)

        # stage 1: cull to 2x budget by FAST score (orb.cpp:849-852)
        n_cand = min(2 * budget, h * w)
        cand_idx, cand_keep = masked_top_k(score.reshape(-1), corner.reshape(-1), n_cand)
        cxy = jnp.stack(
            [(cand_idx % w).astype(jnp.float32), (cand_idx // w).astype(jnp.float32)],
            axis=-1,
        )

        # stage 2: Harris rescoring + final cull (orb.cpp:897-918)
        harris = imgproc.harris_response(level, block_size=config.harris_block)
        cand_harris = harris.reshape(-1)[cand_idx]
        sel, keep = masked_top_k(cand_harris, cand_keep, budget)
        xy = subpixel_refine(score, cxy[sel])
        resp = jnp.where(keep, cand_harris[sel], -jnp.inf)

        # orientation on the raw level (orb.cpp:946)
        angle = ic_angles(level, xy)

        # descriptors on the blurred level (orb.cpp:1168-1200)
        blurred = imgproc.gaussian_blur(level, 7, 2.0)
        desc = brief_descriptors(blurred, xy, angle)

        all_kp.append(
            KeyPoints(
                xy=xy * scale,
                response=resp,
                angle=angle,
                level=jnp.full((budget,), lvl, jnp.int32),
                size=jnp.full((budget,), config.patch_size * scale, jnp.float32),
                valid=keep,
            )
        )
        all_desc.append(desc)

    kp = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *all_kp)
    desc = jnp.concatenate(all_desc, axis=0)
    return kp, desc
