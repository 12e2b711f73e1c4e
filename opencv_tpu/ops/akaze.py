"""KAZE/AKAZE — nonlinear-diffusion features, TPU-native.

Reference: features2d/src/{kaze.cpp,akaze.cpp} + kaze/ (4.3k LoC):
a nonlinear scale space built with Fast Explicit Diffusion (FED) over a
Perona-Malik conductivity, scale-normalized Hessian-determinant extrema
across evolution levels, SURF-like dominant-orientation estimation, and
the binary M-LDB descriptor (486 bits: mean intensity + mean x/y
derivative comparisons over 2x2 / 3x3 / 4x4 grids; kaze/AKAZEFeatures.cpp
`Get_Upright_MLDB_Full_Descriptor`).

TPU-native design:
- the evolution stack stays at FULL resolution ([L, H, W] instead of the
  reference's per-octave downsampling): every FED step is one 3x3 stencil
  the VPU eats whole, the stack is a statically-shaped tensor, and the
  descriptor can gather from any level with a flat 4-tap bilinear read —
  no ragged per-octave buffers.
- FED cycle lengths/taus are computed at trace time (static per level);
  the diffusion loop is an unrolled sequence of fused stencils.
- detection: elementwise det(Hessian) over the stack, 3x3 spatial NMS +
  level-neighbour comparison, masked top-k (no sequential extrema lists).
- M-LDB cell means are approximated by a 3x3 subsample average per cell
  (the reference averages every pixel in the cell; at TPU batch sizes the
  9-point average is within noise) with positions rotated per keypoint.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.types import KeyPoints, masked_top_k
from opencv_tpu.ops.brisk import _pack_bits_u32


# ---------------------------------------------------------------- FED ---

def fed_taus(total_time: float, tau_max: float = 0.25) -> np.ndarray:
    """FED step sizes whose sum is `total_time` (Grewenig et al.; the
    reference's kaze/fed.cpp `fed_tau_by_process_time` with one cycle)."""
    n = int(math.ceil(math.sqrt(3.0 * total_time / tau_max + 0.25) - 0.5 - 1e-8))
    n = max(n, 1)
    scale = 3.0 * total_time / (tau_max * n * (n + 1))
    j = np.arange(n)
    taus = scale * tau_max / (2.0 * np.cos(np.pi * (2 * j + 1) / (4 * n + 2)) ** 2)
    return taus.astype(np.float32)


def _diffusion_step(L: jnp.ndarray, g: jnp.ndarray, tau: float) -> jnp.ndarray:
    """One explicit step L += tau * div(g grad L) (kaze/nldiffusion_functions.cpp
    `nld_step_scalar` discretization)."""
    def flux(dy, dx):
        Ln = imgproc.shift2d(L, dy, dx, fill=0.0)
        gn = imgproc.shift2d(g, dy, dx, fill=0.0)
        # replicate boundary: outside neighbours contribute zero flux
        h, w = L.shape
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inside = (
            (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)
        )
        return jnp.where(inside, (g + gn) * (Ln - L), 0.0)

    div = 0.5 * (flux(0, 1) + flux(0, -1) + flux(1, 0) + flux(-1, 0))
    return L + tau * div


def _contrast_k(img: jnp.ndarray, percentile: float = 70.0) -> jnp.ndarray:
    """Contrast factor: the given percentile of gradient magnitude over a
    pre-smoothed image (kaze/nldiffusion_functions.cpp `compute_k_percentile`)."""
    s = imgproc.gaussian_blur(img, ksize=7, sigma=1.0)
    gx, gy = imgproc.scharr_derivatives(s)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.maximum(jnp.percentile(mag.reshape(-1), percentile), 1e-6)


def nonlinear_scale_space(
    img: jnp.ndarray,
    n_levels: int = 8,
    sigma0: float = 1.6,
    sublevels: int = 4,
) -> tuple[jnp.ndarray, np.ndarray]:
    """Full-resolution nonlinear scale space.

    Returns (stack [L, H, W], sigmas [L]); sigma_i = sigma0 * 2^(i/sublevels)
    — the reference's octave/sublevel ladder flattened to one axis.
    Conductivity: Perona-Malik g2 = 1 / (1 + |grad L|^2 / k^2), recomputed
    at the start of every evolution level as in AKAZEFeatures.
    """
    img = img.astype(jnp.float32) / 255.0
    sigmas = sigma0 * 2.0 ** (np.arange(n_levels) / sublevels)
    L = imgproc.gaussian_blur(img, ksize=int(2 * math.ceil(2 * sigma0) + 1),
                              sigma=sigma0)
    k = _contrast_k(img)
    k2 = k * k
    levels = [L]
    for i in range(1, n_levels):
        t_prev = 0.5 * sigmas[i - 1] ** 2
        t_next = 0.5 * sigmas[i] ** 2
        gx, gy = imgproc.scharr_derivatives(
            imgproc.gaussian_blur(L, ksize=5, sigma=1.0)
        )
        g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
        for tau in fed_taus(float(t_next - t_prev)):
            L = _diffusion_step(L, g, float(tau))
        levels.append(L)
    return jnp.stack(levels, axis=0), sigmas.astype(np.float32)


# ---------------------------------------------------------- detection ---

def hessian_response(stack: jnp.ndarray, sigmas: np.ndarray) -> jnp.ndarray:
    """Scale-normalized det(Hessian) per level: sigma^4 (Lxx Lyy - Lxy^2)."""
    def one(L, s2):
        gx, gy = imgproc.scharr_derivatives(L)
        gxx, gxy = imgproc.scharr_derivatives(gx)
        _, gyy = imgproc.scharr_derivatives(gy)
        return s2 * s2 * (gxx * gyy - gxy * gxy)

    s2 = jnp.asarray(sigmas * sigmas)
    return jax.vmap(one)(stack, s2)


def _flat_bilinear(stack: jnp.ndarray, lvl: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of stack[lvl] at xy; lvl i32 [..], xy f32 [.., 2].
    One gather on the flattened [L*H*W] buffer — the static-shape answer
    to 'which evolution image does this keypoint live on'."""
    _, h, w = stack.shape
    flat = stack.reshape(-1)
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    base = lvl * (h * w)

    def at(yi, xi):
        return flat[base + yi * w + xi]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def akaze_detect(
    stack: jnp.ndarray,
    sigmas: np.ndarray,
    max_keypoints: int = 512,
    threshold: float = 0.001,
) -> KeyPoints:
    """Hessian extrema over the evolution stack (AKAZEFeatures
    `Find_Scale_Space_Extremas`): 3x3 spatial NMS per level, must beat the
    same pixel on neighbouring levels, masked top-k."""
    nlev, h, w = stack.shape
    resp = hessian_response(stack, sigmas)  # [L, H, W]
    neg = jnp.float32(-1e9)

    spatial = jax.vmap(lambda r: imgproc.nms_2d(r))(resp)
    up = jnp.concatenate([resp[1:], jnp.full_like(resp[:1], neg)], 0)
    dn = jnp.concatenate([jnp.full_like(resp[:1], neg), resp[:-1]], 0)
    is_max = spatial & (resp >= up) & (resp >= dn) & (resp > threshold)

    # border: the descriptor needs ~12*sigma of room; use a fixed margin
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    margin = 8
    inside = (
        (yy >= margin) & (yy < h - margin) & (xx >= margin) & (xx < w - margin)
    )
    is_max &= inside[None]

    idx, keep = masked_top_k(resp.reshape(-1), is_max.reshape(-1), max_keypoints)
    lvl = (idx // (h * w)).astype(jnp.int32)
    rem = idx % (h * w)
    ys = (rem // w).astype(jnp.float32)
    xs = (rem % w).astype(jnp.float32)
    sig = jnp.asarray(sigmas)[lvl]
    return KeyPoints(
        xy=jnp.stack([xs, ys], -1),
        response=jnp.where(keep, resp.reshape(-1)[idx], -jnp.inf),
        angle=jnp.zeros((max_keypoints,), jnp.float32),
        level=lvl,
        size=2.0 * sig,
        valid=keep,
    )


# --------------------------------------------------------- descriptor ---

def _mldb_cells():
    """Static cell-centre offsets (unit patch [-1,1]^2) and pair indices
    for the 2x2 + 3x3 + 4x4 grids: 29 cells, 162 pairs, x3 channels = 486."""
    centers = []
    for d in (2, 3, 4):
        step = 2.0 / d
        for i in range(d):
            for j in range(d):
                centers.append((-1 + step * (j + 0.5), -1 + step * (i + 0.5)))
    sizes = [2.0 / d for d in (2, 3, 4) for _ in range(d * d)]
    # pairs within each grid only
    pairs = []
    off = 0
    for d in (2, 3, 4):
        n = d * d
        for a in range(n):
            for b in range(a + 1, n):
                pairs.append((off + a, off + b))
        off += n
    return (
        np.asarray(centers, np.float32),
        np.asarray(sizes, np.float32),
        np.asarray(pairs, np.int32),
    )


_CELLS, _CELL_SIZE, _PAIRS = _mldb_cells()
_SUB = np.stack(
    np.meshgrid(np.linspace(-1 / 3, 1 / 3, 3), np.linspace(-1 / 3, 1 / 3, 3)),
    -1,
).reshape(-1, 2).astype(np.float32)  # 3x3 subsample per cell
MLDB_BITS = 3 * _PAIRS.shape[0]  # 486


def akaze_compute(
    stack: jnp.ndarray, sigmas: np.ndarray, kp: KeyPoints
) -> jnp.ndarray:
    """M-LDB descriptors, packed uint32 [K, 16] (486 bits + zero padding).

    Channels per cell: mean intensity, mean rotated x-derivative, mean
    rotated y-derivative, on the keypoint's own evolution level."""
    gx, gy = jax.vmap(imgproc.scharr_derivatives)(stack)
    sig = jnp.asarray(sigmas)[kp.level]
    radius = 5.0 * sig  # patch half-size in pixels

    # orientation: gradient vote in a circle of radius 6*sigma
    circle = []
    for r in (0.4, 0.8):
        for a in range(8):
            t = 2 * math.pi * a / 8
            circle.append((r * math.cos(t), r * math.sin(t)))
    circle = jnp.asarray(circle, jnp.float32)  # [16, 2] unit offsets
    opos = kp.xy[:, None, :] + 6.0 * sig[:, None, None] * circle[None]
    lvlb = jnp.broadcast_to(kp.level[:, None], opos.shape[:2])
    ogx = _flat_bilinear(gx, lvlb, opos)
    ogy = _flat_bilinear(gy, lvlb, opos)
    angle = jnp.arctan2(jnp.sum(ogy, 1), jnp.sum(ogx, 1))

    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack([jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], -2)

    # cell subsample positions: [29 cells * 9 subs, 2] in unit patch coords
    pts = (
        jnp.asarray(_CELLS)[:, None, :]
        + 0.5 * jnp.asarray(_CELL_SIZE)[:, None, None] * jnp.asarray(_SUB)[None]
    ).reshape(-1, 2)  # [261, 2]
    pos = kp.xy[:, None, :] + radius[:, None, None] * jnp.einsum(
        "kab,pb->kpa", rot, pts
    )  # [K, 261, 2]
    lvlp = jnp.broadcast_to(kp.level[:, None], pos.shape[:2])
    vi = _flat_bilinear(stack, lvlp, pos).reshape(-1, _CELLS.shape[0], 9)
    vx = _flat_bilinear(gx, lvlp, pos).reshape(-1, _CELLS.shape[0], 9)
    vy = _flat_bilinear(gy, lvlp, pos).reshape(-1, _CELLS.shape[0], 9)
    mi = jnp.mean(vi, -1)  # [K, 29]
    mx0 = jnp.mean(vx, -1)
    my0 = jnp.mean(vy, -1)
    # rotate gradients into the keypoint frame
    mx = ca[:, None] * mx0 + sa[:, None] * my0
    my = -sa[:, None] * mx0 + ca[:, None] * my0

    pa, pb = jnp.asarray(_PAIRS[:, 0]), jnp.asarray(_PAIRS[:, 1])
    bits = jnp.concatenate(
        [mi[:, pa] > mi[:, pb], mx[:, pa] > mx[:, pb], my[:, pa] > my[:, pb]],
        axis=1,
    )  # [K, 486]
    pad = jnp.zeros((bits.shape[0], 512 - MLDB_BITS), bool)
    return _pack_bits_u32(jnp.concatenate([bits, pad], 1))


def akaze_detect_and_compute(
    img: jnp.ndarray,
    max_keypoints: int = 512,
    threshold: float = 0.001,
    n_levels: int = 8,
) -> tuple[KeyPoints, jnp.ndarray]:
    """AKAZE detect + describe (analog of AKAZE::create with
    DESCRIPTOR_MLDB; akaze.cpp). Returns (KeyPoints, desc uint32 [K,16])."""
    stack, sigmas = nonlinear_scale_space(img, n_levels=n_levels)
    kp = akaze_detect(stack, sigmas, max_keypoints, threshold)
    desc = akaze_compute(stack, sigmas, kp)
    return kp, desc
