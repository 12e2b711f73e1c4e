"""HOG descriptor + sliding-window linear-SVM detector, TPU-native.

Reference: CPU `HOGDescriptor` (objdetect/src/hog.cpp) and the full GPU
pipeline the fork's TBD app drives (cudaobjdetect/src/cuda/hog.cu:
gradient kernels :625/:749, cell-histogram accumulation :134, block
normalization :319, linear-SVM classify :458; host detectMultiScale
cudaobjdetect/src/hog.cpp).

TPU-native re-design: the per-window SVM dot product becomes a single
convolution of the block-feature map with the SVM weight tensor — the
whole sliding-window classifier is one MXU conv per scale instead of the
GPU's one-thread-block-per-window reduction. Cell histograms are built
as a dense [H, W, bins] soft-assignment tensor reduced by reshape-sums
(no scatter atomics).

Default geometry matches the reference's pedestrian detector: 64x128
window, 8x8 cells, 2x2-cell blocks, 8-pixel block stride, 9 unsigned
orientation bins. SVM weights are pluggable; `load_opencv_detector`
adapts a reference-format coefficient vector (e.g. the shipped
getDefaultPeopleDetector, hog.cpp:2174 — data, parsed at runtime, not
copied) to this module's layout.

Feature parity with the reference CPU path (hog.cpp HOGCache::init):
sqrt gamma correction, Gaussian block weighting (sigma = winSigma = 4),
bilinear spatial interpolation of each pixel's vote across the block's
cells, and the exact two-step L2-Hys (first norm denominator
sqrt(sum) + 0.1*blockDim, clip 0.2, renorm sqrt(sum) + 1e-3). Both the
Gaussian and the spatial weights factorize over (y, x), so each block
histogram is a SEPARABLE 16-tap correlation of the dense vote map,
sampled at the block stride — four small convs replace the reference's
per-pixel lookup tables.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


@dataclasses.dataclass(frozen=True)
class HOGConfig:
    win_h: int = 128
    win_w: int = 64
    cell: int = 8
    block_cells: int = 2  # 2x2 cells per block
    n_bins: int = 9
    l2hys_clip: float = 0.2
    gamma: bool = True  # sqrt gamma correction (reference default)

    @property
    def block_px(self):
        return self.cell * self.block_cells

    @property
    def win_sigma(self):
        # getWinSigma (hog.cpp:101): (blockSize.w + blockSize.h) / 8
        return 2.0 * self.block_px / 8.0

    @property
    def cells_y(self):
        return self.win_h // self.cell

    @property
    def cells_x(self):
        return self.win_w // self.cell

    @property
    def blocks_y(self):
        return self.cells_y - self.block_cells + 1

    @property
    def blocks_x(self):
        return self.cells_x - self.block_cells + 1

    @property
    def block_dim(self):
        return self.block_cells * self.block_cells * self.n_bins

    @property
    def descriptor_dim(self):
        return self.blocks_y * self.blocks_x * self.block_dim


def cell_histograms(img: jnp.ndarray, cfg: HOGConfig = HOGConfig()) -> jnp.ndarray:
    """[H/cell, W/cell, n_bins] gradient-orientation histograms.

    Per-pixel magnitude votes split linearly between the two nearest
    unsigned-orientation bins (hog.cpp gradient computation), then summed
    per cell.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape
    hc, wc = h // cfg.cell, w // cfg.cell
    img = img[: hc * cfg.cell, : wc * cfg.cell]
    import numpy as _np
    diff = _np.array([-1.0, 0.0, 1.0], _np.float32)
    one = _np.array([1.0], _np.float32)
    dx = imgproc.sep_filter2d(img, one, diff)
    dy = imgproc.sep_filter2d(img, diff, one)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx) % math.pi  # unsigned [0, pi)
    pos = ang * (cfg.n_bins / math.pi)  # [0, n_bins)
    b0 = jnp.floor(pos - 0.5) % cfg.n_bins
    frac = (pos - 0.5) - jnp.floor(pos - 0.5)
    b1 = (b0 + 1) % cfg.n_bins
    bins = jnp.arange(cfg.n_bins, dtype=jnp.float32)
    votes = (
        mag[..., None]
        * (
            (bins == b0[..., None]) * (1.0 - frac[..., None])
            + (bins == b1[..., None]) * frac[..., None]
        )
    )  # [H, W, bins]
    cells = votes.reshape(hc, cfg.cell, wc, cfg.cell, cfg.n_bins).sum(axis=(1, 3))
    return cells


def vote_map(img: jnp.ndarray, cfg: HOGConfig = HOGConfig()) -> jnp.ndarray:
    """Dense per-pixel orientation votes [H, W, n_bins]: gradient of the
    (optionally sqrt-gamma-corrected) image, magnitude split linearly
    between the two nearest unsigned bins (hog.cpp computeGradient)."""
    img = img.astype(jnp.float32)
    if cfg.gamma:
        img = jnp.sqrt(jnp.maximum(img, 0.0))
    import numpy as _np
    diff = _np.array([-1.0, 0.0, 1.0], _np.float32)
    one = _np.array([1.0], _np.float32)
    dx = imgproc.sep_filter2d(img, one, diff)
    dy = imgproc.sep_filter2d(img, diff, one)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx) % math.pi  # unsigned [0, pi)
    pos = ang * (cfg.n_bins / math.pi)
    b0 = jnp.floor(pos - 0.5) % cfg.n_bins
    frac = (pos - 0.5) - jnp.floor(pos - 0.5)
    b1 = (b0 + 1) % cfg.n_bins
    bins = jnp.arange(cfg.n_bins, dtype=jnp.float32)
    return mag[..., None] * (
        (bins == b0[..., None]) * (1.0 - frac[..., None])
        + (bins == b1[..., None]) * frac[..., None]
    )


def _block_taps(cfg: HOGConfig):
    """Per-axis block filter taps [block_cells, block_px] combining the
    Gaussian window and the bilinear cell-interpolation weight; both
    factorize over (y, x) (hog.cpp HOGCache::init:657-846)."""
    import numpy as _np

    b = cfg.block_px
    center = b * 0.5
    g = _np.exp(-((_np.arange(b) - center) ** 2) / (2.0 * cfg.win_sigma ** 2))
    w = _np.zeros((cfg.block_cells, b), _np.float32)
    for j in range(b):
        cellpos = (j + 0.5) / cfg.cell - 0.5
        i0 = int(_np.floor(cellpos))
        f = cellpos - i0
        if 0 <= i0 < cfg.block_cells:
            w[i0, j] += 1.0 - f
        if 0 <= i0 + 1 < cfg.block_cells:
            w[i0 + 1, j] += f
    return (w * g[None, :]).astype(_np.float32)  # [bc, b]


def _l2hys(feat: jnp.ndarray, cfg: HOGConfig) -> jnp.ndarray:
    """Exact reference L2-Hys (hog.cpp normalizeBlockHistogram:1163,1230):
    scale1 = 1/(sqrt(sum) + 0.1*blockDim), clip, scale2 = 1/(sqrt(sum)+1e-3)."""
    s1 = 1.0 / (jnp.sqrt(jnp.sum(feat * feat, -1, keepdims=True)) + 0.1 * cfg.block_dim)
    feat = jnp.minimum(feat * s1, cfg.l2hys_clip)
    s2 = 1.0 / (jnp.sqrt(jnp.sum(feat * feat, -1, keepdims=True)) + 1e-3)
    return feat * s2


def block_histograms(img: jnp.ndarray, cfg: HOGConfig = HOGConfig()) -> jnp.ndarray:
    """[BY, BX, block_dim] L2-Hys block features at block stride = cell,
    with reference-exact Gaussian + bilinear weighting. Block-internal
    layout matches the reference: (cell_x, cell_y, bin), cx outer
    (cascadedetect-free zone — hog.cpp:778 histOfs)."""
    v = vote_map(img, cfg)  # [H, W, bins]
    h, w, nb = v.shape
    taps = _block_taps(cfg)  # [bc, b]
    b, bc, cell = cfg.block_px, cfg.block_cells, cfg.cell
    by = (h - b) // cell + 1
    bx = (w - b) // cell + 1
    # y-pass: correlate rows with each cell's y-taps, sample at stride
    x = v.transpose(2, 0, 1)[:, None]  # [bins, 1, H, W]
    ky = jnp.asarray(taps)[:, None, :, None]  # [bc(out), 1(in), b, 1]
    dn = lax.conv_dimension_numbers(x.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    ypass = lax.conv_general_dilated(x, ky, (cell, 1), "VALID", dimension_numbers=dn)
    # [bins, bc_y, BY, W]
    kx = jnp.asarray(taps)[:, None, None, :]  # [bc(out), 1(in), 1, b]
    outs = []
    for cy in range(bc):
        xi = ypass[:, cy : cy + 1]  # [bins, 1, BY, W]
        dn2 = lax.conv_dimension_numbers(xi.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
        o = lax.conv_general_dilated(xi, kx, (1, cell), "VALID", dimension_numbers=dn2)
        outs.append(o)  # [bins, bc_x, BY, BX]
    # assemble [BY, BX, cx, cy, bin] -> flatten (cx, cy, bin)
    stack = jnp.stack(outs, axis=2)  # [bins, bc_x, bc_y, BY, BX]
    feat = stack.transpose(3, 4, 1, 2, 0).reshape(by, bx, bc * bc * nb)
    return _l2hys(feat, cfg)


def load_opencv_detector(coeffs) -> tuple[jnp.ndarray, float]:
    """Adapt a reference-format HOG SVM vector (e.g. the shipped
    getDefaultPeopleDetector, hog.cpp:2174: 3780 weights + rho appended)
    to this module's (weights, bias). Reference block order is
    column-major (hog.cpp:854 blockData[j*nblocks.height + i]); ours is
    row-major."""
    import numpy as _np

    cfg = HOGConfig()
    vec = _np.asarray(coeffs, _np.float32)
    d = cfg.descriptor_dim
    if vec.size not in (d, d + 1):
        raise ValueError(f"expected {d} or {d + 1} coefficients, got {vec.size}")
    rho = float(vec[d]) if vec.size == d + 1 else 0.0
    w = vec[:d].reshape(cfg.blocks_x, cfg.blocks_y, cfg.block_dim)
    w = w.transpose(1, 0, 2).reshape(-1)
    return jnp.asarray(w), rho  # detect() (hog.cpp): s = rho + w.x, hit if s >= thr


def block_features(cells: jnp.ndarray, cfg: HOGConfig = HOGConfig()) -> jnp.ndarray:
    """[blocks_y, blocks_x, block_dim] L2-Hys-normalized block features
    over the whole image's cell grid (block stride = one cell)."""
    hc, wc, nb = cells.shape
    bc = cfg.block_cells
    by, bx = hc - bc + 1, wc - bc + 1
    parts = []
    for dy in range(bc):
        for dx in range(bc):
            parts.append(cells[dy : dy + by, dx : dx + bx, :])
    feat = jnp.concatenate(parts, axis=-1)  # [by, bx, bc*bc*nb]
    # L2-Hys: L2 normalize, clip, renormalize (hog.cpp normalizeBlockHistogram)
    eps = 1e-6
    nrm = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True) + eps)
    feat = jnp.clip(feat / nrm, 0.0, cfg.l2hys_clip)
    nrm2 = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True) + eps)
    return feat / nrm2


def compute_descriptor(img: jnp.ndarray, cfg: HOGConfig = HOGConfig()) -> jnp.ndarray:
    """Single-window descriptor [descriptor_dim] for a win_h x win_w image
    (HOGDescriptor::compute analog; reference-exact weighting, row-major
    block order — see load_opencv_detector for the reference's order)."""
    assert img.shape == (cfg.win_h, cfg.win_w), img.shape
    return block_histograms(img, cfg).reshape(-1)


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [K, 4] (x, y, w, h) in original image coords
    scores: jnp.ndarray  # [K]
    valid: jnp.ndarray  # [K]


def score_map(
    img: jnp.ndarray, weights: jnp.ndarray, bias: float | jnp.ndarray,
    cfg: HOGConfig = HOGConfig(),
) -> jnp.ndarray:
    """SVM score for every window position (stride = cell): the sliding-
    window classifier as ONE convolution on the block-feature map."""
    feat = block_histograms(img, cfg)  # [BY, BX, D]
    k = weights.reshape(cfg.blocks_y, cfg.blocks_x, cfg.block_dim)
    x = feat[None].transpose(0, 3, 1, 2)  # NCHW
    kern = k.transpose(2, 0, 1)[None]  # OIHW: [1, D, by, bx]
    dn = lax.conv_dimension_numbers(x.shape, kern.shape, ("NCHW", "OIHW", "NCHW"))
    out = lax.conv_general_dilated(x, kern, (1, 1), "VALID", dimension_numbers=dn)
    return out[0, 0] + bias  # [BY-wby+1, BX-wbx+1]


def detect_multi_scale(
    img: jnp.ndarray,
    weights: jnp.ndarray,
    bias: float,
    cfg: HOGConfig = HOGConfig(),
    scale0: float = 1.05,
    n_scales: int = 8,
    hit_threshold: float = 0.0,
    max_detections: int = 64,
) -> Detections:
    """detectMultiScale analog (cudaobjdetect/src/hog.cpp): score every
    scale, threshold + 3x3 NMS on each score map, merge across scales.
    """
    from opencv_tpu.core.types import masked_top_k

    h, w = img.shape
    all_boxes, all_scores, all_valid = [], [], []
    for si in range(n_scales):
        s = scale0 ** si
        sh, sw = int(h / s), int(w / s)
        if sh < cfg.win_h or sw < cfg.win_w:
            break
        scaled = imgproc.resize_bilinear(img, sh, sw) if si else img.astype(jnp.float32)
        sm = score_map(scaled, weights, bias, cfg)
        keep = (sm > hit_threshold) & imgproc.nms_2d(sm)
        my, mx = sm.shape
        idx, kmask = masked_top_k(sm.reshape(-1), keep.reshape(-1), max_detections)
        by = (idx // mx).astype(jnp.float32)
        bx = (idx % mx).astype(jnp.float32)
        boxes = jnp.stack(
            [
                bx * cfg.cell * s,
                by * cfg.cell * s,
                jnp.full_like(bx, cfg.win_w * s),
                jnp.full_like(by, cfg.win_h * s),
            ],
            axis=-1,
        )
        all_boxes.append(boxes)
        all_scores.append(jnp.where(kmask, sm.reshape(-1)[idx], -jnp.inf))
        all_valid.append(kmask)
    if not all_boxes:
        return Detections(
            boxes=jnp.zeros((max_detections, 4)),
            scores=jnp.full((max_detections,), -jnp.inf),
            valid=jnp.zeros((max_detections,), bool),
        )
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    valid = jnp.concatenate(all_valid)
    idx, kmask = masked_top_k(scores, valid, max_detections)
    return Detections(boxes=boxes[idx], scores=scores[idx], valid=kmask)
