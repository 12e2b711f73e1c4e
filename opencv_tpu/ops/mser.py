"""MSER — maximally stable extremal regions, TPU-native.

Reference: features2d/src/mser.cpp (1.1k LoC) builds a component tree by
flooding pixels in gray-level order with a linked-list union-find, then
walks the tree checking the stability criterion

    var(R, t) = (|R at t+delta| - |R at t-delta|) / |R at t|

and emits regions that are local minima of `var` with
min_area <= |R| <= max_area and var < max_variation, pruned for diversity.

TPU-native design: the component tree is a pointer structure XLA cannot
express, but its *levels* are just thresholded masks. We sweep a fixed
ladder of thresholds (lax.scan), label each level with the iterative
min-label connected-components pass (ops/ccomp.py), and read region sizes
per pixel from a scatter-added area table. Stability is then a pure
elementwise computation over the [L, H, W] size stack, and "one region
per tree node" falls out of each component's canonical min-index pixel.
Everything is static-shaped; regions are extracted with masked top-k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core.types import masked_top_k
from opencv_tpu.ops.ccomp import connected_components


class MSERRegions(NamedTuple):
    xy: jnp.ndarray        # [K, 2] region centroids (x, y)
    area: jnp.ndarray      # [K]
    bbox: jnp.ndarray      # [K, 4] (x0, y0, x1, y1) inclusive
    threshold: jnp.ndarray # [K] gray level at which the region was taken
    stability: jnp.ndarray # [K] variation (lower = more stable)
    valid: jnp.ndarray     # [K] bool


def _level_stack(img: jnp.ndarray, thresholds: jnp.ndarray):
    """labels [L,H,W] i32 and per-pixel component sizes [L,H,W] f32 for
    the extremal sets {p : img(p) <= t}."""
    h, w = img.shape
    n = h * w + 2

    def level(_, t):
        mask = img <= t
        labels = connected_components(mask, connectivity=4)
        flat = labels.reshape(-1)
        area = jnp.zeros((n,), jnp.float32).at[flat].add(
            (flat > 0).astype(jnp.float32)
        )
        return None, (labels, area[flat].reshape(h, w))

    _, (labels, sizes) = lax.scan(level, None, thresholds)
    return labels, sizes


def mser_detect(
    img: jnp.ndarray,
    max_regions: int = 64,
    delta: int = 5,
    min_area: float = 60.0,
    max_area: float = 14400.0,
    max_variation: float = 0.25,
    min_diversity: float = 0.2,
    dark_on_bright: bool = True,
    level_step: int = 4,
) -> MSERRegions:
    """MSER analog of cv::MSER::detectRegions (mser.cpp; defaults match
    MSER::create: delta=5, min_area=60, max_area=14400, max_variation=.25,
    min_diversity=.2). `dark_on_bright=False` runs MSER+ on the inverted
    image. `level_step` is the gray-level stride of the threshold ladder
    (the reference visits every level; a stride trades tree resolution
    for L/step fewer labeling passes).
    """
    img = img.astype(jnp.float32)
    if not dark_on_bright:
        img = 255.0 - img
    h, w = img.shape
    thresholds = jnp.arange(0, 256, level_step, dtype=jnp.float32)
    nlev = thresholds.shape[0]
    dlev = max(1, round(delta / level_step))

    labels, sizes = _level_stack(img, thresholds)  # [L,H,W]

    # variation per (level, pixel); out-of-ladder neighbours clamp (the
    # reference clamps at the tree root/leaves the same way)
    up = jnp.concatenate([sizes[dlev:], jnp.tile(sizes[-1:], (dlev, 1, 1))], 0)
    dn = jnp.concatenate([jnp.tile(sizes[:1], (dlev, 1, 1)), sizes[:-dlev]], 0)
    var = (up - dn) / jnp.maximum(sizes, 1.0)

    # a region candidate = the canonical (min-index) pixel of a component
    # at a level where var is a local minimum along the level axis
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        + 1
    )
    rep = labels == idx[None]  # [L,H,W] canonical pixel of its component
    big = jnp.float32(1e9)
    var_p = jnp.where(rep, var, big)
    above = jnp.concatenate([jnp.full_like(var_p[:1], big), var_p[:-1]], 0)
    below = jnp.concatenate([var_p[1:], jnp.full_like(var_p[:1], big)], 0)
    local_min = (var_p <= above) & (var_p <= below)
    ok = (
        rep
        & local_min
        & (var < max_variation)
        & (sizes >= min_area)
        & (sizes <= max_area)
    )

    # over-select then diversity-prune: nested same-seed regions at nearby
    # levels collapse to the most stable representative
    k0 = max_regions * 4
    flat_ok = ok.reshape(-1)
    flat_var = var.reshape(-1)
    cand, keep = masked_top_k(-flat_var, flat_ok, k0)
    lev = cand // (h * w)
    pix = cand % (h * w)
    seed = labels.reshape(nlev, -1)[lev, pix]  # component min-index id
    carea = sizes.reshape(nlev, -1)[lev, pix]
    cvar = flat_var[cand]

    # candidate i dies if a strictly-more-stable candidate j has the same
    # seed pixel and relative area difference < min_diversity
    same = (seed[:, None] == seed[None, :]) & keep[:, None] & keep[None, :]
    better = (cvar[None, :] < cvar[:, None]) | (
        (cvar[None, :] == cvar[:, None])
        & (jnp.arange(k0)[None, :] < jnp.arange(k0)[:, None])
    )
    close = (
        jnp.abs(carea[:, None] - carea[None, :])
        / jnp.maximum(jnp.maximum(carea[:, None], carea[None, :]), 1.0)
        < min_diversity
    )
    pruned = jnp.any(same & better & close, axis=1)
    keep &= ~pruned

    sel, kept = masked_top_k(-cvar, keep, max_regions)
    lev, pix, cvar = lev[sel], pix[sel], cvar[sel]

    # per-winner component statistics (K small: vmapped full-image reduce)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    flat_labels = labels.reshape(nlev, -1)

    def stats(li, pi):
        lab = flat_labels[li, pi]
        m = (flat_labels[li] == lab).reshape(h, w) & (lab > 0)
        a = jnp.sum(m)
        mf = m.astype(jnp.float32)
        cx = jnp.sum(mf * xs) / jnp.maximum(a, 1)
        cy = jnp.sum(mf * ys) / jnp.maximum(a, 1)
        x0 = jnp.min(jnp.where(m, xs, jnp.inf))
        y0 = jnp.min(jnp.where(m, ys, jnp.inf))
        x1 = jnp.max(jnp.where(m, xs, -jnp.inf))
        y1 = jnp.max(jnp.where(m, ys, -jnp.inf))
        return jnp.stack([cx, cy]), a.astype(jnp.float32), jnp.stack([x0, y0, x1, y1])

    xy, area, bbox = jax.vmap(stats)(lev, pix)
    return MSERRegions(
        xy=xy,
        area=jnp.where(kept, area, 0.0),
        bbox=bbox,
        threshold=thresholds[lev],
        stability=jnp.where(kept, cvar, jnp.inf),
        valid=kept & (area >= min_area),
    )
