"""Image pyramids with static per-level shapes.

The reference packs all ORB pyramid levels into ONE buffer with per-level
ROI rects (features2d/src/orb.cpp:1018-1099) and the CUDA paths build a
GpuMat-per-level pyramid with cuda::pyrDown / cuda::resize
(cudafeatures2d/src/orb.cpp:661, cudaoptflow/src/pyrlk.cpp:149-153).

TPU-native design: a pyramid is a *tuple* of arrays, one per level, each
with a static shape computed at trace time. Under `jit` the whole tuple is
a pytree of statically-shaped tensors — no padding waste, and per-level
ops unroll into one fused XLA program (8 levels is a trivial unroll).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from opencv_tpu.core import imgproc


class Pyramid(NamedTuple):
    """levels[i]: f32 [Hi, Wi]; scales[i]: level-i coords * scales[i] = level-0 coords."""

    levels: tuple[jnp.ndarray, ...]
    scales: tuple[float, ...]

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def level_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> list[tuple[int, int]]:
    """Static per-level shapes, rounding like cv::resize(1/scale)
    (reference: features2d/src/orb.cpp:1044 `getScale`)."""
    shapes = []
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        shapes.append((max(int(round(h / s)), 1), max(int(round(w / s)), 1)))
    return shapes


def build_pyramid(
    img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2
) -> Pyramid:
    """ORB-style scale pyramid: each level is a bilinear resize of level 0.

    (The reference resizes from the previous level — orb.cpp:1089; resizing
    from level 0 avoids compounding interpolation blur and is one fused XLA
    program either way.)
    """
    h, w = img.shape[-2:]
    img = img.astype(jnp.float32)
    levels = []
    scales = []
    for lvl, (lh, lw) in enumerate(level_shapes(h, w, n_levels, scale_factor)):
        s = scale_factor ** lvl
        levels.append(img if lvl == 0 else imgproc.resize_bilinear(img, lh, lw))
        scales.append(float(s))
    return Pyramid(levels=tuple(levels), scales=tuple(scales))


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown analog (reference: imgproc/src/pyramids.cpp:1222):
    5-tap Gaussian [1,4,6,4,1]/16 then 2x decimation."""
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
    blurred = imgproc.sep_filter2d(img, k, k)
    return blurred[..., ::2, ::2]


def pyr_up(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrUp analog (reference: imgproc/src/pyramids.cpp:1334):
    2x zero-stuffing then the same Gaussian scaled by 4."""
    h, w = img.shape[-2:]
    up = jnp.zeros(img.shape[:-2] + (h * 2, w * 2), jnp.float32)
    up = up.at[..., ::2, ::2].set(img)
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 8.0  # 2x per axis
    return imgproc.sep_filter2d(up, k, k)


def build_lk_pyramid(img: jnp.ndarray, n_levels: int = 3) -> Pyramid:
    """`buildOpticalFlowPyramid` analog (reference: video/src/lkpyramid.cpp:697):
    octave pyramid via pyrDown; level i has scale 2**i."""
    img = img.astype(jnp.float32)
    levels = [img]
    for _ in range(1, n_levels):
        levels.append(pyr_down(levels[-1]))
    return Pyramid(levels=tuple(levels), scales=tuple(float(2 ** i) for i in range(n_levels)))
