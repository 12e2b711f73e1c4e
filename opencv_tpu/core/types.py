"""Core data records: structure-of-arrays, statically shaped, pytree-registered.

The reference keeps keypoints in `std::vector<cv::KeyPoint>`
(modules/core/include/opencv2/core/types.hpp) and matches in
`std::vector<cv::DMatch>`. Dynamic-length containers do not exist under
XLA tracing, so the TPU-native design fixes a capacity N at trace time and
carries an explicit validity mask; every consumer is mask-aware. This is
the single most important convention in the codebase.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class KeyPoints:
    """Fixed-capacity keypoint set (SoA analog of vector<cv::KeyPoint>).

    Fields mirror cv::KeyPoint (reference: core/types.hpp `KeyPoint`):
    xy        [N,2] f32 — (x, y) in level-0 image coordinates
    response  [N]   f32 — detector score (FAST/Harris)
    angle     [N]   f32 — orientation in radians (OpenCV stores degrees;
                          radians are kinder to trig on the VPU)
    level     [N]   i32 — pyramid octave
    size      [N]   f32 — diameter of the meaningful neighbourhood
    valid     [N]   bool — True for real entries, False for padding
    """

    xy: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    level: jnp.ndarray
    size: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def count(self) -> jnp.ndarray:
        """Number of valid keypoints (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(n: int) -> "KeyPoints":
        return KeyPoints(
            xy=jnp.zeros((n, 2), jnp.float32),
            response=jnp.full((n,), -jnp.inf, jnp.float32),
            angle=jnp.zeros((n,), jnp.float32),
            level=jnp.zeros((n,), jnp.int32),
            size=jnp.zeros((n,), jnp.float32),
            valid=jnp.zeros((n,), bool),
        )


@_pytree_dataclass
class Matches:
    """Fixed-capacity match set (SoA analog of vector<cv::DMatch>).

    query_idx [N] i32, train_idx [N] i32, distance [N] f32, valid [N] bool.
    One row per *query* descriptor; invalid rows are padding or filtered
    matches (ratio test / cross-check failures).
    """

    query_idx: jnp.ndarray
    train_idx: jnp.ndarray
    distance: jnp.ndarray
    valid: jnp.ndarray

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


@_pytree_dataclass
class Pose:
    """Rigid transform world->camera: x_cam = R @ x_world + t."""

    R: jnp.ndarray  # [3,3]
    t: jnp.ndarray  # [3]

    @staticmethod
    def identity() -> "Pose":
        return Pose(R=jnp.eye(3, dtype=jnp.float32), t=jnp.zeros(3, jnp.float32))

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: apply `other` first, then `self`."""
        return Pose(R=self.R @ other.R, t=self.R @ other.t + self.t)

    def inverse(self) -> "Pose":
        Rt = self.R.T
        return Pose(R=Rt, t=-Rt @ self.t)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Transform [...,3] points."""
        return pts @ self.R.T + self.t


def camera_matrix(fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
    """3x3 intrinsic matrix K."""
    return jnp.array(
        [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )


def take_keypoints(kp: KeyPoints, idx: jnp.ndarray, valid: jnp.ndarray | None = None) -> KeyPoints:
    """Gather keypoints by index, intersecting validity."""
    v = kp.valid[idx]
    if valid is not None:
        v = v & valid
    return KeyPoints(
        xy=kp.xy[idx],
        response=kp.response[idx],
        angle=kp.angle[idx],
        level=kp.level[idx],
        size=kp.size[idx],
        valid=v,
    )


def masked_top_k(values: jnp.ndarray, valid: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of `values` restricted to `valid`; returns (indices[k], keep_mask[k]).

    TPU-native replacement for thrust::sort_by_key culling
    (reference: cudafeatures2d/src/cuda/orb.cu:62-89 `cull_gpu`).
    """
    masked = jnp.where(valid, values, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(masked, k)
    return top_idx, jnp.isfinite(top_vals)


def pad_to(x: jnp.ndarray, n: int, axis: int = 0, fill: Any = 0) -> jnp.ndarray:
    """Pad axis to length n with `fill` (static)."""
    cur = x.shape[axis]
    if cur >= n:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(x, pad, constant_values=fill)
