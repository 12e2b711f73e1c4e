"""Real-imagery sequence synthesis: render a camera trajectory through a
piecewise-planar scene textured with real photographs.

Role: ground-truth-bearing test/benchmark data for the VO engine when no
odometry dataset is shippable. The reference does the same thing for
calibration (synthetic chessboards rendered at known poses,
calib3d/test/test_chessboardgenerator.cpp) — here the rendered content is
real image texture, so the front-end (FAST/ORB/LK statistics, descriptor
distinctiveness) sees real-world gradients rather than procedural noise.

Scene model: N textured planes z = const (world frame), nearest-hit
ray-cast per pixel, bilinear texture sampling. Exact per-pixel geometry
means exact ground truth for ATE scoring.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class TexturedPlane:
    """Axis-aligned textured plane z=z0 spanning [x0,x1]x[y0,y1] (world).

    tex_origin/tex_scale map world (x,y) to texture pixels:
    tex_uv = (world_xy - (x0,y0)) * tex_scale + tex_origin."""

    z0: float
    x0: float
    x1: float
    y0: float
    y1: float
    tex: np.ndarray  # [th, tw] f32 grayscale
    tex_origin: tuple[float, float] = (0.0, 0.0)
    tex_scale: float = 60.0  # texture px per world unit


def _bilinear(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    th, tw = tex.shape
    u = np.clip(u, 0.0, tw - 1.001)
    v = np.clip(v, 0.0, th - 1.001)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    au = u - u0
    av = v - v0
    return (
        tex[v0, u0] * (1 - au) * (1 - av)
        + tex[v0, u0 + 1] * au * (1 - av)
        + tex[v0 + 1, u0] * (1 - au) * av
        + tex[v0 + 1, u0 + 1] * au * av
    )


def render_frame(
    planes: list[TexturedPlane],
    K: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    h: int,
    w: int,
    background: float = 8.0,
) -> np.ndarray:
    """Ray-cast one frame at world->camera pose (R, t). Returns [h,w] f32."""
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    Kinv = np.linalg.inv(np.asarray(K, np.float64))
    rays_cam = np.stack([uu, vv, np.ones_like(uu)], axis=-1) @ Kinv.T  # [h,w,3]
    C = -np.asarray(R, np.float64).T @ np.asarray(t, np.float64)  # camera center
    rays_w = rays_cam @ np.asarray(R, np.float64)  # R^T d

    img = np.full((h, w), background, np.float64)
    best_s = np.full((h, w), np.inf)
    for p in planes:
        dz = rays_w[..., 2]
        safe_dz = np.where(np.abs(dz) < 1e-12, 1e-12, dz)
        s = (p.z0 - C[2]) / safe_dz
        x = C[0] + s * rays_w[..., 0]
        y = C[1] + s * rays_w[..., 1]
        hit = (
            (s > 0.05)
            & (s < best_s)
            & (x >= p.x0) & (x <= p.x1)
            & (y >= p.y0) & (y <= p.y1)
        )
        tu = (x - p.x0) * p.tex_scale + p.tex_origin[0]
        tv = (y - p.y0) * p.tex_scale + p.tex_origin[1]
        vals = _bilinear(p.tex, tu, tv)
        img = np.where(hit, vals, img)
        best_s = np.where(hit, s, best_s)
    return img.astype(np.float32)


def two_plane_scene(
    texture: np.ndarray,
    texture_near: np.ndarray | None = None,
    depth_far: float = 9.0,
    depth_near: float = 5.5,
):
    """A background wall plus a foreground slab. Prefer two DIFFERENT
    real textures — repetitive single-texture scenes destroy descriptor
    distinctiveness, exactly as in real life."""
    th, tw = texture.shape
    if texture_near is None:
        texture_near = texture
    nh, nw = texture_near.shape
    far = TexturedPlane(
        z0=depth_far, x0=-9.0, x1=9.0, y0=-6.5, y1=6.5,
        tex=texture, tex_origin=(0.0, 0.0),
        tex_scale=min((tw - 2) / 18.0, (th - 2) / 13.0),
    )
    near = TexturedPlane(
        z0=depth_near, x0=-1.8, x1=2.6, y0=-2.4, y1=1.4,
        tex=texture_near, tex_origin=(nw * 0.05, nh * 0.05),
        tex_scale=min((nw - 2) / 5.0, (nh - 2) / 4.3),
    )
    return [far, near]


def dolly_trajectory(
    n_frames: int,
    step_x: float = 0.09,
    step_z: float = 0.03,
    yaw_per_frame_deg: float = 0.25,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Lateral dolly with slow yaw: (rvec, tvec) world->camera per frame.
    Generates bootstrap parallax immediately (translation-dominant)."""
    poses = []
    for i in range(n_frames):
        yaw = np.deg2rad(yaw_per_frame_deg) * i
        rvec = np.array([0.0, yaw, 0.0], np.float32)
        R = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ]
        )
        center = np.array([step_x * i, 0.015 * np.sin(0.4 * i), step_z * i])
        t = (-R @ center).astype(np.float32)
        poses.append((rvec, t))
    return poses


def render_sequence(
    texture: np.ndarray,
    K: np.ndarray,
    h: int,
    w: int,
    n_frames: int = 30,
    planes: list[TexturedPlane] | None = None,
    trajectory: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Render frames + ground-truth camera centers.

    Returns (frames [F,h,w] f32, gt_centers [F,3] f64)."""
    from opencv_tpu.geometry.rotation import rodrigues
    import jax.numpy as jnp

    if planes is None:
        planes = two_plane_scene(texture)
    if trajectory is None:
        trajectory = dolly_trajectory(n_frames)
    frames = []
    centers = []
    for rvec, tvec in trajectory[:n_frames]:
        R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)), np.float64)
        frames.append(render_frame(planes, K, R, tvec, h, w))
        centers.append(-R.T @ np.asarray(tvec, np.float64))
    return np.stack(frames), np.stack(centers)
