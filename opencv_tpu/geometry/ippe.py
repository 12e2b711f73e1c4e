"""IPPE — Infinitesimal Plane-based Pose Estimation (Collins & Bartoli,
IJCV 2014). Reference capability slot: calib3d/src/ippe.cpp:1
(SOLVEPNP_IPPE / SOLVEPNP_IPPE_SQUARE).

For PLANAR object points the PnP problem has a closed form with exactly
two local minima; IPPE returns both (sorted by reprojection error), which
is the right primitive for plane-dominant bootstrap scenes where the
generic solvers flip between the two.

Fresh implementation from the paper's math, not a port: homography via
the framework's DLT, the rotation pair via the first-order PDE solution
at the centroid, translation by linear least squares given R — all
closed-form jnp, vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from opencv_tpu.geometry.homography import dlt_homography


class IPPEResult(NamedTuple):
    rvecs: jnp.ndarray  # [2, 3]
    tvecs: jnp.ndarray  # [2, 3]
    errors: jnp.ndarray  # [2] mean squared reprojection error (normalized)


def _rotation_about_axis_to_bearing(p: jnp.ndarray) -> jnp.ndarray:
    """Rv with Rv @ [0,0,1] = normalize([p0, p1, 1]) (the paper's Rv)."""
    m = jnp.concatenate([p, jnp.ones((1,), p.dtype)])
    m = m / jnp.linalg.norm(m)
    z = jnp.array([0.0, 0.0, 1.0], p.dtype)
    v = jnp.cross(z, m)
    c = m[2]
    s2 = jnp.sum(v * v)
    # Rodrigues with sin = ||v||, cos = c; stable form via K + K^2 factor
    K = jnp.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]], p.dtype
    )
    factor = jnp.where(s2 < 1e-12, 0.5, (1.0 - c) / jnp.maximum(s2, 1e-12))
    return jnp.eye(3, dtype=p.dtype) + K + factor * (K @ K)


def _solve_translation(R: jnp.ndarray, obj: jnp.ndarray, img: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """Least-squares t given R: project(R X + t) = x for all points —
    linear in t (the reference's IPPE::computeTranslation)."""
    RX = obj @ R.T  # [N,3]
    u = img[:, 0]
    v = img[:, 1]
    w = valid.astype(obj.dtype)
    # rows: [1, 0, -u] t = u*RX_z - RX_x ; [0, 1, -v] t = v*RX_z - RX_y
    A1 = jnp.stack([jnp.ones_like(u), jnp.zeros_like(u), -u], axis=1)
    A2 = jnp.stack([jnp.zeros_like(v), jnp.ones_like(v), -v], axis=1)
    b1 = u * RX[:, 2] - RX[:, 0]
    b2 = v * RX[:, 2] - RX[:, 1]
    A = jnp.concatenate([A1 * w[:, None], A2 * w[:, None]], axis=0)
    b = jnp.concatenate([b1 * w, b2 * w])
    AtA = A.T @ A + 1e-12 * jnp.eye(3, dtype=obj.dtype)
    return jnp.linalg.solve(AtA, A.T @ b)


def solve_pnp_ippe(
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> IPPEResult:
    """Planar PnP, both solutions (cv::solvePnPGeneric SOLVEPNP_IPPE,
    ippe.cpp). obj_pts [N,3] with z ~ 0 (a plane through z=0) or [N,2];
    img_pts [N,2] NORMALIZED image coords. Returns both poses sorted by
    reprojection error.
    """
    obj_pts = jnp.asarray(obj_pts, jnp.float32)
    if obj_pts.shape[1] == 2:
        obj3 = jnp.concatenate(
            [obj_pts, jnp.zeros((obj_pts.shape[0], 1), jnp.float32)], axis=1
        )
    else:
        obj3 = obj_pts
    img_pts = jnp.asarray(img_pts, jnp.float32)
    n = obj3.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    w = valid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)

    # center the plane coordinates (the paper solves at the centroid)
    ctr = jnp.sum(obj3[:, :2] * w[:, None], axis=0) / wsum
    uv = obj3[:, :2] - ctr

    # homography plane -> normalized image; invalid rows are replaced by
    # a duplicate of the first valid pair (a repeated consistent
    # constraint — harmless to the DLT, unlike zeroed rows)
    fv = jnp.argmax(valid)
    uv_m = jnp.where(valid[:, None], uv, uv[fv])
    im_m = jnp.where(valid[:, None], img_pts, img_pts[fv])
    H, _ = dlt_homography(uv_m, im_m)
    H = H / H[2, 2]

    p = H[:2, 2]  # image of the plane origin
    # Jacobian of the projective map at the origin
    J = jnp.array(
        [
            [H[0, 0] - p[0] * H[2, 0], H[0, 1] - p[0] * H[2, 1]],
            [H[1, 0] - p[1] * H[2, 0], H[1, 1] - p[1] * H[2, 1]],
        ],
        jnp.float32,
    )

    Rv = _rotation_about_axis_to_bearing(p)
    B = jnp.array(
        [
            [Rv[0, 0] - p[0] * Rv[2, 0], Rv[0, 1] - p[0] * Rv[2, 1]],
            [Rv[1, 0] - p[1] * Rv[2, 0], Rv[1, 1] - p[1] * Rv[2, 1]],
        ],
        jnp.float32,
    )
    detB = B[0, 0] * B[1, 1] - B[0, 1] * B[1, 0]
    Binv = (
        jnp.array([[B[1, 1], -B[0, 1]], [-B[1, 0], B[0, 0]]], jnp.float32)
        / jnp.where(jnp.abs(detB) < 1e-12, 1.0, detB)
    )
    A = Binv @ J  # the paper's 2x2 "A" matrix

    # largest singular value of A = scale gamma
    AAt = A @ A.T
    tr = AAt[0, 0] + AAt[1, 1]
    det = AAt[0, 0] * AAt[1, 1] - AAt[0, 1] * AAt[1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    gamma = jnp.sqrt(jnp.maximum(tr / 2.0 + disc, 1e-12))
    B22 = A / gamma  # first 2x2 block of the canonical rotation

    b1 = B22[:, 0]
    b2 = B22[:, 1]
    c1 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(b1 * b1), 0.0))
    c2 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(b2 * b2), 0.0))
    # orthogonality: b1.b2 + c1*c2 = 0 fixes the relative sign
    s = -jnp.sign(jnp.sum(b1 * b2))
    s = jnp.where(s == 0, 1.0, s)
    c2 = s * c2

    def build(sign):
        col1 = jnp.concatenate([b1, sign * c1[None]])
        col2 = jnp.concatenate([b2, sign * c2[None]])
        col3 = jnp.cross(col1, col2)
        Rtil = jnp.stack([col1, col2, col3], axis=1)
        R = Rv @ Rtil
        t = _solve_translation(
            R, jnp.concatenate([uv, obj3[:, 2:]], axis=1), img_pts, valid
        )
        # error
        X = jnp.concatenate([uv, obj3[:, 2:]], axis=1) @ R.T + t
        proj = X[:, :2] / jnp.maximum(X[:, 2:3], 1e-9)
        e = jnp.sum(jnp.where(valid[:, None], (proj - img_pts) ** 2, 0.0)) / wsum
        return R, t, e

    R_a, t_a, e_a = build(jnp.float32(1.0))
    R_b, t_b, e_b = build(jnp.float32(-1.0))

    from opencv_tpu.geometry.rotation import rodrigues_inv

    # shift translation back to the UNCENTERED object frame:
    # R X + t' where X = [x-ctr, y-ctr, z] => t' = t - R [ctr, 0]
    off = jnp.concatenate([ctr, jnp.zeros((1,), jnp.float32)])
    t_a = t_a + R_a @ (-off)
    t_b = t_b + R_b @ (-off)

    order = e_a <= e_b
    rv = jnp.stack(
        [
            jnp.where(order, rodrigues_inv(R_a), rodrigues_inv(R_b)),
            jnp.where(order, rodrigues_inv(R_b), rodrigues_inv(R_a)),
        ]
    )
    tv = jnp.stack(
        [jnp.where(order, t_a, t_b), jnp.where(order, t_b, t_a)]
    )
    er = jnp.stack(
        [jnp.where(order, e_a, e_b), jnp.where(order, e_b, e_a)]
    )
    return IPPEResult(rv, tv, er)
