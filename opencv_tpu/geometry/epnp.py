"""EPnP — efficient O(n) perspective-n-point (Lepetit et al.), TPU-native.

Reference: calib3d/src/epnp.cpp (632 LoC): expresses the n world points
as barycentric combinations of 4 control points, solves a 12x12
eigenproblem for the camera-frame control points up to the nullspace
mixing coefficients (betas), resolves the betas for the N=1/2/3 nullspace
cases from inter-control-point distance constraints, and recovers (R, t)
with Horn's method.

TPU-native choices: one dense symmetric 12x12 eigendecomposition (jnp
eigh) replaces the reference's hand-rolled Jacobi sweep; all three beta
cases are evaluated unconditionally and the winner picked by reprojection
error (branch-free — the reference if/elses over cases); the beta
Gauss-Newton polish operates on the fixed 6-constraint system. Everything
is shape-static, so `solve_pnp_ransac` can vmap it over hundreds of
hypotheses (the GPU batched-hypothesis shape, cudalegacy/src/calib3d.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.geometry.rotation import rodrigues_inv

_P32 = lax.Precision.HIGHEST

# index pairs of the 6 control-point distance constraints
_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _control_points(obj_pts: jnp.ndarray) -> jnp.ndarray:
    """4 control points: centroid + principal axes scaled by the data
    spread (epnp.cpp choose_control_points)."""
    c = obj_pts.mean(axis=0)
    d = obj_pts - c
    cov = jnp.einsum("ni,nj->ij", d, d, precision=_P32) / obj_pts.shape[0]
    w, v = jnp.linalg.eigh(cov)  # ascending
    # guard degenerate (planar/linear) sets: floor each axis at a fraction
    # of the dominant spread so the barycentric solve stays conditioned
    # (points in the plane get ~0 weight on the off-plane control anyway —
    # the branch-free stand-in for epnp.cpp's separate planar handling)
    floor = 0.05 * jnp.maximum(w[2], 1e-9)
    s = jnp.sqrt(jnp.maximum(w, floor))
    axes = v * s[None, :]  # columns scaled
    return jnp.stack([c, c + axes[:, 2], c + axes[:, 1], c + axes[:, 0]], 0)


def _barycentric(obj_pts: jnp.ndarray, cw: jnp.ndarray) -> jnp.ndarray:
    """alphas [N,4] with X_i = sum_j alpha_ij C_j, sum_j alpha_ij = 1."""
    T = jnp.concatenate(
        [cw.T, jnp.ones((1, 4), cw.dtype)], axis=0
    )  # [4,4]: rows x,y,z,1
    n = obj_pts.shape[0]
    X = jnp.concatenate([obj_pts.T, jnp.ones((1, n), obj_pts.dtype)], axis=0)
    return jnp.linalg.solve(T, X).T  # [N, 4]


def _rho(cw: jnp.ndarray) -> jnp.ndarray:
    d = jnp.stack([cw[i] - cw[j] for i, j in _PAIRS])
    return jnp.sum(d * d, axis=1)  # [6]


def _pair_diffs(v: jnp.ndarray) -> jnp.ndarray:
    """v [12] (4 control points) -> [6,3] pairwise differences."""
    c = v.reshape(4, 3)
    return jnp.stack([c[i] - c[j] for i, j in _PAIRS])


def _pose_from_betas(
    betas: jnp.ndarray, V: jnp.ndarray, alphas: jnp.ndarray, obj_pts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame control points from nullspace mix, then Horn (R, t)."""
    cc = (V @ betas).reshape(4, 3)  # camera-frame control points
    pc = alphas @ cc  # [N,3] camera-frame points
    # sign: depths must be positive
    sign = jnp.where(jnp.sum(jnp.sign(pc[:, 2])) >= 0, 1.0, -1.0)
    pc = pc * sign
    # Horn / Kabsch world->camera
    from opencv_tpu.geometry.rotation import project_to_rotation

    muW = obj_pts.mean(0)
    muC = pc.mean(0)
    H = jnp.einsum("ni,nj->ij", pc - muC, obj_pts - muW, precision=_P32)
    R = project_to_rotation(H)  # SVD-free polar iteration (batched-fast)
    t = muC - R @ muW
    return R, t


def _planar_pose(
    obj_pts: jnp.ndarray, img_pts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pose from a plane-to-image homography (the IPPE/planar path the
    reference's solvePnP front door dispatches coplanar scenes to,
    solvepnp.cpp:115). Valid when the points are (near-)coplanar; for
    general scenes its reprojection error loses the candidate vote."""
    c = obj_pts.mean(axis=0)
    d = obj_pts - c
    cov = jnp.einsum("ni,nj->ij", d, d, precision=_P32)
    _, v = jnp.linalg.eigh(cov)
    B = v[:, 1:]  # [3,2] in-plane orthonormal basis (two largest axes)
    p = d @ B  # [N,2] plane coordinates

    # DLT homography plane -> normalized image
    n = obj_pts.shape[0]
    ph = jnp.concatenate([p, jnp.ones((n, 1), p.dtype)], axis=1)
    u, w = img_pts[:, 0], img_pts[:, 1]
    zeros = jnp.zeros_like(ph)
    rows_u = jnp.concatenate([ph, zeros, -u[:, None] * ph], axis=1)
    rows_v = jnp.concatenate([zeros, ph, -w[:, None] * ph], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)
    AtA = jnp.einsum("ni,nj->ij", A, A, precision=_P32)
    _, vec = jnp.linalg.eigh(AtA)
    H = vec[:, 0].reshape(3, 3)
    # sign: points must be in front of the camera (positive depth)
    depth = ph @ H[2]
    H = H * jnp.where(jnp.sum(jnp.sign(depth)) >= 0, 1.0, -1.0)

    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 0.5 * (jnp.linalg.norm(h1) + jnp.linalg.norm(h2))
    lam = jnp.maximum(lam, 1e-12)
    # R @ B = [h1 h2]/lam: complete to a rotation via Procrustes
    M = jnp.stack([h1, h2], axis=1) / lam  # [3,2]
    uu, _, vvt = jnp.linalg.svd(M, full_matrices=False)
    Q = uu @ vvt  # nearest 3x2 with orthonormal columns
    r3 = jnp.cross(Q[:, 0], Q[:, 1])
    Rb = jnp.concatenate([Q, r3[:, None]], axis=1)  # maps plane frame->cam
    b3 = jnp.cross(B[:, 0], B[:, 1])
    Bfull = jnp.concatenate([B, b3[:, None]], axis=1)  # world<-plane frame
    R = Rb @ Bfull.T
    t = h3 / lam - R @ c
    return R, t


def epnp(
    obj_pts: jnp.ndarray, img_pts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EPnP pose from [N>=4,3] world points and [N,2] NORMALIZED image
    coords. Returns (rvec, tvec, ok). (epnp.cpp compute_pose analog.)

    Coplanar scenes collapse the 12x12 system's rank (the off-plane
    control point gets zero barycentric weight), so a planar-homography
    pose candidate (`_planar_pose`) always competes with the three beta
    cases on reprojection error — the branch-free version of the
    reference front door's planar dispatch."""
    n = obj_pts.shape[0]
    cw = _control_points(obj_pts)
    alphas = _barycentric(obj_pts, cw)  # [N,4]

    # M [2N, 12]: with fx=fy=1, cx=cy=0 (normalized coords)
    u, v = img_pts[:, 0], img_pts[:, 1]
    zeros = jnp.zeros((n, 4), obj_pts.dtype)
    row_u = jnp.concatenate(
        [alphas, zeros, -u[:, None] * alphas], axis=1
    )  # [N,12] interleaved by coordinate blocks
    row_v = jnp.concatenate([zeros, alphas, -v[:, None] * alphas], axis=1)
    # reorder columns from (x-block, y-block, z-block) to per-control-point
    # xyz interleave: target col 3k+coord reads source col coord*4+k
    perm = jnp.asarray([coord * 4 + k for k in range(4) for coord in range(3)])
    M = jnp.concatenate([row_u, row_v], axis=0)[:, perm]

    MtM = jnp.einsum("ni,nj->ij", M, M, precision=_P32)
    w, vecs = jnp.linalg.eigh(MtM)
    V = vecs[:, :4]  # 4 smallest — candidate nullspace basis [12,4]

    rho = _rho(cw)

    # case N=1: beta * v4; beta from distance ratio
    d1 = _pair_diffs(V[:, 0])
    dd1 = jnp.sum(d1 * d1, axis=1)
    b1 = jnp.sqrt(jnp.sum(dd1 * rho) / jnp.maximum(jnp.sum(dd1 * dd1), 1e-12))
    betas1 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1

    # case N=2: betas from L [6,3] @ (b11, b12, b22) = rho
    d2 = _pair_diffs(V[:, 1])
    L2 = jnp.stack(
        [
            jnp.sum(d1 * d1, 1),
            2.0 * jnp.sum(d1 * d2, 1),
            jnp.sum(d2 * d2, 1),
        ],
        axis=1,
    )  # [6,3]
    sol2, *_ = jnp.linalg.lstsq(L2, rho)
    b11, b12, b22 = sol2
    beta1 = jnp.sqrt(jnp.abs(b11))
    beta2 = jnp.sqrt(jnp.abs(b22)) * jnp.sign(b12) * jnp.sign(b11)
    betas2 = jnp.array([1.0, 0.0, 0.0, 0.0]) * beta1 + jnp.array(
        [0.0, 1.0, 0.0, 0.0]
    ) * beta2

    # case N=3: L [6,6] @ (b11,b12,b22,b13,b23,b33) = rho
    d3 = _pair_diffs(V[:, 2])
    L3 = jnp.stack(
        [
            jnp.sum(d1 * d1, 1),
            2.0 * jnp.sum(d1 * d2, 1),
            jnp.sum(d2 * d2, 1),
            2.0 * jnp.sum(d1 * d3, 1),
            2.0 * jnp.sum(d2 * d3, 1),
            jnp.sum(d3 * d3, 1),
        ],
        axis=1,
    )  # [6,6]
    sol3 = jnp.linalg.solve(
        L3 + 1e-9 * jnp.eye(6, dtype=L3.dtype), rho
    )
    c11, c12, c22, c13, c23, _ = sol3
    g1 = jnp.sqrt(jnp.abs(c11))
    g2 = jnp.sqrt(jnp.abs(c22)) * jnp.sign(c12) * jnp.sign(c11)
    g3 = c13 / jnp.maximum(g1, 1e-12) * jnp.sign(c11)
    betas3 = jnp.array([0.0, 0.0, 0.0, 0.0]).at[0].set(g1).at[1].set(g2).at[2].set(g3)

    def reproj_err(R, t):
        pc = obj_pts @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        proj = pc[:, :2] / z[:, None]
        err = jnp.mean(jnp.sum((proj - img_pts) ** 2, axis=1))
        finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
        return jnp.where(finite & jnp.isfinite(err), err, 1e12)

    Rb, tb = jax.vmap(
        lambda b: _pose_from_betas(b, V, alphas, obj_pts)
    )(jnp.stack([betas1, betas2, betas3]))
    Rp, tp = _planar_pose(obj_pts, img_pts)
    Rs = jnp.concatenate([Rb, Rp[None]], axis=0)
    ts = jnp.concatenate([tb, tp[None]], axis=0)
    Rs = jnp.where(jnp.isfinite(Rs), Rs, 0.0)
    ts = jnp.where(jnp.isfinite(ts), ts, 0.0)
    errs = jax.vmap(reproj_err)(Rs, ts)
    best = jnp.argmin(errs)
    R, t = Rs[best], ts[best]
    ok = errs[best] < 1e11
    return rodrigues_inv(R), t, ok


def epnp_kernel(obj_pts: jnp.ndarray, img_pts: jnp.ndarray):
    """RANSAC kernel adapter: returns (model [6], ok) like p3p_kernel."""
    rv, tv, ok = epnp(obj_pts, img_pts)
    return jnp.concatenate([rv, tv]), ok
