"""Sparse bundle adjustment with Schur complement on camera blocks.

The reference's bundle adjusters (stitching/src/motion_estimators.cpp:
221-310 `BundleAdjusterBase::estimate`) build a DENSE Jacobian with
forward differences and hand the full system to CvLevMarq — no sparsity
exploitation (SURVEY.md §3.5). This module is the TPU-first replacement
promised there: analytic (autodiff) Jacobians per observation, block
J^T J assembly by segment-sums, Schur elimination of the (many) point
blocks, and a solve on the (few) camera blocks.

Two Schur solvers:

  * `schur_solve` — explicit S = U - W V^-1 W^T with a dense [6C,6C]
    factorization. Exact; memory O(C^2 + C*P) via the materialized W.
    Used as the gold reference in tests and for tiny windows.
  * `schur_cg_solve` — MATRIX-FREE preconditioned CG on S. W is never
    materialized: each CG iteration applies S x through per-observation
    [6,3] blocks A_o = Jc_o^T Jp_o with two gathers + two segment-sums
    (memory O(O)). Block-Jacobi (U^-1) preconditioner. This is the path
    that scales to global BA (hundreds of keyframes x 1e5 landmarks) and
    the one the sharded solver (parallel/dist_ba.py) builds on.

`bundle_adjust` defaults to solver="auto": dense Schur whenever W fits
in a modest budget (window-BA scale — measured 185 vs ~1 LM iters/s on
v5e at 6x2048; see _resolve_solver for why), CG at global scale.

Static-shape discipline: the observation list is a fixed-capacity SoA
(cam_idx, pt_idx, uv, valid); masked observations contribute zeros.
All block algebra is batched einsums — MXU-friendly, and the same
segment-sums become `psum`s when observations are sharded over a mesh
(parallel/dist_ba.py passes `psum_axis` so each CG iteration reduces
only a [P,3] and a [C,6] accumulator over ICI).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.geometry.rotation import rodrigues

_P32 = lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem.

    cam_rvec [C,3], cam_tvec [C,3]: world->camera poses.
    points   [P,3]: landmark positions.
    obs_cam  [O] i32, obs_pt [O] i32, obs_uv [O,2] f32 (normalized image
    coords), obs_valid [O] bool.
    fixed_cams [C] bool: gauge-fixed cameras (their params do not move).
    """

    cam_rvec: jnp.ndarray
    cam_tvec: jnp.ndarray
    points: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_valid: jnp.ndarray
    fixed_cams: jnp.ndarray


def _project_one(cam6: jnp.ndarray, pt: jnp.ndarray) -> jnp.ndarray:
    R = rodrigues(cam6[:3])
    pc = R @ pt + cam6[3:]
    z = jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
    return pc[:2] / z


def residuals(p: BAProblem) -> jnp.ndarray:
    """[O,2] masked reprojection residuals."""
    cams6 = jnp.concatenate([p.cam_rvec, p.cam_tvec], axis=1)  # [C,6]
    r = jax.vmap(_project_one)(cams6[p.obs_cam], p.points[p.obs_pt]) - p.obs_uv
    return jnp.where(p.obs_valid[:, None], r, 0.0)


def cost(p: BAProblem) -> jnp.ndarray:
    r = residuals(p)
    return 0.5 * jnp.sum(r * r)


def _blocks(p: BAProblem, huber_delta: float | None):
    """Per-observation residuals and Jacobian blocks.

    Returns r [O,2], Jc [O,2,6], Jp [O,2,3] (masked rows zeroed)."""
    cams6 = jnp.concatenate([p.cam_rvec, p.cam_tvec], axis=1)

    def one(cam6, pt, uv, valid):
        def res(c6, pt3):
            return _project_one(c6, pt3) - uv

        r = res(cam6, pt)
        jc = jax.jacfwd(res, argnums=0)(cam6, pt)  # [2,6]
        jp = jax.jacfwd(res, argnums=1)(cam6, pt)  # [2,3]
        w = jnp.where(valid, 1.0, 0.0)
        if huber_delta is not None:
            # robust reweighting: w *= sqrt(huber'(||r||)/||r||)
            nrm = jnp.sqrt(jnp.sum(r * r) + 1e-18)
            w = w * jnp.sqrt(jnp.minimum(1.0, huber_delta / nrm))
        return r * w, jc * w, jp * w

    return jax.vmap(one)(cams6[p.obs_cam], p.points[p.obs_pt], p.obs_uv, p.obs_valid)


class BAStepState(NamedTuple):
    problem: BAProblem
    lam: jnp.ndarray
    cost: jnp.ndarray
    n_accepted: jnp.ndarray


class NormalEqs(NamedTuple):
    """Block normal equations in sparse (per-observation) form.

    U [C,6,6], V [P,3,3], bc [C,6], bp [P,3] are global accumulators
    (psum-reduced when sharded); A [O,6,3] = Jc^T Jp stays per-observation
    (and stays sharded) — it is the only W storage the CG path needs."""

    U: jnp.ndarray
    V: jnp.ndarray
    bc: jnp.ndarray
    bp: jnp.ndarray
    A: jnp.ndarray


def normal_equations(p: BAProblem, huber_delta: float | None = None) -> NormalEqs:
    """Assemble the sparse block normal equations (no [C,P] W tensor)."""
    C = p.cam_rvec.shape[0]
    P = p.points.shape[0]
    r, Jc, Jp = _blocks(p, huber_delta)
    U = jnp.zeros((C, 6, 6), jnp.float32).at[p.obs_cam].add(
        jnp.einsum("oij,oik->ojk", Jc, Jc, precision=_P32)
    )
    V = jnp.zeros((P, 3, 3), jnp.float32).at[p.obs_pt].add(
        jnp.einsum("oij,oik->ojk", Jp, Jp, precision=_P32)
    )
    bc = jnp.zeros((C, 6), jnp.float32).at[p.obs_cam].add(
        -jnp.einsum("oij,oi->oj", Jc, r, precision=_P32)
    )
    bp = jnp.zeros((P, 3), jnp.float32).at[p.obs_pt].add(
        -jnp.einsum("oij,oi->oj", Jp, r, precision=_P32)
    )
    A = jnp.einsum("oij,oik->ojk", Jc, Jp, precision=_P32)  # [O,6,3]
    return NormalEqs(U=U, V=V, bc=bc, bp=bp, A=A)


def schur_normal_equations(
    p: BAProblem, huber_delta: float | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DENSE-W assembly (U, V, W [C,P,6,3], bc, bp). Gold reference for the
    sparse path; only viable for small windows (W is O(C*P))."""
    C = p.cam_rvec.shape[0]
    P = p.points.shape[0]
    eqs = normal_equations(p, huber_delta)
    W = jnp.zeros((C, P, 6, 3), jnp.float32).at[p.obs_cam, p.obs_pt].add(eqs.A)
    return eqs.U, eqs.V, W, eqs.bc, eqs.bp


def schur_solve(
    U: jnp.ndarray,
    V: jnp.ndarray,
    W: jnp.ndarray,
    bc: jnp.ndarray,
    bp: jnp.ndarray,
    lam: jnp.ndarray,
    fixed_cams: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact damped solve via the explicit Schur complement on cameras.

    S = U - W V^-1 W^T (reduced camera system, dense [6C, 6C]), then
    back-substitute points. Gauge: fixed cameras get a huge diagonal so
    their update is ~0 (then explicitly zeroed).
    """
    C = U.shape[0]
    eye6 = jnp.eye(6, dtype=U.dtype)
    eye3 = jnp.eye(3, dtype=U.dtype)
    big = jnp.where(fixed_cams, 1e12, 0.0)[:, None, None] * eye6[None]
    Ud = U + lam * eye6[None] + big
    Vd = V + lam * eye3[None]
    Vinv = jnp.linalg.inv(Vd)  # [P,3,3] batched
    # Y[c,p] = W[c,p] @ Vinv[p]
    Y = jnp.einsum("cpij,pjk->cpik", W, Vinv, precision=_P32)
    # S[c,c'] = delta Ud - sum_p Y[c,p] W[c',p]^T
    S = -jnp.einsum("cpik,dpjk->cidj", Y, W, precision=_P32)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Ud)
    rhs = bc - jnp.einsum("cpik,pk->ci", Y, bp, precision=_P32)
    dc = jnp.linalg.solve(S.reshape(6 * C, 6 * C), rhs.reshape(6 * C)).reshape(C, 6)
    dc = jnp.where(fixed_cams[:, None], 0.0, dc)
    # back-substitute: dp = Vinv (bp - sum_c W[c,p]^T dc[c])
    tmp = bp - jnp.einsum("cpij,ci->pj", W, dc, precision=_P32)
    dp = jnp.einsum("pij,pj->pi", Vinv, tmp, precision=_P32)
    return dc, dp


def _psum(x: jnp.ndarray, axis: str | None) -> jnp.ndarray:
    return x if axis is None else lax.psum(x, axis)


def schur_cg_solve(
    eqs: NormalEqs,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    lam: jnp.ndarray,
    fixed_cams: jnp.ndarray,
    cg_iters: int = 60,
    psum_axis: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Matrix-free preconditioned CG on the Schur complement.

    S x = Ud x - W Vd^-1 W^T x, applied per CG iteration through the
    per-observation blocks A (two gathers + two segment-sums; W never
    materialized). Preconditioner: block-Jacobi Ud^-1. Gauge handling:
    fixed cameras are projected out of every vector (exact zero update).

    With `psum_axis`, A/obs_cam/obs_pt are the LOCAL observation shard
    and the two segment-sums psum into global [P,3] / [C,6] accumulators
    — the entire per-iteration collective traffic.
    """
    C = eqs.U.shape[0]
    A = eqs.A
    eye6 = jnp.eye(6, dtype=eqs.U.dtype)
    eye3 = jnp.eye(3, dtype=eqs.V.dtype)
    Ud = eqs.U + lam * eye6[None]
    Vd = eqs.V + lam * eye3[None]
    # points with no observations have V=0; damping keeps Vd invertible,
    # and their bp is 0 so their update is 0
    Vinv = jnp.linalg.inv(Vd)
    Minv = jnp.linalg.inv(Ud)  # block-Jacobi preconditioner
    mask = jnp.where(fixed_cams, 0.0, 1.0)[:, None]  # [C,1]
    P_pts = eqs.V.shape[0]

    def WT_x(x):  # [C,6] -> [P,3]  (W^T x, global)
        tx = jnp.einsum("oij,oi->oj", A, x[obs_cam], precision=_P32)  # [O,3]
        g = jnp.zeros((P_pts, 3), jnp.float32).at[obs_pt].add(tx)
        return _psum(g, psum_axis)

    def W_z(z):  # [P,3] -> [C,6]  (W z, global)
        wz = jnp.einsum("oij,oj->oi", A, z[obs_pt], precision=_P32)  # [O,6]
        h = jnp.zeros((C, 6), jnp.float32).at[obs_cam].add(wz)
        return _psum(h, psum_axis)

    def S_mv(x):  # [C,6] -> [C,6], with gauge projection
        x = x * mask
        z = jnp.einsum("pij,pj->pi", Vinv, WT_x(x), precision=_P32)
        out = jnp.einsum("cij,cj->ci", Ud, x, precision=_P32) - W_z(z)
        return out * mask

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r, precision=_P32) * mask

    rhs = (
        eqs.bc
        - W_z(jnp.einsum("pij,pj->pi", Vinv, eqs.bp, precision=_P32))
    ) * mask

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(_, carry):
        x, r, pvec, rz = carry
        Sp = S_mv(pvec)
        denom = jnp.sum(pvec * Sp)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * pvec
        r = r - alpha * Sp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        pvec = z + beta * pvec
        return x, r, pvec, rz_new

    dc, _, _, _ = lax.fori_loop(0, cg_iters, body, (x0, r0, p0, rz0))
    dc = dc * mask
    # back-substitute: dp = Vinv (bp - W^T dc)
    dp = jnp.einsum("pij,pj->pi", Vinv, eqs.bp - WT_x(dc), precision=_P32)
    return dc, dp


def _resolve_solver(solver: str, p: BAProblem) -> str:
    """'auto' -> 'dense' when the materialized W [C,P,6,3] fits easily
    (<=128 MB), else 'cg'.

    Measured on v5e at the engine window size (6 cams x 2048 points,
    12k observations): dense = 185 LM iters/s vs CG = ~1 — the 60-iter
    matrix-free CG is a chain of ~600 serialized gather/scatter kernels,
    pure launch latency at this size, while the dense Schur path is ~10
    large batched einsums (S itself is only [6C,6C]). CG remains the
    scaling path: its per-iteration psum traffic is what distributes
    (parallel/dist_ba.py), and W at global scale (100 KFs x 1e5 points)
    would be hundreds of GB."""
    if solver != "auto":
        return solver
    C = p.cam_rvec.shape[0]
    P = p.points.shape[0]
    return "dense" if C * P * 72 <= 128 * 1024 * 1024 else "cg"


def ba_step(
    state: BAStepState,
    huber_delta: float | None = None,
    solver: str = "auto",
    cg_iters: int = 60,
) -> BAStepState:
    """One damped LM step with accept/reject (levmarq.cpp:88-197 schedule)."""
    p = state.problem
    solver = _resolve_solver(solver, p)
    if solver == "cg":
        eqs = normal_equations(p, huber_delta)
        dc, dp = schur_cg_solve(
            eqs, p.obs_cam, p.obs_pt, state.lam, p.fixed_cams, cg_iters
        )
    else:
        U, V, W, bc, bp = schur_normal_equations(p, huber_delta)
        dc, dp = schur_solve(U, V, W, bc, bp, state.lam, p.fixed_cams)
    new_p = p._replace(
        cam_rvec=p.cam_rvec + dc[:, :3],
        cam_tvec=p.cam_tvec + dc[:, 3:],
        points=p.points + dp,
    )
    c_new = cost(new_p)
    accept = (c_new < state.cost) & jnp.isfinite(c_new)
    merged = jax.tree.map(
        lambda a, b: jnp.where(accept, b, a), p, new_p
    )
    lam = jnp.where(accept, state.lam / 3.0, state.lam * 4.0)
    lam = jnp.clip(lam, 1e-10, 1e10)
    return BAStepState(
        problem=merged,
        lam=lam,
        cost=jnp.where(accept, c_new, state.cost),
        n_accepted=state.n_accepted + accept.astype(jnp.int32),
    )


def bundle_adjust(
    p: BAProblem,
    iters: int = 20,
    lambda0: float = 1e-4,
    huber_delta: float | None = None,
    solver: str = "auto",
    cg_iters: int = 60,
) -> tuple[BAProblem, jnp.ndarray]:
    """Run `iters` LM steps. Returns (optimized problem, final cost)."""

    def body(_, state):
        return ba_step(state, huber_delta, solver=solver, cg_iters=cg_iters)

    state0 = BAStepState(
        problem=p, lam=jnp.float32(lambda0), cost=cost(p), n_accepted=jnp.int32(0)
    )
    state = lax.fori_loop(0, iters, body, state0)
    return state.problem, state.cost
