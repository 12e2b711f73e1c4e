"""Distributed bundle adjustment: observation-sharded, matrix-free Schur-CG.

SURVEY.md §7.8: shard the per-observation work (residuals, Jacobian
blocks, block outer products) over the mesh's data axis. Unlike a dense
Schur assembly, NOTHING observation-sized ever crosses the interconnect:

  * per LM step, the psum'd accumulators are U [C,6,6], V [P,3,3],
    bc [C,6], bp [P,3] — parameter-sized, like a gradient all-reduce;
  * the per-observation blocks A = Jc^T Jp stay resident on their shard;
  * each CG iteration on the reduced camera system psums exactly one
    [P,3] and one [C,6] partial segment-sum over ICI.

The math is optim/ba.py verbatim (`schur_cg_solve` with `psum_axis`);
this module only wraps the LM step in `shard_map`. Observations must be
padded to a multiple of the mesh size (masked rows contribute zeros, so
padding is free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from opencv_tpu.optim import ba
from opencv_tpu.parallel.mesh import DATA_AXIS


def sharded_normal_equations(
    p: ba.BAProblem, mesh: Mesh, huber_delta: float | None = None,
    axes: str | tuple[str, ...] = DATA_AXIS,
) -> ba.NormalEqs:
    """Sparse normal equations with observation arrays sharded over
    `axes`. U/V/bc/bp come back replicated (psum'd); A comes back
    row-sharded over observations (it never needs to be gathered).

    `axes` may be a single mesh axis or a (host, chip) tuple from
    parallel/multihost.py — observations then shard over the flattened
    hierarchy and the psums reduce ICI-first, then DCN."""

    def assemble(cam_rvec, cam_tvec, points, fixed, obs_cam, obs_pt, obs_uv, obs_valid):
        local = ba.BAProblem(
            cam_rvec, cam_tvec, points, obs_cam, obs_pt, obs_uv, obs_valid, fixed
        )
        eqs = ba.normal_equations(local, huber_delta)
        return ba.NormalEqs(
            U=jax.lax.psum(eqs.U, axes),
            V=jax.lax.psum(eqs.V, axes),
            bc=jax.lax.psum(eqs.bc, axes),
            bp=jax.lax.psum(eqs.bp, axes),
            A=eqs.A,
        )

    rep = P()
    shd = P(axes)
    return jax.shard_map(
        assemble,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, shd, shd, shd, shd),
        out_specs=ba.NormalEqs(U=rep, V=rep, bc=rep, bp=rep, A=shd),
    )(
        p.cam_rvec, p.cam_tvec, p.points, p.fixed_cams,
        p.obs_cam, p.obs_pt, p.obs_uv, p.obs_valid,
    )


def ba_step_sharded(
    state: ba.BAStepState,
    mesh: Mesh,
    huber_delta: float | None = None,
    cg_iters: int = 60,
    axes: str | tuple[str, ...] = DATA_AXIS,
) -> ba.BAStepState:
    """One LM step with distributed assembly + distributed Schur-CG
    (drop-in for ba.ba_step)."""
    p = state.problem

    def step_local(
        cam_rvec, cam_tvec, points, fixed, lam, cost_prev,
        obs_cam, obs_pt, obs_uv, obs_valid,
    ):
        local = ba.BAProblem(
            cam_rvec, cam_tvec, points, obs_cam, obs_pt, obs_uv, obs_valid, fixed
        )
        eqs = ba.normal_equations(local, huber_delta)
        eqs = eqs._replace(
            U=jax.lax.psum(eqs.U, axes),
            V=jax.lax.psum(eqs.V, axes),
            bc=jax.lax.psum(eqs.bc, axes),
            bp=jax.lax.psum(eqs.bp, axes),
        )
        dc, dp = ba.schur_cg_solve(
            eqs, obs_cam, obs_pt, lam, fixed,
            cg_iters=cg_iters, psum_axis=axes,
        )
        new_local = local._replace(
            cam_rvec=cam_rvec + dc[:, :3],
            cam_tvec=cam_tvec + dc[:, 3:],
            points=points + dp,
        )
        c_new = jax.lax.psum(ba.cost(new_local), axes)
        accept = (c_new < cost_prev) & jnp.isfinite(c_new)
        out_rvec = jnp.where(accept, new_local.cam_rvec, cam_rvec)
        out_tvec = jnp.where(accept, new_local.cam_tvec, cam_tvec)
        out_pts = jnp.where(accept, new_local.points, points)
        new_lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 4.0), 1e-10, 1e10)
        new_cost = jnp.where(accept, c_new, cost_prev)
        return out_rvec, out_tvec, out_pts, new_lam, new_cost, accept

    rep = P()
    shd = P(axes)
    out_rvec, out_tvec, out_pts, lam, cost_new, accept = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, shd, shd, shd, shd),
        out_specs=(rep, rep, rep, rep, rep, rep),
    )(
        p.cam_rvec, p.cam_tvec, p.points, p.fixed_cams, state.lam, state.cost,
        p.obs_cam, p.obs_pt, p.obs_uv, p.obs_valid,
    )
    return ba.BAStepState(
        problem=p._replace(cam_rvec=out_rvec, cam_tvec=out_tvec, points=out_pts),
        lam=lam,
        cost=cost_new,
        n_accepted=state.n_accepted + accept.astype(jnp.int32),
    )


def bundle_adjust_sharded(
    p: ba.BAProblem,
    mesh: Mesh,
    iters: int = 20,
    lambda0: float = 1e-4,
    huber_delta: float | None = None,
    cg_iters: int = 60,
    axes: str | tuple[str, ...] = DATA_AXIS,
) -> tuple[ba.BAProblem, jnp.ndarray]:
    """Distributed bundle_adjust. Observation count must divide evenly by
    the sharded-axes size (pad with obs_valid=False rows)."""
    ax_list = (axes,) if isinstance(axes, str) else axes
    n_dev = 1
    for a in ax_list:
        n_dev *= mesh.shape[a]
    assert p.obs_cam.shape[0] % n_dev == 0, (
        f"pad observations ({p.obs_cam.shape[0]}) to a multiple of mesh "
        f"size ({n_dev})"
    )

    state = ba.BAStepState(
        problem=p, lam=jnp.float32(lambda0), cost=ba.cost(p),
        n_accepted=jnp.int32(0),
    )
    step = jax.jit(
        functools.partial(
            ba_step_sharded, mesh=mesh, huber_delta=huber_delta,
            cg_iters=cg_iters, axes=axes,
        )
    )
    for _ in range(iters):
        state = step(state)
    return state.problem, state.cost
