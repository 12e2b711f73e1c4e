"""Distributed bundle adjustment: observation-sharded Schur assembly.

SURVEY.md §7.8: shard the per-observation work (residuals, Jacobian
blocks, block outer products) over the mesh's data axis; `psum` the
reduced accumulators (U, V, W, bc, bp) over ICI; solve the (small) reduced
camera system replicated on every device. This is the SLAM analog of
data-parallel gradient aggregation — the collective rides ICI exactly
like a gradient all-reduce.

The math is optim/ba.py verbatim; only the assembly is wrapped in
`shard_map`. Observations must be padded to a multiple of the mesh size
(masked rows contribute zeros, so padding is free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from opencv_tpu.optim import ba
from opencv_tpu.parallel.mesh import DATA_AXIS


def sharded_normal_equations(
    p: ba.BAProblem, mesh: Mesh, huber_delta: float | None = None
):
    """U, V, W, bc, bp with observation arrays sharded over DATA_AXIS."""

    def assemble(cam_rvec, cam_tvec, points, fixed, obs_cam, obs_pt, obs_uv, obs_valid):
        local = ba.BAProblem(
            cam_rvec, cam_tvec, points, obs_cam, obs_pt, obs_uv, obs_valid, fixed
        )
        U, V, W, bc, bp = ba.schur_normal_equations(local, huber_delta)
        return tuple(
            jax.lax.psum(x, DATA_AXIS) for x in (U, V, W, bc, bp)
        )

    rep = P()
    shd = P(DATA_AXIS)
    return jax.shard_map(
        assemble,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, shd, shd, shd, shd),
        out_specs=(rep, rep, rep, rep, rep),
    )(
        p.cam_rvec, p.cam_tvec, p.points, p.fixed_cams,
        p.obs_cam, p.obs_pt, p.obs_uv, p.obs_valid,
    )


def ba_step_sharded(
    state: ba.BAStepState, mesh: Mesh, huber_delta: float | None = None
) -> ba.BAStepState:
    """One LM step with distributed assembly (drop-in for ba.ba_step)."""
    p = state.problem
    U, V, W, bc, bp = sharded_normal_equations(p, mesh, huber_delta)
    dc, dp = ba.schur_solve(U, V, W, bc, bp, state.lam, p.fixed_cams)
    new_p = p._replace(
        cam_rvec=p.cam_rvec + dc[:, :3],
        cam_tvec=p.cam_tvec + dc[:, 3:],
        points=p.points + dp,
    )
    c_new = ba.cost(new_p)
    accept = (c_new < state.cost) & jnp.isfinite(c_new)
    merged = jax.tree.map(lambda a, b: jnp.where(accept, b, a), p, new_p)
    lam = jnp.clip(
        jnp.where(accept, state.lam / 3.0, state.lam * 4.0), 1e-10, 1e10
    )
    return ba.BAStepState(
        problem=merged,
        lam=lam,
        cost=jnp.where(accept, c_new, state.cost),
        n_accepted=state.n_accepted + accept.astype(jnp.int32),
    )


def bundle_adjust_sharded(
    p: ba.BAProblem,
    mesh: Mesh,
    iters: int = 20,
    lambda0: float = 1e-4,
    huber_delta: float | None = None,
) -> tuple[ba.BAProblem, jnp.ndarray]:
    """Distributed bundle_adjust. Observation count must divide evenly by
    the data-axis size (pad with obs_valid=False rows)."""
    n_dev = mesh.shape[DATA_AXIS]
    assert p.obs_cam.shape[0] % n_dev == 0, (
        f"pad observations ({p.obs_cam.shape[0]}) to a multiple of mesh "
        f"size ({n_dev})"
    )

    state = ba.BAStepState(
        problem=p, lam=jnp.float32(lambda0), cost=ba.cost(p),
        n_accepted=jnp.int32(0),
    )
    step = jax.jit(functools.partial(ba_step_sharded, mesh=mesh, huber_delta=huber_delta))
    for _ in range(iters):
        state = step(state)
    return state.problem, state.cost
