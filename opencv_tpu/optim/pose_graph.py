"""Pose-graph optimization (the loop-closure back-end).

The reference has no pose-graph solver — its closest analog is the
spanning-tree rotation propagation + global BA of the stitching module
(motion_estimators.cpp:181 findMaxSpanningTree, :221 estimate). SLAM
needs the real thing: minimize sum over edges (i,j) of
|| log( T_ij^-1 T_i^-1 T_j ) ||^2 over absolute poses T.

TPU-native: fixed edge capacity with validity masks, Gauss-Newton with
autodiff Jacobians, one dense damped solve per iteration (a 6N x 6N
Cholesky is MXU work — dense is *faster* than sparse bookkeeping at SLAM
graph sizes on this hardware).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.geometry.rotation import rodrigues, rodrigues_inv

_P32 = lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    """Nodes: world->camera poses (rvec [N,3], tvec [N,3]).
    Edges: relative measurements T_ij = T_i T_j^-1 ... stored as the
    expected pose of j expressed in i's frame: meas = T_i^-1 compose T_j?
    Convention used here: residual_e = log( meas_e^-1 * (T_i * T_j^-1) )
    with T = (R|t) world->cam; meas [E,6] = (rvec, tvec).
    edge_i/edge_j [E] i32, edge_weight [E] f32 (0 = invalid), fixed [N]."""

    rvec: jnp.ndarray
    tvec: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_meas: jnp.ndarray
    edge_weight: jnp.ndarray
    fixed: jnp.ndarray


def relative_pose(
    rv_i: jnp.ndarray, tv_i: jnp.ndarray, rv_j: jnp.ndarray, tv_j: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """T_rel = T_i * T_j^-1 (maps cam-j coords to cam-i coords)."""
    Ri = rodrigues(rv_i)
    Rj = rodrigues(rv_j)
    Rrel = Ri @ Rj.T
    trel = tv_i - Rrel @ tv_j
    return rodrigues_inv(Rrel), trel


def _edge_residual(
    rv_i, tv_i, rv_j, tv_j, meas6
) -> jnp.ndarray:
    """6-vector log-residual of one edge."""
    Ri = rodrigues(rv_i)
    Rj = rodrigues(rv_j)
    Rrel = Ri @ Rj.T
    trel = tv_i - Rrel @ tv_j
    Rm = rodrigues(meas6[:3])
    dR = Rm.T @ Rrel
    dr = rodrigues_inv(dR)
    dt = trel - meas6[3:]
    return jnp.concatenate([dr, dt])


def residuals(g: PoseGraph) -> jnp.ndarray:
    r = jax.vmap(_edge_residual)(
        g.rvec[g.edge_i], g.tvec[g.edge_i],
        g.rvec[g.edge_j], g.tvec[g.edge_j],
        g.edge_meas,
    )  # [E,6]
    return r * g.edge_weight[:, None]


def optimize(
    g: PoseGraph, iters: int = 15, lambda0: float = 1e-4
) -> tuple[PoseGraph, jnp.ndarray]:
    """Damped Gauss-Newton on the full graph (dense normal equations)."""
    N = g.rvec.shape[0]

    def flat_residual(x):
        gg = g._replace(rvec=x[:, :3], tvec=x[:, 3:])
        return residuals(gg).reshape(-1)

    def total_cost(x):
        r = flat_residual(x)
        return 0.5 * jnp.sum(r * r)

    def body(_, state):
        x, lam, c = state
        r = flat_residual(x)
        J = jax.jacfwd(lambda xf: flat_residual(xf.reshape(N, 6)))(x.reshape(-1))
        H = jnp.einsum("ni,nj->ij", J, J, precision=_P32)
        gvec = J.T @ r
        # gauge fixing: huge diagonal on fixed nodes
        fix = jnp.repeat(g.fixed, 6)
        H = H + jnp.diag(jnp.where(fix, 1e12, 0.0) + lam)
        step = jnp.linalg.solve(H, gvec).reshape(N, 6)
        step = jnp.where(g.fixed[:, None], 0.0, step)
        x_new = x - step
        c_new = total_cost(x_new)
        accept = (c_new < c) & jnp.isfinite(c_new)
        x = jnp.where(accept, x_new, x)
        c = jnp.where(accept, c_new, c)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 4.0), 1e-10, 1e10)
        return x, lam, c

    x0 = jnp.concatenate([g.rvec, g.tvec], axis=1)
    x, lam, c = lax.fori_loop(0, iters, body, (x0, jnp.float32(lambda0), total_cost(x0)))
    return g._replace(rvec=x[:, :3], tvec=x[:, 3:]), c
