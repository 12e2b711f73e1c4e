"""Generic dense Levenberg-Marquardt solver.

Re-expression of the reference's modern LMSolver (calib3d/src/levmarq.cpp:
88-197): J^T J via normal equations, damped solve, gain-ratio lambda
schedule with Rlo=0.25 / Rhi=0.75. Differences for TPU: Jacobians come
from jax.jacfwd (the reference requires callback-provided J), and the
iteration is a fixed-trip-count `lax.fori_loop` with masked accept/reject
instead of data-dependent early exit (XLA-idiomatic; a rejected step
re-solves with a larger lambda next trip).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_P32 = lax.Precision.HIGHEST


class LMResult(NamedTuple):
    params: jnp.ndarray
    cost: jnp.ndarray  # final 0.5*||r||^2
    n_accepted: jnp.ndarray


def levmarq(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    iters: int = 30,
    lambda0: float = 1e-3,
    lambda_up: float = 4.0,
    lambda_down: float = 1.0 / 3.0,
) -> LMResult:
    """Minimize 0.5*||residual_fn(x)||^2 over flat params x."""

    def cost(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    n = x0.shape[0]

    def body(_, state):
        x, lam, c, n_acc = state
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        H = jnp.einsum("ni,nj->ij", J, J, precision=_P32)
        g = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diag(H) + 1e-12)
        step = jnp.linalg.solve(Hd, g)
        x_new = x - step
        c_new = cost(x_new)
        # gain ratio: actual reduction / predicted reduction
        pred = 0.5 * step @ (lam * (jnp.diag(H) + 1e-12) * step + g)
        rho = (c - c_new) / jnp.maximum(pred, 1e-30)
        accept = (c_new < c) & jnp.all(jnp.isfinite(x_new))
        x = jnp.where(accept, x_new, x)
        c_out = jnp.where(accept, c_new, c)
        lam = jnp.where(
            accept,
            jnp.where(rho > 0.75, lam * lambda_down, lam),
            lam * lambda_up,
        )
        lam = jnp.clip(lam, 1e-12, 1e12)
        return x, lam, c_out, n_acc + accept.astype(jnp.int32)

    c0 = cost(x0)
    x, lam, c, n_acc = lax.fori_loop(
        0, iters, body, (x0, jnp.float32(lambda0), c0, jnp.int32(0))
    )
    return LMResult(params=x, cost=c, n_accepted=n_acc)
