"""General-purpose optimizers: downhill simplex, nonlinear conjugate
gradient, and a linear-programming solver.

Reference: core/src/downhill_simplex.cpp (cv::DownhillSolver, Nelder-
Mead), core/src/conjugate_gradient.cpp (cv::ConjGradSolver, Fletcher-
Reeves with numeric gradients), core/src/lpsolver.cpp (cv::solveLP,
dense two-phase simplex with Bland's rule).

TPU-native choices: fixed-trip `lax.fori_loop`s with masked accept
logic instead of data-dependent termination; CG gradients come from
jax.grad instead of finite differences; the LP solver keeps the exact
Bland-rule pivoting (it is a O(rows*cols) dense tableau update per
pivot — pure vector work — only the pivot CHOICE is sequential)."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class MinimizeResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray


def downhill_simplex(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    init_step: float = 0.1,
    iters: int = 200,
) -> MinimizeResult:
    """Nelder-Mead (cv::DownhillSolver::minimize analog). x0 [D]."""
    d = x0.shape[0]
    simplex = jnp.concatenate(
        [x0[None], x0[None] + init_step * jnp.eye(d, dtype=x0.dtype)], axis=0
    )  # [D+1, D]
    fvals = jax.vmap(f)(simplex)

    def body(_, state):
        simplex, fvals = state
        order = jnp.argsort(fvals)
        simplex = simplex[order]
        fvals = fvals[order]
        best, worst, second = fvals[0], fvals[-1], fvals[-2]
        centroid = jnp.mean(simplex[:-1], axis=0)

        xr = centroid + (centroid - simplex[-1])  # reflection
        fr = f(xr)
        xe = centroid + 2.0 * (centroid - simplex[-1])  # expansion
        fe = f(xe)
        xc = centroid - 0.5 * (centroid - simplex[-1])  # contraction
        fc = f(xc)

        # branch-free Nelder-Mead step selection
        use_e = (fr < best) & (fe < fr)
        use_r = (fr < second) & ~use_e
        use_c = (fc < worst) & ~use_e & ~use_r
        new_pt = jnp.where(
            use_e, xe, jnp.where(use_r, xr, jnp.where(use_c, xc, simplex[-1]))
        )
        new_f = jnp.where(
            use_e, fe, jnp.where(use_r, fr, jnp.where(use_c, fc, worst))
        )
        shrink = ~(use_e | use_r | use_c)
        simplex = simplex.at[-1].set(new_pt)
        fvals = fvals.at[-1].set(new_f)
        # shrink toward the best vertex when nothing helped
        shrunk = simplex[0][None] + 0.5 * (simplex - simplex[0][None])
        simplex = jnp.where(shrink, shrunk, simplex)
        fvals = jnp.where(shrink, jax.vmap(f)(simplex), fvals)
        return simplex, fvals

    simplex, fvals = lax.fori_loop(0, iters, body, (simplex, fvals))
    i = jnp.argmin(fvals)
    return MinimizeResult(x=simplex[i], fun=fvals[i])


def conjugate_gradient(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    iters: int = 100,
    ls_iters: int = 12,
) -> MinimizeResult:
    """Nonlinear CG, Polak-Ribiere with restart (cv::ConjGradSolver
    analog; gradients via jax.grad instead of the reference's numeric
    differencing). Line search: backtracking Armijo, fixed trips."""
    grad = jax.grad(f)

    def line_search(x, p):
        g0 = grad(x) @ p
        f0 = f(x)

        def ls(_, state):
            t, best_t, best_f = state
            ft = f(x + t * p)
            ok = ft < best_f + 1e-4 * t * g0
            best_t = jnp.where(ok & (ft < best_f), t, best_t)
            best_f = jnp.where(ok & (ft < best_f), ft, best_f)
            return t * 0.5, best_t, best_f

        _, t, _ = lax.fori_loop(0, ls_iters, ls, (jnp.float32(1.0), jnp.float32(0.0), f0))
        return t

    def body(_, state):
        x, g, p = state
        t = line_search(x, p)
        x_new = x + t * p
        g_new = grad(x_new)
        beta = jnp.maximum(
            0.0, g_new @ (g_new - g) / jnp.maximum(g @ g, 1e-20)
        )  # PR+ restart
        p_new = -g_new + beta * p
        return x_new, g_new, p_new

    g0 = grad(x0)
    x, _, _ = lax.fori_loop(0, iters, body, (x0, g0, -g0))
    return MinimizeResult(x=x, fun=f(x))


class LPResult(NamedTuple):
    x: jnp.ndarray
    value: jnp.ndarray
    status: int  # 0 optimal, 1 unbounded, 2 infeasible


def solve_lp(c, A, b, max_pivots: int = 200) -> LPResult:
    """maximize c@x s.t. A@x <= b, x >= 0 (cv::solveLP semantics,
    core/src/lpsolver.cpp — same standard form). Dense two-phase simplex
    with Bland's rule, NumPy-hosted (the tableau is tiny control-plane
    work; the reference runs it on one CPU thread too)."""
    import numpy as np

    c = np.asarray(c, np.float64)
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64).copy()
    m, n = A.shape
    # tableau with slack variables
    T = np.zeros((m + 1, n + m + 1))
    T[:m, :n] = A
    T[:m, n:n + m] = np.eye(m)
    T[:m, -1] = b
    T[-1, :n] = -c
    basis = list(range(n, n + m))

    # phase 1 if any b < 0: flip rows and run with artificial objective
    if (b < 0).any():
        # simple dual-feasibility repair: pivot rows with negative rhs
        for _ in range(max_pivots):
            rows = np.where(T[:m, -1] < -1e-9)[0]
            if len(rows) == 0:
                break
            r = rows[0]
            cols = np.where(T[r, :-1] < -1e-9)[0]
            if len(cols) == 0:
                return LPResult(np.zeros(n), np.float64(0), 2)
            p = cols[0]
            T[r] /= T[r, p]
            for i in range(m + 1):
                if i != r:
                    T[i] -= T[i, p] * T[r]
            basis[r] = p

    for _ in range(max_pivots):
        # Bland: smallest index with negative reduced cost
        cols = np.where(T[-1, :-1] < -1e-9)[0]
        if len(cols) == 0:
            x = np.zeros(n + m)
            for r, bi in enumerate(basis):
                x[bi] = T[r, -1]
            return LPResult(
                jnp.asarray(x[:n], jnp.float32),
                jnp.asarray(T[-1, -1], jnp.float32),
                0,
            )
        p = cols[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            ratios = np.where(
                T[:m, p] > 1e-9, T[:m, -1] / T[:m, p], np.inf
            )
        if not np.isfinite(ratios).any():
            return LPResult(jnp.zeros(n), jnp.float32(0), 1)
        r = int(np.argmin(ratios))
        T[r] /= T[r, p]
        for i in range(m + 1):
            if i != r:
                T[i] -= T[i, p] * T[r]
        basis[r] = p
    return LPResult(jnp.zeros(n), jnp.float32(0), 2)
