"""Misc optimizer tests (downhill simplex, CG, LP) — the core/src
{downhill_simplex,conjugate_gradient,lpsolver}.cpp analogs."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.optim import minimize


def test_downhill_simplex_rosenbrock():
    def rosen(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize.downhill_simplex(
        rosen, jnp.asarray([-1.2, 1.0]), init_step=0.5, iters=400
    )
    assert float(res.fun) < 1e-3
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=0.05)


def test_conjugate_gradient_quadratic(rng):
    a = rng.normal(0, 1, (6, 6)).astype(np.float32)
    Q = jnp.asarray(a @ a.T + 6 * np.eye(6, dtype=np.float32))
    b = jnp.asarray(rng.normal(0, 1, 6).astype(np.float32))

    def f(x):
        return 0.5 * x @ Q @ x - b @ x

    res = minimize.conjugate_gradient(f, jnp.zeros(6), iters=60)
    want = np.linalg.solve(np.asarray(Q), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-2)


def test_conjugate_gradient_rosenbrock():
    def rosen(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize.conjugate_gradient(rosen, jnp.asarray([-1.2, 1.0]), iters=200)
    assert float(res.fun) < 1e-4


def test_solve_lp_basic():
    # cv::solveLP doc example: max 3x+1y+2z s.t. x+y+3z<=30, 2x+2y+5z<=24,
    # 4x+y+2z<=36 -> optimum 28 at (8, 4, 0)
    c = [3.0, 1.0, 2.0]
    A = [[1, 1, 3], [2, 2, 5], [4, 1, 2]]
    b = [30, 24, 36]
    res = minimize.solve_lp(c, A, b)
    assert res.status == 0
    np.testing.assert_allclose(float(res.value), 28.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x), [8.0, 4.0, 0.0], atol=1e-6)


def test_solve_lp_unbounded():
    res = minimize.solve_lp([1.0], np.asarray([[-1.0]]), [1.0])
    assert res.status == 1
