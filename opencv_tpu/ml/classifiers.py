"""Classic classifiers (reference `ml` module analogs): k-NN
(ml/src/knearest.cpp), linear SVM (ml/src/svm.cpp, linear kernel),
logistic regression (ml/src/lr.cpp).

TPU-native: training is full-batch gradient descent on the convex
objectives (the reference's SMO / IRLS are replaced by fixed-trip
optimizers that vectorize); inference is one matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_P32 = lax.Precision.HIGHEST


# ---------- k-NN ----------

def knn_classify(
    train_x: jnp.ndarray, train_y: jnp.ndarray, query_x: jnp.ndarray,
    k: int = 5, n_classes: int | None = None,
) -> jnp.ndarray:
    """Majority vote over the k nearest neighbours (findNearest analog)."""
    if n_classes is None:
        n_classes = int(jnp.max(train_y)) + 1
    x2 = jnp.sum(query_x * query_x, axis=1, keepdims=True)
    t2 = jnp.sum(train_x * train_x, axis=1)[None, :]
    d = x2 + t2 - 2.0 * jnp.dot(query_x, train_x.T, precision=_P32)
    _, idx = lax.top_k(-d, k)  # [Q, k]
    votes = train_y[idx]  # [Q, k]
    counts = jnp.sum(
        votes[:, :, None] == jnp.arange(n_classes)[None, None, :], axis=1
    )
    return jnp.argmax(counts, axis=1)


# ---------- linear SVM ----------

class LinearModel(NamedTuple):
    w: jnp.ndarray
    b: jnp.ndarray


def train_linear_svm(
    x: jnp.ndarray, y: jnp.ndarray, c: float = 1.0, iters: int = 1000,
    lr: float = 0.1,
) -> LinearModel:
    """L2-regularized SQUARED hinge loss, full-batch GD. y in {-1, +1}.
    (Squared hinge is smooth, so plain gradient descent converges
    cleanly — the L2-SVM variant; the reference's SMO solves the same
    separator for the linear kernel.)"""
    n, d = x.shape
    y = y.astype(jnp.float32)

    def loss(params):
        w, b = params[:d], params[d]
        margins = y * (x @ w + b)
        hinge = jnp.mean(jnp.maximum(0.0, 1.0 - margins) ** 2)
        return 0.5 / (c * n) * jnp.sum(w * w) + hinge

    grad = jax.grad(loss)

    def body(i, params):
        g = grad(params)
        step = lr / (1.0 + 0.01 * i)
        return params - step * g

    params = lax.fori_loop(0, iters, body, jnp.zeros(d + 1))
    return LinearModel(w=params[:d], b=params[d])


def svm_predict(model: LinearModel, x: jnp.ndarray) -> jnp.ndarray:
    """Signed decision values (threshold at 0 for labels)."""
    return x @ model.w + model.b


# ---------- logistic regression ----------

def train_logistic_regression(
    x: jnp.ndarray, y: jnp.ndarray, l2: float = 1e-3, iters: int = 100,
) -> LinearModel:
    """Binary logistic regression by Newton's method. y in {0, 1}."""
    n, d = x.shape
    xb = jnp.concatenate([x, jnp.ones((n, 1), x.dtype)], axis=1)
    y = y.astype(jnp.float32)

    def body(_, w):
        z = xb @ w
        p = jax.nn.sigmoid(z)
        g = xb.T @ (p - y) / n + l2 * w
        s = p * (1.0 - p)
        H = jnp.einsum("ni,n,nj->ij", xb, s, xb, precision=_P32) / n
        H = H + l2 * jnp.eye(d + 1)
        return w - jnp.linalg.solve(H, g)

    w = lax.fori_loop(0, iters, body, jnp.zeros(d + 1))
    return LinearModel(w=w[:d], b=w[d])


def logistic_predict_proba(model: LinearModel, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x @ model.w + model.b)
