"""Clustering: k-means (cv::kmeans, core/src/kmeans.cpp) and
Gaussian-mixture EM (ml/src/em.cpp).

TPU-native: one Lloyd / EM iteration is a pair of batched matmul +
segment-sum passes over the whole dataset; k-means++ seeding uses the
same distance matmuls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_P32 = lax.Precision.HIGHEST


def _pairwise_sqdist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """[N, K] squared distances via the expansion trick (MXU matmul)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    return jnp.maximum(x2 + c2 - 2.0 * jnp.dot(x, c.T, precision=_P32), 0.0)


def kmeans_pp_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding (kmeans.cpp generateCentersPP)."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)

    def body(i, carry):
        centers, key = carry
        d = _pairwise_sqdist(x, centers)
        ii = jnp.arange(k)
        mind = jnp.min(jnp.where(ii[None, :] < i, d, jnp.inf), axis=1)
        key, sub = jax.random.split(key)
        probs = mind / jnp.maximum(jnp.sum(mind), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[idx]), key

    centers, _ = lax.fori_loop(1, k, body, (centers, key))
    return centers


class KMeansResult(NamedTuple):
    centers: jnp.ndarray  # [K, D]
    labels: jnp.ndarray  # [N]
    inertia: jnp.ndarray  # sum of squared distances


def kmeans(
    key: jax.Array, x: jnp.ndarray, k: int, iters: int = 30,
) -> KMeansResult:
    """cv::kmeans analog (KMEANS_PP_CENTERS + Lloyd iterations)."""
    x = x.astype(jnp.float32)
    centers0 = kmeans_pp_init(key, x, k)

    def body(_, centers):
        d = _pairwise_sqdist(x, centers)
        labels = jnp.argmin(d, axis=1)
        one_hot = (labels[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
        counts = jnp.sum(one_hot, axis=0)
        sums = jnp.einsum("nk,nd->kd", one_hot, x, precision=_P32)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # keep empty clusters where they were
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = lax.fori_loop(0, iters, body, centers0)
    d = _pairwise_sqdist(x, centers)
    labels = jnp.argmin(d, axis=1)
    inertia = jnp.sum(jnp.min(d, axis=1))
    return KMeansResult(centers=centers, labels=labels, inertia=inertia)


class GMMResult(NamedTuple):
    weights: jnp.ndarray  # [K]
    means: jnp.ndarray  # [K, D]
    variances: jnp.ndarray  # [K, D] diagonal covariances
    log_likelihood: jnp.ndarray


def gmm_em(
    key: jax.Array, x: jnp.ndarray, k: int, iters: int = 50, var_floor: float = 1e-4
) -> GMMResult:
    """Diagonal-covariance Gaussian mixture EM (EM::trainEM analog,
    ml/src/em.cpp with COV_MAT_DIAGONAL)."""
    x = x.astype(jnp.float32)
    n, d = x.shape
    km = kmeans(key, x, k, iters=10)
    means0 = km.centers
    weights0 = jnp.full((k,), 1.0 / k)
    var0 = jnp.tile(jnp.var(x, axis=0)[None, :], (k, 1)) + var_floor

    def log_prob(means, variances, weights):
        # [N, K] log p(x | comp) + log w
        diff2 = (x[:, None, :] - means[None, :, :]) ** 2 / variances[None, :, :]
        ll = -0.5 * (
            jnp.sum(diff2, axis=-1)
            + jnp.sum(jnp.log(2.0 * jnp.pi * variances), axis=-1)[None, :]
        )
        return ll + jnp.log(weights)[None, :]

    def body(_, carry):
        weights, means, variances = carry
        lp = log_prob(means, variances, weights)
        resp = jax.nn.softmax(lp, axis=1)  # [N, K]
        nk = jnp.sum(resp, axis=0)
        means = jnp.einsum("nk,nd->kd", resp, x, precision=_P32) / jnp.maximum(
            nk[:, None], 1e-9
        )
        diff2 = (x[:, None, :] - means[None, :, :]) ** 2
        variances = jnp.einsum("nk,nkd->kd", resp, diff2, precision=_P32) / jnp.maximum(
            nk[:, None], 1e-9
        ) + var_floor
        weights = nk / n
        return weights, means, variances

    weights, means, variances = lax.fori_loop(
        0, iters, body, (weights0, means0, var0)
    )
    lp = log_prob(means, variances, weights)
    ll = jnp.sum(jax.nn.logsumexp(lp, axis=1))
    return GMMResult(weights, means, variances, ll)
