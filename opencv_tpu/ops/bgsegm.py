"""Background subtraction: MOG2 Gaussian-mixture model.

Reference: video/src/bgfg_gaussmix2.cpp (Zivkovic MOG2) and the GPU
version cudabgsegm/src/mog2.cpp + cuda/mog2.cu.

TPU-native: the model state is a pytree of [K, H, W] arrays and the
whole per-pixel mixture update (ownership test, weight decay, mean/var
updates, component replacement, background ranking) is one fused
elementwise step over every pixel — the reference's per-pixel loop and
the CUDA thread-per-pixel kernel become a batched `apply`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MOG2State(NamedTuple):
    weights: jnp.ndarray  # [K, H, W]
    means: jnp.ndarray  # [K, H, W]
    variances: jnp.ndarray  # [K, H, W]


class MOG2Config(NamedTuple):
    n_mixtures: int = 5
    history: int = 500
    var_threshold: float = 16.0  # squared Mahalanobis gate
    background_ratio: float = 0.9
    var_init: float = 15.0
    var_min: float = 4.0
    var_max: float = 75.0


def init_state(img: jnp.ndarray, cfg: MOG2Config = MOG2Config()) -> MOG2State:
    h, w = img.shape
    k = cfg.n_mixtures
    weights = jnp.zeros((k, h, w), jnp.float32).at[0].set(1.0)
    means = jnp.zeros((k, h, w), jnp.float32).at[0].set(img.astype(jnp.float32))
    variances = jnp.full((k, h, w), cfg.var_init, jnp.float32)
    return MOG2State(weights, means, variances)


class KNNState(NamedTuple):
    """Sample bank [S, H, W] for the KNN background model
    (video/src/bgfg_KNN.cpp analog)."""

    samples: jnp.ndarray
    step: jnp.ndarray  # i32 frame counter (drives cyclic replacement)


def knn_init(img: jnp.ndarray, n_samples: int = 10) -> KNNState:
    return KNNState(
        samples=jnp.tile(img.astype(jnp.float32)[None], (n_samples, 1, 1)),
        step=jnp.int32(0),
    )


def knn_apply(
    state: KNNState,
    img: jnp.ndarray,
    key,
    dist_threshold: float = 20.0,
    k_needed: int = 2,
    update_prob: float = 0.2,
) -> tuple[KNNState, jnp.ndarray]:
    """One frame of the KNN background subtractor: foreground when fewer
    than k samples lie within dist_threshold; background pixels refresh a
    random sample slot with probability update_prob."""
    import jax as _jax

    x = img.astype(jnp.float32)[None]
    close = jnp.abs(state.samples - x) < dist_threshold  # [S,H,W]
    n_close = jnp.sum(close, axis=0)
    fg = n_close < k_needed
    s = state.samples.shape[0]
    k1, k2 = _jax.random.split(key)
    slot = _jax.random.randint(k1, img.shape, 0, s)
    do = (~fg) & (_jax.random.uniform(k2, img.shape) < update_prob)
    ss = jnp.arange(s)[:, None, None]
    replace = (ss == slot[None]) & do[None]
    samples = jnp.where(replace, x, state.samples)
    return KNNState(samples=samples, step=state.step + 1), fg


def apply(
    state: MOG2State, img: jnp.ndarray, cfg: MOG2Config = MOG2Config(),
    learning_rate: float | None = None,
) -> tuple[MOG2State, jnp.ndarray]:
    """One frame update. Returns (new_state, foreground_mask [H, W])."""
    alpha = 1.0 / cfg.history if learning_rate is None else learning_rate
    x = img.astype(jnp.float32)[None]  # [1, H, W]
    w_ = state.weights
    mu = state.means
    var = state.variances

    d2 = (x - mu) ** 2 / jnp.maximum(var, 1e-6)  # squared Mahalanobis [K,H,W]
    fits = d2 < cfg.var_threshold

    # the matched component = best-fitting among those that fit
    match_score = jnp.where(fits, d2, jnp.inf)
    owner = jnp.argmin(match_score, axis=0)  # [H, W]
    any_fit = jnp.any(fits, axis=0)
    ks = jnp.arange(w_.shape[0])[:, None, None]
    is_owner = (ks == owner[None]) & any_fit[None]

    # weight update: w += alpha*(o - w)
    w_new = w_ + alpha * (is_owner.astype(jnp.float32) - w_)
    # mean/variance update for the owner
    rho = alpha / jnp.maximum(w_new, 1e-6)
    mu_new = jnp.where(is_owner, mu + rho * (x - mu), mu)
    var_new = jnp.where(is_owner, var + rho * ((x - mu) ** 2 - var), var)
    var_new = jnp.clip(var_new, cfg.var_min, cfg.var_max)

    # no component fits: replace the weakest with a new one centred on x
    weakest = jnp.argmin(w_new, axis=0)
    replace = (~any_fit)[None] & (ks == weakest[None])
    w_new = jnp.where(replace, alpha, w_new)
    mu_new = jnp.where(replace, x, mu_new)
    var_new = jnp.where(replace, cfg.var_init, var_new)

    # renormalize
    w_new = w_new / jnp.maximum(jnp.sum(w_new, axis=0, keepdims=True), 1e-9)

    # background = top components whose cumulative weight (sorted by
    # weight/sigma fitness) reaches background_ratio
    fitness = w_new / jnp.sqrt(var_new)
    order = jnp.argsort(-fitness, axis=0)  # [K,H,W]
    w_sorted = jnp.take_along_axis(w_new, order, axis=0)
    cum = jnp.cumsum(w_sorted, axis=0)
    n_bg_sorted = cum - w_sorted < cfg.background_ratio  # component included
    is_bg_sorted = n_bg_sorted
    # invert the permutation to mark background components
    inv = jnp.argsort(order, axis=0)
    is_bg = jnp.take_along_axis(is_bg_sorted, inv, axis=0)

    fg = ~jnp.any(fits & is_bg, axis=0)
    return MOG2State(w_new, mu_new, var_new), fg
