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

import jax
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


# --------------------------------------------------------------- GMG ---

class GMGState(NamedTuple):
    """Godbehere-Matsukawa-Goldberg background model (cudalegacy GMG /
    bgsegm's BackgroundSubtractorGMG): per-pixel quantized-color
    histograms with Bayesian foreground posterior, trained on the first
    `n_init_frames` frames."""
    hist: jnp.ndarray        # [B, H, W] bin weights
    frame_idx: jnp.ndarray   # i32


def gmg_init(h: int, w: int, n_bins: int = 16) -> GMGState:
    return GMGState(
        hist=jnp.zeros((n_bins, h, w), jnp.float32),
        frame_idx=jnp.int32(0),
    )


def gmg_apply(
    state: GMGState,
    img: jnp.ndarray,
    n_init_frames: int = 30,
    learning_rate: float = 0.025,
    decision_threshold: float = 0.8,
) -> tuple[GMGState, jnp.ndarray]:
    """One frame: returns (state, fg mask [H,W] bool). During the first
    n_init_frames only the model trains (mask = all background)."""
    n_bins = state.hist.shape[0]
    x = jnp.clip(img.astype(jnp.float32), 0.0, 255.0)
    b = jnp.clip((x / 256.0 * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = jax.nn.one_hot(b, n_bins, axis=0)  # [B, H, W]

    total = jnp.sum(state.hist, axis=0)
    w_cur = jnp.sum(state.hist * onehot, axis=0)
    p_bg = w_cur / jnp.maximum(total, 1e-6)
    fg = (1.0 - p_bg) > decision_threshold
    training = state.frame_idx < n_init_frames
    fg = jnp.where(training, False, fg)

    # train: accumulate; run: blend into background for bg pixels only
    upd_train = state.hist + onehot
    blend = jnp.where(fg[None], 0.0, learning_rate)
    upd_run = state.hist * (1.0 - blend) + onehot * blend
    hist = jnp.where(training, upd_train, upd_run)
    return GMGState(hist=hist, frame_idx=state.frame_idx + 1), fg


# --------------------------------------------------------------- FGD ---

class FGDState(NamedTuple):
    """Li et al. FGD (cudalegacy fgd.cpp): Bayes decision between
    learned background/foreground color-feature statistics plus a
    maintained reference background image."""
    bg: jnp.ndarray       # [H, W] reference background
    hist_bg: jnp.ndarray  # [B, H, W] stats of colors seen as background
    hist_fg: jnp.ndarray  # [B, H, W] stats of colors seen as foreground


def fgd_init(img: jnp.ndarray, n_bins: int = 32) -> FGDState:
    h, w = img.shape
    return FGDState(
        bg=img.astype(jnp.float32),
        hist_bg=jnp.zeros((n_bins, h, w), jnp.float32),
        hist_fg=jnp.zeros((n_bins, h, w), jnp.float32),
    )


def fgd_apply(
    state: FGDState,
    img: jnp.ndarray,
    delta: float = 12.0,
    alpha: float = 0.02,
    prior_fg: float = 0.15,
) -> tuple[FGDState, jnp.ndarray]:
    """One frame: change detection vs the reference background, Bayes
    re-classification from the learned color tables, model update."""
    n_bins = state.hist_bg.shape[0]
    x = img.astype(jnp.float32)
    changed = jnp.abs(x - state.bg) > delta

    b = jnp.clip((x / 256.0 * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = jax.nn.one_hot(b, n_bins, axis=0)
    w_bg = jnp.sum(state.hist_bg * onehot, axis=0)
    w_fg = jnp.sum(state.hist_fg * onehot, axis=0)
    # Bayes veto: a changed pixel is foreground unless its color has a
    # strong background history (the FGD tables exist to ABSORB dynamic
    # background — swaying trees — not to gate novel colors, which must
    # default to foreground; Li et al.'s unlearned case)
    fg = changed & (prior_fg * (w_fg + 1.0) > (1 - prior_fg) * w_bg)

    hist_bg = state.hist_bg * (1 - alpha) + onehot * alpha * (~fg)[None]
    hist_fg = state.hist_fg * (1 - alpha) + onehot * alpha * fg[None]
    bg = jnp.where(fg, state.bg, state.bg * (1 - alpha) + x * alpha)
    return FGDState(bg=bg, hist_bg=hist_bg, hist_fg=hist_fg), fg
