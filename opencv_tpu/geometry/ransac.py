"""Batched-hypothesis RANSAC: generate ALL hypotheses, score ALL at once.

The reference has two RANSAC shapes: the sequential CPU registrator loop
with adaptive early stopping (calib3d/src/ptsetreg.cpp:170-241) and the
GPU pattern that generates every hypothesis up front and scores them all
in one kernel (cudalegacy/src/calib3d.cpp:152-260 +
cuda/calib3d.cu:143-188 `computeHypothesisScoresKernel`). The TPU build
uses the GPU shape: a fixed generous hypothesis batch is one big vmapped
computation with static shapes — adaptive stopping would serialize the
device (SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from opencv_tpu.core.config import RansacConfig


class RansacResult(NamedTuple):
    model: jnp.ndarray  # best model parameters
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # scalar i32
    ok: jnp.ndarray  # scalar bool — found any valid model


def _sample_subsets(
    key: jax.Array, n: int, valid: jnp.ndarray, n_subsets: int, subset_size: int
) -> jnp.ndarray:
    """[H, S] int32 indices of valid points, distinct within each subset.

    Gumbel-top-k trick (vectorizes where sequential rejection sampling —
    ptsetreg.cpp:102 getSubset — would not): add Gumbel noise to
    log-weights, take top-S per hypothesis.
    """
    g = jax.random.gumbel(key, (n_subsets, n))
    logw = jnp.where(valid, 0.0, -jnp.inf)[None, :]
    _, idx = jax.lax.top_k(g + logw, subset_size)
    return idx


def ransac(
    key: jax.Array,
    n_points: int,
    valid: jnp.ndarray,
    subset_size: int,
    model_fn: Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]],
    error_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: RansacConfig = RansacConfig(),
) -> RansacResult:
    """Generic batched RANSAC.

    model_fn(subset_idx [S]) -> (model, model_ok): fit one hypothesis from
        point indices (closure over the data).
    error_fn(model) -> err [N]: per-point model error (squared or abs —
        caller matches cfg.threshold units).

    The degenerate-sample handling (model_ok=False) replaces the
    reference's checkSubset degeneracy tests (ptsetreg.cpp:102).
    """
    subsets = _sample_subsets(key, n_points, valid, cfg.n_hypotheses, subset_size)
    models, model_ok = jax.vmap(model_fn)(subsets)  # [H,...], [H]
    errs = jax.vmap(error_fn)(models)  # [H, N]
    inlier_mat = (errs < cfg.threshold) & valid[None, :]
    scores = jnp.where(model_ok, jnp.sum(inlier_mat, axis=1), -1)
    best = jnp.argmax(scores)
    best_model = jax.tree.map(lambda m: m[best], models)
    return RansacResult(
        model=best_model,
        inliers=inlier_mat[best],
        n_inliers=jnp.maximum(scores[best], 0),
        ok=scores[best] >= subset_size,
    )


def ransac_adaptive(
    key: jax.Array,
    n_points: int,
    valid: jnp.ndarray,
    subset_size: int,
    model_fn: Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]],
    error_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: RansacConfig = RansacConfig(),
    chunk: int = 128,
) -> RansacResult:
    """Chunked adaptive RANSAC — the reference's early-exit rule
    (RANSACUpdateNumIters, ptsetreg.cpp:53-74) at TPU granularity.

    Hypotheses are generated and scored `chunk` at a time inside a
    `lax.while_loop`; after each chunk the required iteration count is
    recomputed from the best inlier ratio, and the loop exits once
    enough hypotheses have been seen (or cfg.n_hypotheses is reached).
    At typical front-end inlier ratios (>50%) this runs ONE chunk where
    the fixed batch runs cfg.n_hypotheses — the reference's adaptive
    semantics without serializing per-hypothesis."""
    from jax import lax

    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    max_h = cfg.n_hypotheses
    log1mconf = jnp.log(jnp.float32(max(1.0 - cfg.confidence, 1e-12)))

    def one_chunk(k):
        subsets = _sample_subsets(k, n_points, valid, chunk, subset_size)
        models, model_ok = jax.vmap(model_fn)(subsets)
        errs = jax.vmap(error_fn)(models)
        inlier_mat = (errs < cfg.threshold) & valid[None, :]
        scores = jnp.where(model_ok, jnp.sum(inlier_mat, axis=1), -1)
        b = jnp.argmax(scores)
        return (
            jax.tree.map(lambda m: m[b], models),
            inlier_mat[b],
            scores[b],
        )

    def needed_iters(best_n):
        w = best_n.astype(jnp.float32) / n_valid.astype(jnp.float32)
        w = jnp.clip(w, 0.0, 1.0 - 1e-6)
        denom = jnp.log(jnp.maximum(1.0 - w**subset_size, 1e-12))
        need = jnp.where(
            best_n <= subset_size, jnp.float32(max_h), log1mconf / denom
        )
        return jnp.minimum(need, jnp.float32(max_h))

    key0, sub0 = jax.random.split(key)
    m0, in0, n0 = one_chunk(sub0)

    def cond(state):
        key, m, inl, best_n, done = state
        return (done.astype(jnp.float32) < needed_iters(best_n)) & (
            done < max_h
        )

    def body(state):
        key, m, inl, best_n, done = state
        key, sub = jax.random.split(key)
        mc, ic, nc = one_chunk(sub)
        better = nc > best_n
        m = jax.tree.map(
            lambda a, b: jnp.where(better, b, a), m, mc
        )
        inl = jnp.where(better, ic, inl)
        best_n = jnp.maximum(best_n, nc)
        return key, m, inl, best_n, done + chunk

    _, model, inliers, best_n, _ = lax.while_loop(
        cond, body, (key0, m0, in0, n0, jnp.int32(chunk))
    )
    return RansacResult(
        model=model,
        inliers=inliers,
        n_inliers=jnp.maximum(best_n, 0),
        ok=best_n >= subset_size,
    )
