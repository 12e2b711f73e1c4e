"""ml breadth tests: trees, random forest, AdaBoost, MLP, kernel SVM.

Mirrors the reference ml test style (ml/test/test_mltests2.cpp trains
each model on small synthetic sets and asserts error bounds)."""

import numpy as np

import jax
import jax.numpy as jnp

from opencv_tpu.ml import classifiers, trees


def _two_moons(rng, n=200, noise=0.12):
    t = rng.uniform(0, np.pi, n)
    x0 = np.stack([np.cos(t), np.sin(t)], 1)
    x1 = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1)
    x = np.concatenate([x0, x1]).astype(np.float32)
    x += rng.normal(0, noise, x.shape).astype(np.float32)
    y = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int32)
    p = rng.permutation(2 * n)
    return x[p], y[p]


def _accuracy(pred, y):
    return float(np.mean(np.asarray(pred) == np.asarray(y)))


def test_single_tree_separates_blobs(rng):
    x = np.concatenate([
        rng.normal(-2, 0.5, (80, 3)), rng.normal(2, 0.5, (80, 3))
    ]).astype(np.float32)
    y = np.concatenate([np.zeros(80), np.ones(80)]).astype(np.int32)
    t = trees.fit_tree(jnp.asarray(x), jnp.asarray(y), depth=3, n_classes=2)
    p = trees.tree_predict_proba(t, jnp.asarray(x), 3)
    assert _accuracy(np.argmax(np.asarray(p), 1), y) > 0.98


def test_random_forest_two_moons(rng):
    x, y = _two_moons(rng)
    f = trees.fit_random_forest(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y),
        n_trees=12, depth=5,
    )
    p = trees.forest_predict_proba(f, jnp.asarray(x))
    assert _accuracy(np.argmax(np.asarray(p), 1), y) > 0.93


def test_adaboost_two_moons(rng):
    x, y = _two_moons(rng)
    m = trees.fit_adaboost(jnp.asarray(x), jnp.asarray(y), n_rounds=24, depth=2)
    d = trees.adaboost_decision(m, jnp.asarray(x))
    assert _accuracy(np.asarray(d) > 0, y) > 0.93


def test_mlp_two_moons(rng):
    x, y = _two_moons(rng)
    m = classifiers.train_mlp(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(y),
        hidden=(24,), iters=400,
    )
    p = classifiers.mlp_predict_proba(m, jnp.asarray(x))
    assert _accuracy(np.argmax(np.asarray(p), 1), y) > 0.95


def test_kernel_svm_two_moons(rng):
    x, y = _two_moons(rng)
    m = classifiers.train_kernel_svm(
        jnp.asarray(x), jnp.asarray(y), c=4.0, kind="rbf", gamma=2.0,
        iters=500,
    )
    d = classifiers.kernel_svm_decision(m, jnp.asarray(x))
    assert _accuracy(np.asarray(d) > 0, y) > 0.95
    # linear kernel should fail on moons but work on blobs
    xb = np.concatenate([
        rng.normal(-1.5, 0.4, (60, 2)), rng.normal(1.5, 0.4, (60, 2))
    ]).astype(np.float32)
    yb = np.concatenate([np.zeros(60), np.ones(60)]).astype(np.int32)
    ml = classifiers.train_kernel_svm(jnp.asarray(xb), jnp.asarray(yb),
                                      kind="linear", iters=300)
    dl = classifiers.kernel_svm_decision(ml, jnp.asarray(xb))
    assert _accuracy(np.asarray(dl) > 0, yb) > 0.97


def test_naive_bayes_blobs(rng):
    x = np.concatenate([
        rng.normal([-2, 0], 0.6, (80, 2)), rng.normal([2, 1], 0.6, (80, 2))
    ]).astype(np.float32)
    y = np.concatenate([np.zeros(80), np.ones(80)]).astype(np.int32)
    m = classifiers.train_naive_bayes(jnp.asarray(x), jnp.asarray(y))
    lp = classifiers.naive_bayes_predict_log_proba(m, jnp.asarray(x))
    assert _accuracy(np.argmax(np.asarray(lp), 1), y) > 0.97


def test_gbt_two_moons(rng):
    x, y = _two_moons(rng)
    m = trees.fit_gbt(jnp.asarray(x), jnp.asarray(y), n_rounds=40, depth=3)
    d = trees.gbt_decision(m, jnp.asarray(x))
    assert _accuracy(np.asarray(d) > 0, y) > 0.93
