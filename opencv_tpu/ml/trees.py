"""Decision trees, random forests, and boosting — TPU-native.

Reference: ml/src/tree.cpp (CART with pointer-chasing node structs),
rtrees.cpp (random forest), boost.cpp (Discrete/Real/Gentle AdaBoost).

TPU-native design: the classic recursive splitter is replaced by the
histogram method (the same formulation GPU gradient-boosting libraries
use): trees grow LEVEL-synchronOUSLY with dense node arrays —

  * features are pre-binned to B quantile buckets (uint8 [N, F]);
  * one level = ONE scatter-add building the [nodes, F, B, C] class
    histogram, a cumsum over bins, and a vectorized Gini argmin that
    picks (feature, threshold) for every node of the level at once;
  * the tree is a fixed-shape SoA (feature [M], bin [M], value [M],
    is_leaf [M]) with the standard 2i+1/2i+2 heap layout;
  * prediction is `depth` gather steps, vmapped over samples and trees.

Randomness (bootstrap + feature subsets) comes from jax.random: Poisson
sample weights and per-tree feature masks, so a whole forest trains as a
vmap over tree seeds.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class Tree(NamedTuple):
    feature: jnp.ndarray  # [M] i32 split feature per node
    bin: jnp.ndarray      # [M] i32 split bin (go left if xb <= bin)
    value: jnp.ndarray    # [M, C] class distribution at the node
    is_leaf: jnp.ndarray  # [M] bool
    thresholds: jnp.ndarray  # [F, B-1] bin edges (shared across forest)


def quantile_bins(x: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Per-feature quantile bin edges [F, B-1]."""
    qs = jnp.linspace(0.0, 100.0, n_bins + 1)[1:-1]
    return jnp.percentile(x, qs, axis=0).T


def bin_features(x: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
    """x [N,F] -> bin indices i32 [N,F] in [0, B)."""
    return jnp.sum(x[:, :, None] > thresholds[None], axis=-1).astype(jnp.int32)


def _gini_gain(hist_left, hist_right):
    """Weighted Gini impurity decrease proxy (lower total = better).
    hist_*: [..., C] class mass. Returns -(nl*gini_l + nr*gini_r)."""
    nl = jnp.sum(hist_left, -1)
    nr = jnp.sum(hist_right, -1)
    gl = 1.0 - jnp.sum(hist_left**2, -1) / jnp.maximum(nl * nl, 1e-12)
    gr = 1.0 - jnp.sum(hist_right**2, -1) / jnp.maximum(nr * nr, 1e-12)
    return -(nl * gl + nr * gr)


@partial(jax.jit, static_argnames=("depth", "n_bins", "n_classes"))
def fit_tree(
    x: jnp.ndarray,
    y: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    depth: int = 6,
    n_bins: int = 16,
    n_classes: int = 2,
    feature_mask: jnp.ndarray | None = None,
    thresholds: jnp.ndarray | None = None,
    min_gain: float = 1e-6,
) -> Tree:
    """Grow one CART classification tree (DTrees::train analog)."""
    n, f = x.shape
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    if feature_mask is None:
        feature_mask = jnp.ones((f,), bool)
    if thresholds is None:
        thresholds = quantile_bins(x, n_bins)
    xb = bin_features(x, thresholds)  # [N, F]
    m = 2 ** (depth + 1) - 1
    n_internal_levels = depth

    feat = jnp.zeros((m,), jnp.int32)
    sbin = jnp.full((m,), n_bins, jnp.int32)  # everything goes left
    is_leaf = jnp.zeros((m,), bool)
    value = jnp.zeros((m, n_classes), jnp.float32)
    onehot_y = jax.nn.one_hot(y, n_classes) * weights[:, None]

    node_id = jnp.zeros((n,), jnp.int32)
    for level in range(n_internal_levels):
        n_nodes = 2 ** level
        base = n_nodes - 1
        local = node_id - base  # [-..) valid where sample is at this level
        active = (local >= 0) & (local < n_nodes)
        # class histogram per (node, feature, bin)
        idx = (
            (local[:, None] * f + jnp.arange(f)[None, :]) * n_bins + xb
        ).reshape(-1)
        idx = jnp.clip(idx, 0, n_nodes * f * n_bins - 1)
        wrep = jnp.repeat(onehot_y[:, None, :], f, axis=1).reshape(-1, n_classes)
        wrep = wrep * active[:, None].repeat(f, 0).reshape(-1, 1)
        hist = jnp.zeros((n_nodes * f * n_bins, n_classes), jnp.float32)
        hist = hist.at[idx].add(wrep)
        hist = hist.reshape(n_nodes, f, n_bins, n_classes)

        left = jnp.cumsum(hist, axis=2)  # mass with bin <= b
        total = left[:, :, -1:, :]
        right = total - left
        gain = _gini_gain(left, right)  # [nodes, F, B]
        # never split on the last bin (empty right side) or masked features
        gain = gain.at[:, :, -1].set(-jnp.inf)
        gain = jnp.where(feature_mask[None, :, None], gain, -jnp.inf)

        # parent impurity for the stop test
        tot_node = total[:, 0, 0, :]  # [nodes, C]
        parent = _gini_gain(tot_node, jnp.zeros_like(tot_node))
        flat = gain.reshape(n_nodes, -1)
        best = jnp.argmax(flat, axis=1)
        best_gain = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        bf = (best // n_bins).astype(jnp.int32)
        bb = (best % n_bins).astype(jnp.int32)
        # min-samples stop uses raw COUNTS (weights may be normalized —
        # AdaBoost passes weights summing to 1)
        cnt = jnp.zeros((n_nodes,), jnp.int32).at[
            jnp.clip(local, 0, n_nodes - 1)
        ].add(active.astype(jnp.int32))
        rel_gain = (best_gain - parent) / jnp.maximum(jnp.abs(parent), 1e-12)
        leaf_here = (rel_gain <= min_gain) | (cnt < 2)

        ids = base + jnp.arange(n_nodes)
        feat = feat.at[ids].set(jnp.where(leaf_here, 0, bf))
        sbin = sbin.at[ids].set(jnp.where(leaf_here, n_bins, bb))
        is_leaf = is_leaf.at[ids].set(leaf_here)
        value = value.at[ids].set(tot_node)

        # route samples: frozen at leaves, else to children
        node_feat = feat[node_id]
        node_bin = sbin[node_id]
        go_right = xb[jnp.arange(n), node_feat] > node_bin
        child = 2 * node_id + 1 + go_right.astype(jnp.int32)
        frozen = is_leaf[node_id] | ~active
        node_id = jnp.where(frozen, node_id, child)

    # final level: everything is a leaf
    n_nodes = 2 ** n_internal_levels
    base = n_nodes - 1
    local = node_id - base
    active = (local >= 0) & (local < n_nodes)
    hist = jnp.zeros((n_nodes, n_classes), jnp.float32)
    hist = hist.at[jnp.clip(local, 0, n_nodes - 1)].add(
        onehot_y * active[:, None]
    )
    ids = base + jnp.arange(n_nodes)
    value = value.at[ids].set(hist)
    is_leaf = is_leaf.at[ids].set(True)
    return Tree(feat, sbin, value, is_leaf, thresholds)


def tree_predict_proba(tree: Tree, x: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Class distribution [N, C] by `depth` gather steps."""
    xb = bin_features(x, tree.thresholds)
    n = x.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for _ in range(depth):
        go_right = xb[jnp.arange(n), tree.feature[node]] > tree.bin[node]
        child = 2 * node + 1 + go_right.astype(jnp.int32)
        node = jnp.where(tree.is_leaf[node], node, child)
    v = tree.value[node]
    return v / jnp.maximum(jnp.sum(v, -1, keepdims=True), 1e-12)


class Forest(NamedTuple):
    trees: Tree  # stacked: leading axis = tree
    depth: int
    n_classes: int


def fit_random_forest(
    key: jax.Array,
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_trees: int = 16,
    depth: int = 6,
    n_bins: int = 16,
    n_classes: int = 2,
    feature_frac: float = 0.7,
) -> Forest:
    """Random forest (RTrees::train analog): Poisson(1) bootstrap weights
    + per-tree Bernoulli feature masks, whole forest as one vmap."""
    thresholds = quantile_bins(x, n_bins)
    f = x.shape[1]

    def one(k):
        kw, kf = jax.random.split(k)
        w = jax.random.poisson(kw, 1.0, (x.shape[0],)).astype(jnp.float32)
        fm = jax.random.uniform(kf, (f,)) < feature_frac
        fm = fm.at[jax.random.randint(kf, (), 0, f)].set(True)  # >=1 feature
        return fit_tree(
            x, y, w, depth=depth, n_bins=n_bins, n_classes=n_classes,
            feature_mask=fm, thresholds=thresholds,
        )

    trees = jax.vmap(one)(jax.random.split(key, n_trees))
    return Forest(trees=trees, depth=depth, n_classes=n_classes)


def forest_predict_proba(forest: Forest, x: jnp.ndarray) -> jnp.ndarray:
    probs = jax.vmap(
        lambda t: tree_predict_proba(t, x, forest.depth)
    )(forest.trees)
    return jnp.mean(probs, axis=0)


class Boosted(NamedTuple):
    trees: Tree        # stacked stumps/shallow trees
    alpha: jnp.ndarray # [T] stage weights
    depth: int


def fit_adaboost(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_rounds: int = 32,
    depth: int = 2,
    n_bins: int = 16,
) -> Boosted:
    """Discrete AdaBoost over shallow trees (Boost::train with
    BOOST_DISCRETE, ml/src/boost.cpp). y in {0, 1}."""
    n = x.shape[0]
    thresholds = quantile_bins(x, n_bins)
    w = jnp.full((n,), 1.0 / n, jnp.float32)
    ys = 2.0 * y.astype(jnp.float32) - 1.0
    trees, alphas = [], []
    for _ in range(n_rounds):
        t = fit_tree(
            x, y, w, depth=depth, n_bins=n_bins, n_classes=2,
            thresholds=thresholds,
        )
        p = tree_predict_proba(t, x, depth)
        h = jnp.where(p[:, 1] > p[:, 0], 1.0, -1.0)
        err = jnp.sum(w * (h != ys)) / jnp.maximum(jnp.sum(w), 1e-12)
        err = jnp.clip(err, 1e-6, 1 - 1e-6)
        a = 0.5 * jnp.log((1 - err) / err)
        w = w * jnp.exp(-a * ys * h)
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        trees.append(t)
        alphas.append(a)
    stacked = jax.tree_util.tree_map(lambda *ts: jnp.stack(ts), *trees)
    return Boosted(trees=stacked, alpha=jnp.stack(alphas), depth=depth)


def adaboost_decision(model: Boosted, x: jnp.ndarray) -> jnp.ndarray:
    """Signed decision values [N] (positive = class 1)."""
    def stage(t):
        p = tree_predict_proba(t, x, model.depth)
        return jnp.where(p[:, 1] > p[:, 0], 1.0, -1.0)

    h = jax.vmap(stage)(model.trees)  # [T, N]
    return jnp.einsum("t,tn->n", model.alpha, h)


class GBT(NamedTuple):
    """Gradient-boosted trees for binary classification (the reference's
    GBT module, ml gradient boosting): shallow REGRESSION trees fit to
    logistic-loss gradients, shrunk by a learning rate."""
    trees: Tree      # stacked
    f0: jnp.ndarray  # initial log-odds
    lr: float
    depth: int


def _fit_regression_tree(x, r, depth, n_bins, thresholds):
    """Regression tree on residuals via the classification machinery:
    residuals are encoded as sample weights on a 2-class target
    (sign(r) with |r| weights); leaf value = weighted mean residual.
    Simpler: fit variance-reducing splits with (sum, count) statistics."""
    # reuse fit_tree with 2 pseudo-classes carrying (positive mass,
    # negative mass); leaf prediction = (pos - neg) / (pos + neg + eps)
    y = (r > 0).astype(jnp.int32)
    w = jnp.abs(r) + 1e-8
    t = fit_tree(x, y, w, depth=depth, n_bins=n_bins, n_classes=2,
                 thresholds=thresholds)
    return t


def _tree_value(tree: Tree, x, depth):
    """Signed leaf value from the 2-class mass encoding."""
    xb = bin_features(x, tree.thresholds)
    n = x.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for _ in range(depth):
        go_right = xb[jnp.arange(n), tree.feature[node]] > tree.bin[node]
        child = 2 * node + 1 + go_right.astype(jnp.int32)
        node = jnp.where(tree.is_leaf[node], node, child)
    v = tree.value[node]  # [N, 2] = (neg mass, pos mass)
    tot = jnp.maximum(v[:, 0] + v[:, 1], 1e-8)
    return (v[:, 1] - v[:, 0]) / tot  # mean residual sign-weighted


def fit_gbt(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_rounds: int = 40,
    depth: int = 3,
    lr: float = 0.3,
    n_bins: int = 16,
) -> GBT:
    """Binary logistic gradient boosting. y in {0, 1}."""
    thresholds = quantile_bins(x, n_bins)
    yf = y.astype(jnp.float32)
    p0 = jnp.clip(jnp.mean(yf), 1e-3, 1 - 1e-3)
    f = jnp.full(yf.shape, jnp.log(p0 / (1 - p0)))
    f0 = f[0]
    trees = []
    for _ in range(n_rounds):
        p = jax.nn.sigmoid(f)
        r = yf - p  # negative gradient of logistic loss
        t = _fit_regression_tree(x, r, depth, n_bins, thresholds)
        trees.append(t)
        f = f + lr * _tree_value(t, x, depth)
    stacked = jax.tree_util.tree_map(lambda *ts: jnp.stack(ts), *trees)
    return GBT(trees=stacked, f0=f0, lr=lr, depth=depth)


def gbt_decision(model: GBT, x: jnp.ndarray) -> jnp.ndarray:
    """Log-odds [N] (positive -> class 1)."""
    vals = jax.vmap(lambda t: _tree_value(t, x, model.depth))(model.trees)
    return model.f0 + model.lr * jnp.sum(vals, axis=0)
