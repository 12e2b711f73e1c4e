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


# ---------------------------------------------------------------- MLP ---

class MLPModel(NamedTuple):
    weights: tuple  # tuple of [in, out] matrices
    biases: tuple   # tuple of [out] vectors


def _mlp_forward(params: MLPModel, x: jnp.ndarray) -> jnp.ndarray:
    h = x
    n_layers = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ w + b
        if i < n_layers - 1:
            h = jnp.tanh(h)  # the reference's symmetric sigmoid
    return h


def train_mlp(
    key: jax.Array,
    x: jnp.ndarray,
    y: jnp.ndarray,
    hidden: tuple[int, ...] = (16,),
    n_classes: int = 2,
    iters: int = 300,
    eta0: float = 0.05,
    eta_up: float = 1.2,
    eta_down: float = 0.5,
    eta_max: float = 5.0,
    eta_min: float = 1e-6,
) -> MLPModel:
    """Multilayer perceptron trained with full-batch RPROP — the
    reference ANN_MLP's default trainer (ml/src/ann_mlp.cpp; symmetric
    sigmoid activations, softmax cross-entropy readout here).

    RPROP is elementwise sign logic over the whole parameter pytree:
    per-weight step sizes grow where the gradient sign persists and
    shrink where it flips — exactly the kind of branch-free vector
    update the VPU eats, and jax.grad replaces the hand-written
    backprop tables."""
    sizes = (x.shape[1],) + hidden + (n_classes,)
    keys = jax.random.split(key, len(sizes) - 1)
    ws = tuple(
        jax.random.normal(k, (i, o)) * jnp.sqrt(2.0 / i)
        for k, i, o in zip(keys, sizes[:-1], sizes[1:])
    )
    bs = tuple(jnp.zeros((o,)) for o in sizes[1:])
    params = MLPModel(ws, bs)
    onehot = jax.nn.one_hot(y, n_classes)

    def loss(p):
        logits = _mlp_forward(p, x)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))

    grad_fn = jax.grad(loss)
    etas = jax.tree_util.tree_map(lambda w: jnp.full_like(w, eta0), params)
    prev_g = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, _):
        p, etas, prev_g = carry
        g = grad_fn(p)

        def upd(w, gi, pg, eta):
            same = gi * pg > 0
            flip = gi * pg < 0
            eta_new = jnp.clip(
                jnp.where(same, eta * eta_up, jnp.where(flip, eta * eta_down, eta)),
                eta_min, eta_max,
            )
            gi_eff = jnp.where(flip, 0.0, gi)  # classic RPROP- sign hold
            w_new = w - jnp.sign(gi_eff) * eta_new
            return w_new, eta_new, gi_eff

        # three tree_maps over the same elementwise update; XLA CSEs the
        # duplicate work under jit
        p_new = jax.tree_util.tree_map(lambda w, gi, pg, eta: upd(w, gi, pg, eta)[0], p, g, prev_g, etas)
        eta_new = jax.tree_util.tree_map(lambda w, gi, pg, eta: upd(w, gi, pg, eta)[1], p, g, prev_g, etas)
        g_new = jax.tree_util.tree_map(lambda w, gi, pg, eta: upd(w, gi, pg, eta)[2], p, g, prev_g, etas)
        return (p_new, eta_new, g_new), None

    (params, _, _), _ = jax.lax.scan(step, (params, etas, prev_g), None, length=iters)
    return params


def mlp_predict_proba(model: MLPModel, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(_mlp_forward(model, x), axis=-1)


# --------------------------------------------------------- kernel SVM ---

class KernelSVM(NamedTuple):
    alpha: jnp.ndarray   # [N] dual coefficients (already * y)
    sv_x: jnp.ndarray    # [N, F] training points
    kind: str            # "rbf" | "poly" | "linear"
    gamma: float
    degree: int
    coef0: float


def _kernel(kind, x1, x2, gamma, degree, coef0):
    if kind == "rbf":
        d2 = (
            jnp.sum(x1 * x1, -1)[:, None]
            - 2.0 * x1 @ x2.T
            + jnp.sum(x2 * x2, -1)[None, :]
        )
        return jnp.exp(-gamma * jnp.maximum(d2, 0.0))
    if kind == "poly":
        return (gamma * (x1 @ x2.T) + coef0) ** degree
    return x1 @ x2.T


def train_kernel_svm(
    x: jnp.ndarray,
    y: jnp.ndarray,
    c: float = 1.0,
    kind: str = "rbf",
    gamma: float | None = None,
    degree: int = 3,
    coef0: float = 1.0,
    iters: int = 300,
) -> KernelSVM:
    """C-SVC with RBF/poly/linear kernels (SVM::train analog,
    ml/src/svm.cpp).

    TPU-native solver: instead of SMO's sequential 2-variable updates,
    the bias is absorbed into the kernel (K+1 trick) so the dual has box
    constraints only, and projected gradient ascent runs on the full
    Gram matrix — one [N,N] MXU matmul per iteration. y in {0,1}."""
    n, f = x.shape
    ys = 2.0 * y.astype(jnp.float32) - 1.0
    if gamma is None:
        gamma = 1.0 / (f * jnp.maximum(jnp.var(x), 1e-12))
        gamma = float(gamma)
    K = _kernel(kind, x, x, gamma, degree, coef0) + 1.0  # bias absorbed
    Q = K * (ys[:, None] * ys[None, :])
    # Lipschitz step from the Gram trace
    step = 1.0 / jnp.maximum(jnp.max(jnp.sum(jnp.abs(Q), axis=1)), 1e-9)

    def body(_, a):
        g = 1.0 - Q @ a  # gradient of the dual objective
        return jnp.clip(a + step * g, 0.0, c)

    alpha = lax.fori_loop(0, iters, body, jnp.zeros((n,), jnp.float32))
    return KernelSVM(
        alpha=alpha * ys, sv_x=x, kind=kind,
        gamma=float(gamma), degree=degree, coef0=coef0,
    )


def kernel_svm_decision(model: KernelSVM, x: jnp.ndarray) -> jnp.ndarray:
    """Signed decision values [M] (positive -> class 1)."""
    K = _kernel(model.kind, x, model.sv_x, model.gamma, model.degree,
                model.coef0) + 1.0
    return K @ model.alpha


# -------------------------------------------------------- naive Bayes ---

class GaussianNB(NamedTuple):
    mean: jnp.ndarray   # [C, F]
    var: jnp.ndarray    # [C, F]
    log_prior: jnp.ndarray  # [C]


def train_naive_bayes(x: jnp.ndarray, y: jnp.ndarray,
                      n_classes: int = 2) -> GaussianNB:
    """Gaussian naive Bayes (NormalBayesClassifier analog,
    ml/src/nbayes.cpp): per-class feature means/variances by one-hot
    segment sums."""
    onehot = jax.nn.one_hot(y, n_classes)  # [N, C]
    cnt = jnp.maximum(jnp.sum(onehot, 0), 1.0)  # [C]
    mean = (onehot.T @ x) / cnt[:, None]
    ex2 = (onehot.T @ (x * x)) / cnt[:, None]
    var = jnp.maximum(ex2 - mean * mean, 1e-6)
    return GaussianNB(mean=mean, var=var,
                      log_prior=jnp.log(cnt / jnp.sum(cnt)))


def naive_bayes_predict_log_proba(model: GaussianNB, x: jnp.ndarray) -> jnp.ndarray:
    d = x[:, None, :] - model.mean[None]  # [N, C, F]
    ll = -0.5 * jnp.sum(
        d * d / model.var[None] + jnp.log(2 * jnp.pi * model.var)[None], -1
    )
    logp = ll + model.log_prior[None]
    return logp - jax.nn.logsumexp(logp, axis=1, keepdims=True)


# ----------------------------------------------------------------- SVMSGD


class SVMSGDModel(NamedTuple):
    weights: jnp.ndarray  # [D]
    shift: jnp.ndarray  # scalar; decision f(x) = w.x - shift... see predict


def train_svmsgd(
    x: jnp.ndarray,  # [N, D] f32
    y: jnp.ndarray,  # [N] labels; >= 0 is the positive class
    svmsgd_type: str = "asgd",  # "sgd" | "asgd" (averaged, the default)
    margin_type: str = "soft",  # "soft" | "hard"
    margin_regularization: float = 1e-5,
    initial_step_size: float = 0.05,
    step_decreasing_power: float = 0.75,
    iters: int = 100_000,
    seed: int = 0,
) -> SVMSGDModel:
    """cv::ml::SVMSGD analog (reference: ml/src/svmsgd.cpp:60).

    Same algorithm, TPU-shaped: samples are mean-centered and scaled by
    1/mean(|x|) with a homogeneous 1-column appended
    (makeExtendedTrainSamples, svmsgd.cpp:173); the per-sample SGD loop
    (svmsgd.cpp:283-305) becomes one `lax.scan` over pre-drawn random
    indices with the identical update rule — weight decay off the
    margin, hinge-gradient step on it (updateWeights, :184) — the
    1/(1+lambda*step0*t)^power step schedule (:289), and the ASGD
    running average (:295). SOFT_MARGIN shift comes from the learned
    homogeneous coordinate, HARD_MARGIN from the midpoint of the
    class-wise minimal margins (calcShift, :203). The reference's
    eps-based early stop is dropped (data-dependent loop length is
    hostile to jit; a fixed budget with ASGD averaging converges the
    same way).
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    pos = jnp.asarray(y) >= 0
    resp = jnp.where(pos, 1.0, -1.0)
    # makeExtendedTrainSamples: center, scale, append homogeneous 1
    average = jnp.mean(x, axis=0)
    xc = x - average
    multiplier = 1.0 / (jnp.mean(jnp.abs(xc)) + 1e-12)
    ext = jnp.concatenate(
        [xc * multiplier, jnp.ones((n, 1), jnp.float32)], axis=1
    )
    idx = jax.random.randint(jax.random.PRNGKey(seed), (iters,), 0, n)
    lam = jnp.float32(margin_regularization)
    step0 = jnp.float32(initial_step_size)
    power = jnp.float32(step_decreasing_power)

    def body(carry, it_and_i):
        w, w_avg = carry
        it, i = it_and_i
        s = ext[i]
        r = resp[i]
        step = step0 * (1.0 + lam * step0 * it.astype(jnp.float32)) ** (-power)
        on_margin = jnp.dot(s, w) * r <= 1.0
        w_decay = w * (1.0 - step * lam)
        w_sv = w - step * lam * w + step * r * s
        w = jnp.where(on_margin, w_sv, w_decay)
        t = it.astype(jnp.float32)
        w_avg = (t / (1.0 + t)) * w_avg + w / (1.0 + t)
        return (w, w_avg), None

    w0 = jnp.zeros(d + 1, jnp.float32)
    (w_fin, w_avg), _ = lax.scan(
        body, (w0, w0), (jnp.arange(iters), idx)
    )
    ext_w = w_avg if svmsgd_type == "asgd" else w_fin
    weights = ext_w[:d] * multiplier
    if margin_type == "soft":
        shift = ext_w[d] - jnp.dot(weights, average)
    else:
        dots = x @ weights
        m_pos = jnp.min(jnp.where(pos, dots, jnp.inf))
        m_neg = jnp.min(jnp.where(pos, jnp.inf, -dots))
        shift = -(m_pos - m_neg) / 2.0
    return SVMSGDModel(weights=weights, shift=shift)


def svmsgd_decision(model: SVMSGDModel, x: jnp.ndarray) -> jnp.ndarray:
    """Signed decision value f(x) = w.x + shift (svmsgd.cpp predict)."""
    return jnp.asarray(x, jnp.float32) @ model.weights + model.shift


def svmsgd_predict(model: SVMSGDModel, x: jnp.ndarray) -> jnp.ndarray:
    """Class labels in {-1, +1} (sign of the decision value)."""
    return jnp.where(svmsgd_decision(model, x) > 0, 1.0, -1.0)
