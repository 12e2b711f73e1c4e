"""Shape analysis (reference `shape` module analogs): Hausdorff distance
(shape/src/haus_dis.cpp), shape-context distance (sc_dis.cpp), and
thin-plate-spline transformer (tps_trans.cpp).

TPU-native: point-set distances are masked pairwise-distance matmuls;
shape-context histograms are one-hot bin scatter-sums; TPS solves one
dense kernel system (MXU) and evaluates as matmuls. The assignment step
of the shape-context distance reuses the native Hungarian
(tbd/assignment.py).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

_P32 = lax.Precision.HIGHEST


def _pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1)[None, :]
    return jnp.sqrt(
        jnp.maximum(a2 + b2 - 2.0 * jnp.dot(a, b.T, precision=_P32), 0.0)
    )


def hausdorff_distance(
    a: jnp.ndarray, b: jnp.ndarray, rank_quantile: float = 1.0
) -> jnp.ndarray:
    """Symmetric (partial) Hausdorff distance between point sets [N,2]/[M,2].
    rank_quantile < 1 gives the partial variant used by
    HausdorffDistanceExtractor (rankProportion)."""
    d = _pairwise_dist(a.astype(jnp.float32), b.astype(jnp.float32))
    ab = jnp.min(d, axis=1)  # each a to nearest b
    ba = jnp.min(d, axis=0)

    def ranked(v):
        s = jnp.sort(v)
        k = jnp.clip(
            jnp.int32(rank_quantile * v.shape[0]) - 1, 0, v.shape[0] - 1
        )
        return s[k]

    return jnp.maximum(ranked(ab), ranked(ba))


def shape_context(
    pts: jnp.ndarray, n_radial: int = 5, n_angular: int = 12,
    r_min: float = 0.125, r_max: float = 2.0,
) -> jnp.ndarray:
    """Log-polar shape-context histograms [N, n_radial * n_angular]
    (SCD::extractSCD analog), radii normalized by the mean pairwise
    distance."""
    pts = pts.astype(jnp.float32)
    n = pts.shape[0]
    diff = pts[None, :, :] - pts[:, None, :]  # [N, N, 2] (j - i)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-18))
    mean_d = jnp.sum(dist) / (n * (n - 1))
    rnorm = dist / jnp.maximum(mean_d, 1e-9)
    ang = jnp.arctan2(diff[..., 1], diff[..., 0]) % (2.0 * math.pi)
    r_edges = jnp.exp(
        jnp.linspace(jnp.log(r_min), jnp.log(r_max), n_radial + 1)
    )
    r_bin = jnp.sum(rnorm[..., None] >= r_edges[None, None, :], axis=-1) - 1
    a_bin = jnp.floor(ang / (2.0 * math.pi) * n_angular).astype(jnp.int32)
    a_bin = jnp.clip(a_bin, 0, n_angular - 1)
    valid = (r_bin >= 0) & (r_bin < n_radial) & ~jnp.eye(n, dtype=bool)
    flat_bin = jnp.clip(r_bin, 0, n_radial - 1) * n_angular + a_bin
    one_hot = (
        (flat_bin[..., None] == jnp.arange(n_radial * n_angular)[None, None, :])
        & valid[..., None]
    )
    hist = jnp.sum(one_hot, axis=1).astype(jnp.float32)
    return hist / jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1.0)


def shape_context_distance(a: jnp.ndarray, b: jnp.ndarray) -> float:
    """Chi-squared shape-context cost with optimal assignment
    (ShapeContextDistanceExtractor analog; requires len(a) == len(b))."""
    from opencv_tpu.tbd.assignment import linear_assignment

    ha = shape_context(a)
    hb = shape_context(b)
    num = (ha[:, None, :] - hb[None, :, :]) ** 2
    den = ha[:, None, :] + hb[None, :, :]
    cost = 0.5 * jnp.sum(num / jnp.maximum(den, 1e-9), axis=-1)
    cost_np = np.asarray(cost, np.float64)
    assign = linear_assignment(cost_np)
    return float(np.mean([cost_np[i, j] for i, j in enumerate(assign) if j >= 0]))


class TPSTransform(NamedTuple):
    src: jnp.ndarray  # [N, 2] control points
    weights: jnp.ndarray  # [N + 3, 2]


def _tps_kernel(r2: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(r2 > 1e-12, 0.5 * r2 * jnp.log(jnp.maximum(r2, 1e-12)), 0.0)


def fit_tps(
    src: jnp.ndarray, dst: jnp.ndarray, regularization: float = 0.0
) -> TPSTransform:
    """Thin-plate spline mapping src -> dst (TpsTransformer analog)."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[0]
    d = _pairwise_dist(src, src)
    K = _tps_kernel(d * d) + regularization * jnp.eye(n)
    P = jnp.concatenate([jnp.ones((n, 1)), src], axis=1)  # [N,3]
    top = jnp.concatenate([K, P], axis=1)
    bot = jnp.concatenate([P.T, jnp.zeros((3, 3))], axis=1)
    A = jnp.concatenate([top, bot], axis=0)  # [N+3, N+3]
    rhs = jnp.concatenate([dst, jnp.zeros((3, 2))], axis=0)
    w = jnp.linalg.solve(A, rhs)
    return TPSTransform(src=src, weights=w)


def apply_tps(tps: TPSTransform, pts: jnp.ndarray) -> jnp.ndarray:
    pts = pts.astype(jnp.float32)
    n = tps.src.shape[0]
    d = _pairwise_dist(pts, tps.src)
    U = _tps_kernel(d * d)  # [M, N]
    P = jnp.concatenate([jnp.ones((pts.shape[0], 1)), pts], axis=1)
    return jnp.dot(
        jnp.concatenate([U, P], axis=1), tps.weights, precision=_P32
    )


def emd_l1_1d(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Exact EMD with L1 ground distance between 1-D histograms of equal
    mass: sum |cumsum(h1 - h2)| (the closed form the tree solver in the
    reference's emdL1.cpp generalizes to 2-D/3-D)."""
    d = h1.reshape(-1) - h2.reshape(-1)
    return jnp.sum(jnp.abs(jnp.cumsum(d[:-1])))


def emd_l1(
    h1: jnp.ndarray, h2: jnp.ndarray, epsilon: float = 0.02, iters: int = 300
) -> jnp.ndarray:
    """EMD-L1 between (1-D or 2-D) histograms (cv::EMDL1 analog,
    shape/src/emdL1.cpp).

    TPU-native solver: the reference builds an explicit tree network and
    pivots (sequential min-cost flow); here the same optimal-transport
    objective is solved by entropy-regularized Sinkhorn iteration — the
    kernel matrix applications are dense [N,N] MXU matmuls and epsilon
    is annealed small enough that the value matches the exact LP within
    a percent on histogram-sized problems. 1-D inputs use the exact
    cumsum closed form."""
    h1 = h1.astype(jnp.float32)
    h2 = h2.astype(jnp.float32)
    if h1.ndim == 1 or (h1.ndim == 2 and 1 in h1.shape):
        s1, s2 = jnp.sum(h1), jnp.sum(h2)
        return emd_l1_1d(h1 / jnp.maximum(s1, 1e-12),
                         h2 / jnp.maximum(s2, 1e-12)) * jnp.maximum(s1, 1e-12)

    hshape = h1.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(hshape[0], dtype=jnp.float32),
        jnp.arange(hshape[1], dtype=jnp.float32),
        indexing="ij",
    )
    pts = jnp.stack([yy.reshape(-1), xx.reshape(-1)], 1)  # [N,2]
    cost = jnp.sum(jnp.abs(pts[:, None, :] - pts[None, :, :]), -1)  # L1

    a = h1.reshape(-1)
    b = h2.reshape(-1)
    total = jnp.maximum(jnp.sum(a), 1e-12)
    a = a / total
    b = b / jnp.maximum(jnp.sum(b), 1e-12)
    a = jnp.maximum(a, 1e-9)
    b = jnp.maximum(b, 1e-9)

    # log-domain Sinkhorn: stable at small epsilon (the exp-domain kernel
    # exp(-cost/eps) underflows f32 once cost/eps > ~80)
    import jax

    log_a = jnp.log(a)
    log_b = jnp.log(b)
    f = jnp.zeros_like(a)
    g = jnp.zeros_like(b)

    def body(_, carry):
        f, g = carry
        f = epsilon * log_a - epsilon * jax.nn.logsumexp(
            (g[None, :] - cost) / epsilon, axis=1
        )
        g = epsilon * log_b - epsilon * jax.nn.logsumexp(
            (f[:, None] - cost) / epsilon, axis=0
        )
        return f, g

    f, g = lax.fori_loop(0, iters, body, (f, g))
    plan = jnp.exp((f[:, None] + g[None, :] - cost) / epsilon)
    return jnp.sum(plan * cost) * total


# ---------------------------------------------------------------------------
# exact EMD — transportation LP (imgproc/src/emd.cpp:1)


def emd_exact(w1, w2, cost=None, pos1=None, pos2=None, metric="l2",
              max_pivots=5000):
    """cv::EMD: exact earth mover's distance between two weighted
    signatures (imgproc/src/emd.cpp:1 — the general-cost transportation
    solver; emd_l1/Sinkhorn above are the 1-D / entropic special cases).

    Solved as Rubner's transportation LP on the framework's own exact
    simplex (optim/minimize.py solve_lp, the cv::solveLP analog):
        min sum c_ij f_ij   s.t.  f >= 0,
        sum_j f_ij <= w1_i,  sum_i f_ij <= w2_j,
        sum_ij f_ij >= min(|w1|, |w2|)
    (with c >= 0 the total-flow bound is tight at the optimum, making
    the inequalities equivalent to the balanced equality form).

    w1 [M], w2 [N] weights; either cost [M, N] or positions pos1/pos2
    with metric "l1" | "l2". Returns total_cost / max(|w1|, |w2|) (cv2.EMD's measured
    normalization).
    Host-side numpy by design: simplex pivoting is sequential control
    (SURVEY §7(f)); signatures are histogram-bin sized.
    """
    import numpy as _np

    from opencv_tpu.optim.minimize import solve_lp

    w1 = _np.asarray(w1, _np.float64).ravel()
    w2 = _np.asarray(w2, _np.float64).ravel()
    if cost is None:
        p1 = _np.asarray(pos1, _np.float64).reshape(len(w1), -1)
        p2 = _np.asarray(pos2, _np.float64).reshape(len(w2), -1)
        d = p1[:, None, :] - p2[None, :, :]
        cost = (
            _np.abs(d).sum(-1) if metric == "l1"
            else _np.sqrt((d * d).sum(-1))
        )
    else:
        cost = _np.asarray(cost, _np.float64)

    keep1 = w1 > 0
    keep2 = w2 > 0
    w1, w2 = w1[keep1], w2[keep2]
    cost = cost[_np.ix_(keep1, keep2)]
    m, n = cost.shape
    total = min(w1.sum(), w2.sum())
    # cv2 normalizes by the LARGER total mass (emd.cpp total_weight
    # after dummy balancing), not Rubner's min — measured convention
    divisor = max(w1.sum(), w2.sum())

    nv = m * n
    A = _np.zeros((m + n + 1, nv))
    for i in range(m):
        A[i, i * n:(i + 1) * n] = 1.0  # row supply
    for j in range(n):
        A[m + j, j::n] = 1.0  # column demand
    A[m + n, :] = -1.0  # -sum f <= -total
    b = _np.concatenate([w1, w2, [-total]])
    res = solve_lp(-cost.ravel(), A, b, max_pivots=max_pivots)
    f = _np.asarray(res.x, _np.float64)
    total_cost = float(cost.ravel() @ f)
    return total_cost / max(divisor, 1e-300)
