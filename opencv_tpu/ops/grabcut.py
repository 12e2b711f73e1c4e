"""GrabCut interactive foreground extraction.

Reference: modules/imgproc/src/grabcut.cpp:1 — per-class 5-component
full-covariance GMMs over RGB, 8-connected contrast-sensitive N-links
(beta from the mean squared neighbour difference, grabcut.cpp:236-274;
gamma=50, diagonals gamma/sqrt(2), :281), and an assign/learn/cut
iteration driven by an s-t min-cut.

TPU-first shape: all pixel-level stages are dense masked tensor ops —
component assignment is an argmax over [H, W, K] log-likelihoods, GMM
learning is masked moment sums (einsum over one-hot responsibilities),
and the min-cut reuses the parallel push-relabel grid solver
(ops/graphcut.py) at 8-connectivity. The reference's per-pixel C++
loops and incremental GMM accumulators have no analog here; only the
outer iterate count is host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opencv_tpu.ops.graphcut import _DIRS8, _shift, min_cut_grid

# mask values (cv2 GrabCutClasses)
GC_BGD, GC_FGD, GC_PR_BGD, GC_PR_FGD = 0, 1, 2, 3

_K = 5  # GMM components per class (grabcut.cpp GMM::componentsCount)
_GAMMA = 50.0
_LAMBDA = 9 * _GAMMA


def _calc_beta(chw):
    """beta = 1/(2 * mean ||c_i - c_j||^2) over the 4 unique edge types
    (grabcut.cpp:236-274, incl. the exact edge-count denominator).
    chw: [3, H, W]."""
    h, w = chw.shape[1:]
    total = jnp.float32(0.0)
    for dy, dx in ((0, -1), (-1, -1), (-1, 0), (-1, 1)):
        nb = _shift(chw, dy, dx, 0.0)
        valid_y = (jnp.arange(h) + dy >= 0) & (jnp.arange(h) + dy < h)
        valid_x = (jnp.arange(w) + dx >= 0) & (jnp.arange(w) + dx < w)
        m = (valid_y[:, None] & valid_x[None, :]).astype(chw.dtype)
        total = total + jnp.sum(m[None] * (chw - nb) ** 2)
    n_edges = 4 * w * h - 3 * w - 3 * h + 2
    beta = total / n_edges
    return jnp.where(beta <= 1e-12, 0.0, 1.0 / (2.0 * beta))


def _n_weights(chw, beta):
    """[8, H, W] contrast-sensitive N-link capacities toward _DIRS8."""
    caps = []
    for dy, dx in _DIRS8:
        g = _GAMMA / np.sqrt(2.0) if (dy != 0 and dx != 0) else _GAMMA
        nb = _shift(chw, dy, dx, 1e9)  # huge diff outside -> ~0 capacity
        d2 = jnp.sum((chw - nb) ** 2, axis=0)
        caps.append(g * jnp.exp(-beta * d2))
    return jnp.stack(caps)


def _kmeans(x, w, k, iters=10, seed=0):
    """Weighted k-means on [N, 3] with binary weights w (host-seeded
    deterministic init from the weighted quantiles of luminance)."""
    lum = x @ jnp.asarray([0.299, 0.587, 0.114])
    order = jnp.argsort(jnp.where(w > 0, lum, jnp.inf))
    n_valid = jnp.maximum(jnp.sum(w > 0).astype(jnp.int32), 1)
    picks = (jnp.arange(k) * n_valid) // k + n_valid // (2 * k)
    centers = x[order[picks]]

    def step(centers, _):
        d = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=1)
        oh = jax.nn.one_hot(assign, k) * w[:, None]
        cnt = jnp.maximum(oh.sum(0), 1e-6)
        centers = (oh.T @ x) / cnt[:, None]
        return centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    d = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
    return jnp.argmin(d, axis=1)


class _GMM:
    """Per-class GMM parameters fitted from masked assignments."""

    def __init__(self, pi, mean, inv_cov, log_det):
        self.pi = pi            # [K]
        self.mean = mean        # [K,3]
        self.inv_cov = inv_cov  # [K,3,3]
        self.log_det = log_det  # [K]

    @staticmethod
    def fit(x, w, comp):
        """x [N,3], w [N] binary, comp [N] in [0,K)."""
        oh = jax.nn.one_hot(comp, _K) * w[:, None]  # [N,K]
        cnt = oh.sum(0)  # [K]
        safe = jnp.maximum(cnt, 1e-6)
        mean = (oh.T @ x) / safe[:, None]
        xc = x[:, None, :] - mean[None]  # [N,K,3]
        cov = jnp.einsum("nk,nki,nkj->kij", oh, xc, xc) / safe[:, None, None]
        # reference regularizes near-singular covs with 0.01 on the
        # diagonal (grabcut.cpp GMM::endLearning variance floor)
        cov = cov + jnp.eye(3) * 0.01
        inv_cov = jnp.linalg.inv(cov)
        _, log_det = jnp.linalg.slogdet(cov)
        pi = cnt / jnp.maximum(cnt.sum(), 1e-6)
        return _GMM(pi, mean, inv_cov, log_det)

    def comp_log_prob(self, x):
        """[N, K] per-component log N(x; mu_k, Sigma_k) + log pi_k."""
        xc = x[:, None, :] - self.mean[None]  # [N,K,3]
        maha = jnp.einsum("nki,kij,nkj->nk", xc, self.inv_cov, xc)
        return (
            jnp.log(jnp.maximum(self.pi, 1e-12))[None]
            - 0.5 * (maha + self.log_det[None] + 3 * jnp.log(2 * jnp.pi))
        )

    def neg_log_prob(self, x):
        """-log sum_k pi_k N_k(x) — the grabcut data term."""
        return -jax.nn.logsumexp(self.comp_log_prob(x), axis=1)


def grab_cut(img, mask=None, rect=None, iter_count=5):
    """cv2.grabCut semantics: img [H,W,3] f32 (0..255); either `rect`
    (x, y, w, h — inside = GC_PR_FGD, outside = GC_BGD) or an explicit
    `mask` of GC_* values. Returns the refined mask (same coding)."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[:2]
    if mask is None:
        assert rect is not None
        x0, y0, rw, rh = rect
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        inside = (xx >= x0) & (xx < x0 + rw) & (yy >= y0) & (yy < y0 + rh)
        mask = jnp.where(inside, GC_PR_FGD, GC_BGD).astype(jnp.int32)
    else:
        mask = jnp.asarray(mask, jnp.int32)

    x = img.reshape(-1, 3)
    chw = jnp.transpose(img, (2, 0, 1))
    beta = _calc_beta(chw)
    nw = _n_weights(chw, beta)

    fg = ((mask == GC_FGD) | (mask == GC_PR_FGD)).reshape(-1)
    bg = ~fg
    comp_fg = _kmeans(x, fg.astype(jnp.float32), _K)
    comp_bg = _kmeans(x, bg.astype(jnp.float32), _K)

    for _ in range(iter_count):
        gmm_fg = _GMM.fit(x, fg.astype(jnp.float32), comp_fg)
        gmm_bg = _GMM.fit(x, bg.astype(jnp.float32), comp_bg)

        # t-links (grabcut.cpp construct graph): PR pixels get the GMM
        # data terms; hard pixels get lambda walls
        d_fg = gmm_fg.neg_log_prob(x).reshape(h, w)
        d_bg = gmm_bg.neg_log_prob(x).reshape(h, w)
        hard_bgd = mask == GC_BGD
        hard_fgd = mask == GC_FGD
        src = jnp.where(hard_bgd, 0.0, jnp.where(hard_fgd, _LAMBDA, d_bg))
        snk = jnp.where(hard_bgd, _LAMBDA, jnp.where(hard_fgd, 0.0, d_fg))

        labels = min_cut_grid(src, snk, nw)  # True = source = foreground
        mask = jnp.where(
            hard_bgd | hard_fgd,
            mask,
            jnp.where(labels, GC_PR_FGD, GC_PR_BGD),
        )

        fg = ((mask == GC_FGD) | (mask == GC_PR_FGD)).reshape(-1)
        bg = ~fg
        # re-assign components under the refreshed masks (assignGMMs)
        comp_fg = jnp.argmax(gmm_fg.comp_log_prob(x), axis=1)
        comp_bg = jnp.argmax(gmm_bg.comp_log_prob(x), axis=1)

    return mask
