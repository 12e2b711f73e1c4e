"""cudalegacy breadth: GMG/FGD background models, frame interpolation,
grid graph cuts (gold: scipy maximum_flow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import bgsegm, graphcut, interpolate


def test_gmg_detects_intruder(rng):
    h, w = 32, 40
    bg = rng.uniform(80, 120, (h, w)).astype(np.float32)
    st = bgsegm.gmg_init(h, w)
    for _ in range(30):  # training
        frame = bg + rng.normal(0, 2, (h, w)).astype(np.float32)
        st, fg = bgsegm.gmg_apply(st, jnp.asarray(frame))
        assert not bool(np.asarray(fg).any())
    frame = bg + rng.normal(0, 2, (h, w)).astype(np.float32)
    frame[10:20, 12:22] = 240.0
    st, fg = bgsegm.gmg_apply(st, jnp.asarray(frame))
    fg = np.asarray(fg)
    assert fg[12:18, 14:20].mean() > 0.9
    assert fg[:8].mean() < 0.05


def test_fgd_detects_change(rng):
    h, w = 32, 40
    bg = rng.uniform(80, 120, (h, w)).astype(np.float32)
    st = bgsegm.fgd_init(jnp.asarray(bg))
    for _ in range(10):
        frame = bg + rng.normal(0, 2, (h, w)).astype(np.float32)
        st, fg = bgsegm.fgd_apply(st, jnp.asarray(frame))
    frame = bg.copy()
    frame[5:15, 5:15] = 220.0
    st, fg = bgsegm.fgd_apply(st, jnp.asarray(frame))
    fg = np.asarray(fg)
    assert fg[6:14, 6:14].mean() > 0.9
    assert fg[20:, 20:].mean() < 0.05


def test_interpolate_frames_translation(rng):
    from opencv_tpu.core import imgproc

    img = np.asarray(imgproc.gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, (64, 80)).astype(np.float32)), 7, 2.0
    ))
    f0 = img
    f1 = np.roll(img, 4, axis=1)
    mid = np.asarray(interpolate.interpolate_frames(
        jnp.asarray(f0), jnp.asarray(f1), t=0.5
    ))
    want = np.roll(img, 2, axis=1)
    err = np.abs(mid[10:-10, 10:-10] - want[10:-10, 10:-10]).mean()
    base = np.abs(f0[10:-10, 10:-10] - want[10:-10, 10:-10]).mean()
    assert err < 0.35 * base, (err, base)


def _mincut_gold(src, snk, edges):
    """scipy maximum_flow on the same grid graph."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    h, w = src.shape
    n = h * w
    S, T = n, n + 1
    rows, cols, caps = [], [], []
    scale = 1000.0

    def nid(y, x):
        return y * w + x

    for y in range(h):
        for x in range(w):
            i = nid(y, x)
            if src[y, x] > 0:
                rows.append(S); cols.append(i); caps.append(src[y, x])
            if snk[y, x] > 0:
                rows.append(i); cols.append(T); caps.append(snk[y, x])
            for k, (dy, dx) in enumerate([(-1, 0), (1, 0), (0, -1), (0, 1)]):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and edges[k, y, x] > 0:
                    rows.append(i); cols.append(nid(ny, nx))
                    caps.append(edges[k, y, x])
    caps = np.round(np.asarray(caps) * scale).astype(np.int64)
    g = csr_matrix((caps, (rows, cols)), shape=(n + 2, n + 2))
    res = maximum_flow(g, S, T)
    return res.flow_value / scale


def test_min_cut_matches_scipy_flow_value(rng):
    h, w = 6, 7
    src = rng.uniform(0, 3, (h, w)).astype(np.float32)
    snk = rng.uniform(0, 3, (h, w)).astype(np.float32)
    # sparsify terminals so the cut is nontrivial
    src[src < 1.5] = 0
    snk[snk < 1.5] = 0
    edges = rng.uniform(0.1, 1.0, (4, h, w)).astype(np.float32)
    # symmetrize: cap toward a neighbour equals its cap back
    for k, (dy, dx) in enumerate([(-1, 0), (1, 0), (0, -1), (0, 1)]):
        ko = [1, 0, 3, 2][k]
        back = np.roll(edges[ko], (-dy, -dx), (0, 1))
        edges[k] = 0.5 * (edges[k] + back)

    labels = np.asarray(graphcut.min_cut_grid(
        jnp.asarray(src), jnp.asarray(snk), jnp.asarray(edges)
    ))
    # cut value implied by the labels
    cut = float(np.sum(snk[labels]) + np.sum(src[~labels]))
    for k, (dy, dx) in enumerate([(-1, 0), (1, 0), (0, -1), (0, 1)]):
        nb = np.roll(labels, (-dy, -dx), (0, 1)).copy()
        ok = np.ones((h, w), bool)
        if dy == -1: ok[0] = False
        if dy == 1: ok[-1] = False
        if dx == -1: ok[:, 0] = False
        if dx == 1: ok[:, -1] = False
        cut += float(np.sum(edges[k][labels & ~nb & ok]))
    gold = _mincut_gold(src, snk, edges)
    assert abs(cut - gold) / max(gold, 1e-6) < 0.02, (cut, gold)


def test_graphcut_seam_prefers_agreement_column(rng):
    h, w = 24, 30
    a = rng.uniform(0, 255, (h, w)).astype(np.float32)
    b = rng.uniform(0, 255, (h, w)).astype(np.float32)
    b[:, 14:17] = a[:, 14:17]  # images agree on columns 14-16
    m0 = np.zeros((h, w), bool); m0[:, :24] = True
    m1 = np.zeros((h, w), bool); m1[:, 8:] = True
    n0, n1 = graphcut.seam_find_graphcut(
        jnp.asarray(a), jnp.asarray(m0), jnp.asarray(b), jnp.asarray(m1)
    )
    n0, n1 = np.asarray(n0), np.asarray(n1)
    assert not (n0 & n1).any()
    assert (n0 | n1).sum() == (m0 | m1).sum()
    # the seam (transition) should fall inside the agreement band
    trans_cols = np.where(n0.any(0) & n1.any(0))[0]
    assert len(trans_cols) == 0 or (
        (trans_cols >= 13).all() and (trans_cols <= 17).all()
    )
