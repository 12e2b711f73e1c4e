"""Pyramidal Lucas-Kanade sparse optical flow, TPU-native.

Reference: the CPU tracker `LKTrackerInvoker::operator()` iterates per
point over a window: 2x2 normal matrix G from window gradients, a
min-eigenvalue gate, and <=30 Newton iterations on the mismatch vector
(video/src/lkpyramid.cpp:148-696, parallel_for_ over points :1371). The
CUDA version runs one thread-block per point with texture-unit bilinear
fetches (cudaoptflow/src/cuda/pyrlk.cu:368 `sparseKernel`).

TPU-native design — PATCH-CACHED separable sampling:

TPU has no texture units, so the CUDA shape (fetch 441 scattered
bilinear taps per point per iteration, pyrlk.cu:67-85) is the one thing
NOT to port. Because the LK window is a RIGID win x win grid at a
fractional offset, bilinear sampling is separable:

    window_n = Wy_n @ patch_n @ Wx_n^T

where Wy/Wx are banded interpolation matrices (two nonzeros per row)
rebuilt each iteration from the current guess.

Round-2 shipped this against the FULL level image ([N*win, H] @ [H, W]
per iteration) — MXU-pure but HBM-bound: the [N, win, H] weight tensors
cost ~170 MB of traffic per iteration at 720p. Round 3 restructures it
as a two-phase schedule:

  1. ONCE per level: extract a [N, P, P] patch around every point
     (template) / initial guess (target) — embedding-style row gather
     (the one gather XLA lowers well on TPU) + a one-hot column matmul,
     exact via a bf16 hi/lo split of the f32 image.
  2. Per Newton iteration: sample the win x win window INSIDE the
     cached patch with tiny [N, win, P] banded matrices — per-iteration
     HBM traffic drops ~40x and is level-size independent.

Guesses are clamped to stay patch-representable (±(P-win)/2-1 px of the
level's initial guess, ±13 px at P=48 — beyond LK's physical capture
range per level anyway). Levels smaller than P fall back to the dense
full-image path (tiny there by construction). The 30-iteration Newton
loop exits early once every live point converges, then compacts the
stragglers to N/4 capacity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import LKConfig
from opencv_tpu.core.pyramid import build_lk_pyramid
from opencv_tpu.core.types import masked_top_k

# Precision strategy (measured on v5e): the Newton iterations sample the
# J window in single-pass bf16 (DEFAULT) — 3x fewer MXU passes, noise
# ~0.3 intensity units -> ~0.01 px step noise, inside the convergence
# basin. One final polish step + the fixed template windows use bf16x3
# (HIGH, ~f32 quality), which restores subpixel accuracy (validated at
# median 0.000 / p90 0.001 px against the reference LK on real video).
_PS = lax.Precision.HIGH
_PS_ITER = lax.Precision.DEFAULT


def _interp_weights(
    local_ctr: jnp.ndarray, win: int, dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Banded bilinear selection matrix.

    local_ctr: [N] window-center coordinate (one axis). Returns
    [N, win, dim] where row r holds the two-tap bilinear weights selecting
    position (local_ctr - win//2 + r). Out-of-range rows are all-zero.

    dtype=bfloat16 halves the dominant VPU cost of the Newton loops (the
    [N, win, dim] weight build is ~70% of a step, r5 measured) at ~0.004
    px weight-rounding noise — inside iteration precision; the f32
    polish pass absorbs it. Keep f32 for template/polish weights.
    """
    half = win // 2
    start = local_ctr - half  # [N]
    i0 = jnp.floor(start)
    f = (start - i0)[:, None, None].astype(dtype)  # [N,1,1]
    rows = i0[:, None] + jnp.arange(win, dtype=jnp.float32)[None, :]  # [N,win]
    d = jnp.arange(dim, dtype=jnp.float32)[None, None, :]  # [1,1,dim]
    rows = rows[:, :, None]  # [N,win,1]
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    return jnp.where(d == rows, one - f, zero) + jnp.where(
        d == rows + 1.0, f, zero
    )


def _sample_windows(img, wy, wx, precision=_PS):
    """[H,W] image x [N,win,H]/[N,win,W] weights -> [N,win,win] windows.

    The first einsum is a single [(N*win), H] @ [H, W] MXU matmul."""
    tmp = jnp.einsum("nad,de->nae", wy, img, precision=precision)
    return jnp.einsum("nae,nbe->nab", tmp, wx, precision=precision)


def _sample_at(img, pts, win, precision=_PS, wdtype=jnp.float32):
    wy = _interp_weights(pts[:, 1], win, img.shape[0], wdtype)
    wx = _interp_weights(pts[:, 0], win, img.shape[1], wdtype)
    if wdtype != jnp.float32:
        img = img.astype(wdtype)
    return _sample_windows(img, wy, wx, precision)


_PATCH = 48  # target-patch edge; slack = (P - win)/2 - 1 px per level
# Newton steps per while_loop trip: the loop body is latency-bound (many
# small ops), so masked steps per trip cut per-iteration overhead with
# IDENTICAL results (converged points are masked no-ops). 5 measured
# best on the config-2 clip (r5: 233.7 f/s vs 217.3 at 3, 229.7 at 10 —
# phase 1's 10-iteration budget becomes exactly two trips).
_UNROLL = 5


def _split_hi_lo(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo == img to f32 accuracy."""
    hi = img.astype(jnp.bfloat16)
    lo = (img - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _extract_patches(
    channels: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray, p: int
) -> jnp.ndarray:
    """[C,H,W] bf16 + [N] int32 patch origins -> [C,N,p,p] f32 patches.

    Row selection is an embedding-style gather (the one gather shape XLA
    lowers efficiently on TPU); column selection is a one-hot matmul —
    exact selection, f32 accumulate.
    """
    c, h, w = channels.shape
    n = y0.shape[0]
    row_idx = (y0[:, None] + jnp.arange(p, dtype=jnp.int32)[None, :]).reshape(-1)
    # axis-0 gather on column-stacked channels (embedding-style — the one
    # gather layout the TPU lowers at near memory speed); one shared
    # one-hot column contraction for all channels
    stacked = jnp.transpose(channels, (1, 0, 2)).reshape(h, c * w)
    rows = jnp.take(stacked, row_idx, axis=0).reshape(n, p, c, w)
    cols = x0[:, None] + jnp.arange(p, dtype=jnp.int32)[None, :]  # [N,p]
    d = jax.lax.broadcasted_iota(jnp.int32, (n, p, w), 2)
    sel = (d == cols[:, :, None]).astype(jnp.bfloat16)  # [N,p,W] one-hot
    out = jnp.einsum(
        "npcw,nqw->cnpq", rows, sel, preferred_element_type=jnp.float32
    )
    return out


from typing import NamedTuple


class _Tmpl(NamedTuple):
    """Prev-side level state, computable BEFORE seeing the next frame:
    template windows, gradient normal matrix, and the min-eig gate. The
    phase split exists so batch/pairs callers can build templates for
    MANY frames with the stacked pyramid as a loop-invariant operand —
    the banded template einsum falls off XLA's fast path when its image
    operand is dynamically sliced (measured 3.3x on v5e)."""

    iw: jnp.ndarray   # [N, win, win] template intensities (HIGH)
    ix: jnp.ndarray   # [N, win, win] template x-gradients
    iy: jnp.ndarray   # [N, win, win] template y-gradients
    gxx: jnp.ndarray  # [N]
    gxy: jnp.ndarray
    gyy: jnp.ndarray
    safe_det: jnp.ndarray
    min_eig: jnp.ndarray
    ok: jnp.ndarray


# Pallas template sampling (ops/pallas/lk_sample.py): the XLA banded
# template einsum loses its fast lowering 3.3x when the image operand is
# a scan carry (DESIGN.md §7 — the measured cause of config 2's gap to
# the 3x target), and its [N, win, H] weight tensors scale with the
# level. The kernel DMAs one small tile per point instead; auto-selected
# on TPU for levels big enough that the einsum traffic dominates the
# per-point DMA latency. OPENCV_TPU_LK_PALLAS=0/1 forces it off/on (A/B).
_PALLAS_TMPL_MIN_AREA = 90_000


def _use_pallas_templates(h: int, w: int, win: int) -> bool:
    import os

    env = os.environ.get("OPENCV_TPU_LK_PALLAS")
    if env == "0":
        return False
    if win > 23:
        return False  # kernel tile budget (_T_H) caps the window
    if env == "1":
        return True
    return jax.default_backend() == "tpu" and h * w >= _PALLAS_TMPL_MIN_AREA


def _level_templates(
    prev_img, dx, dy, base_pts, cfg: LKConfig, iter_precision=_PS_ITER,
    use_pallas: bool | None = None, _pallas_interpret: bool = False,
) -> _Tmpl:
    """Shared template phase (both patch and dense iterate paths):
    intensity at HIGH (feeds the final polish), gradients at iteration
    precision (they only build G and the mismatch projections). On TPU
    the window sampling runs in the Pallas tile kernel (see
    _use_pallas_templates above); numerically that path is f32-exact
    where the einsum path rounds gradients at iteration precision —
    strictly tighter, parity-tested in tests/test_pallas_lk_sample.py."""
    win = cfg.win_size
    area = float(win * win)
    h, w = prev_img.shape
    if use_pallas is None:
        use_pallas = _use_pallas_templates(h, w, win)
    if use_pallas:
        from opencv_tpu.ops.pallas.lk_sample import sample_templates_pallas

        iw, ix, iy = sample_templates_pallas(
            prev_img, dx, dy, base_pts, win=win,
            interpret=_pallas_interpret,
        )
    else:
        wy_b = _interp_weights(base_pts[:, 1], win, h)
        wx_b = _interp_weights(base_pts[:, 0], win, w)
        iw = _sample_windows(prev_img, wy_b, wx_b, _PS)
        ix = _sample_windows(dx, wy_b, wx_b, iter_precision)
        iy = _sample_windows(dy, wy_b, wx_b, iter_precision)
    gxx = jnp.sum(ix * ix, axis=(1, 2))
    gxy = jnp.sum(ix * iy, axis=(1, 2))
    gyy = jnp.sum(iy * iy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) * 0.5 / area
    ok = min_eig > cfg.min_eig_threshold
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    return _Tmpl(iw, ix, iy, gxx, gxy, gyy, safe_det, min_eig, ok)


def _patch_origin(guess_pts, h, w):
    """Integer patch origins around the level-entry guesses + the f32
    offset (x, y) mapping patch-local coords back to image coords."""
    p = _PATCH
    jy0 = jnp.clip(jnp.round(guess_pts[:, 1]).astype(jnp.int32) - p // 2, 0, h - p)
    jx0 = jnp.clip(jnp.round(guess_pts[:, 0]).astype(jnp.int32) - p // 2, 0, w - p)
    joff = jnp.stack([jx0, jy0], axis=-1).astype(jnp.float32)
    return jy0, jx0, joff


def _patch_iterate(
    t: _Tmpl,
    next_patch,
    joff,
    guess_pts,
    next_img,
    cfg: LKConfig,
    iter_precision=_PS_ITER,
    use_pallas: bool | None = None,
    _pallas_interpret: bool = False,
):
    """Newton loop + straggler compaction + ONE dense HIGH polish, all
    J samples from the cached patch (see _track_level_patch docstring).
    On TPU the polish sample runs in the Pallas tile kernel (f32-exact,
    same zero convention) — the dense HIGH einsum on the next image is
    the single most expensive op of a clip-scan pair (r5 measured:
    1.19 ms of a 4.3 ms pair at levels 0-1)."""
    if use_pallas is None:
        use_pallas = _use_pallas_templates(
            next_img.shape[0], next_img.shape[1], cfg.win_size
        )
    win = cfg.win_size
    p = _PATCH
    n = guess_pts.shape[0]
    half = win // 2
    lo_lim = jnp.float32(half)
    hi_lim = jnp.float32(p - half - 2)
    iw, ix, iy = t.iw, t.ix, t.iy
    gxx, gxy, gyy, safe_det, ok = t.gxx, t.gxy, t.gyy, t.safe_det, t.ok

    def clamp_local(g_loc):
        return jnp.clip(g_loc, lo_lim, hi_lim)

    def sample_j(g_loc, precision, patches=next_patch):
        # bf16 weight build: see _interp_weights dtype note (iteration
        # precision is bf16 anyway; the polish is f32-exact)
        wy = _interp_weights(g_loc[:, 1], win, p, jnp.bfloat16)
        wx = _interp_weights(g_loc[:, 0], win, p, jnp.bfloat16)
        pb = patches.astype(jnp.bfloat16)
        tmp = jnp.einsum(
            "nad,nde->nae", wy, pb, precision=precision,
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "nae,nbe->nab", tmp.astype(jnp.bfloat16), wx,
            precision=precision, preferred_element_type=jnp.float32,
        )

    def newton_step(g_loc, precision, sel=None):
        if sel is None:
            jw = sample_j(clamp_local(g_loc), precision)
            diff = iw - jw
            d_x = (gyy * jnp.sum(diff * ix, (1, 2))
                   - gxy * jnp.sum(diff * iy, (1, 2))) / safe_det
            d_y = (gxx * jnp.sum(diff * iy, (1, 2))
                   - gxy * jnp.sum(diff * ix, (1, 2))) / safe_det
        else:
            jw = sample_j(clamp_local(g_loc), precision, next_patch[sel])
            diff = iw[sel] - jw
            d_x = (gyy[sel] * jnp.sum(diff * ix[sel], (1, 2))
                   - gxy[sel] * jnp.sum(diff * iy[sel], (1, 2))) / safe_det[sel]
            d_y = (gxx[sel] * jnp.sum(diff * iy[sel], (1, 2))
                   - gxy[sel] * jnp.sum(diff * ix[sel], (1, 2))) / safe_det[sel]
        return jnp.stack([d_x, d_y], axis=-1)

    g_loc0 = guess_pts - joff

    def one_step(g, conv, prev_delta, active, clamp=clamp_local, sel=None):
        """One Newton update with the reference's BOTH exit rules
        (lkpyramid.cpp:642-651): eps on |delta|^2 AND the oscillation
        break (delta ~ -prevDelta -> step back half and stop). The
        oscillation exit is what keeps sub-pixel-dithering points from
        burning the whole iteration budget."""
        delta = newton_step(g, iter_precision, sel=sel)
        osc = (jnp.abs(delta[:, 0] + prev_delta[:, 0]) < 0.01) & (
            jnp.abs(delta[:, 1] + prev_delta[:, 1]) < 0.01
        )
        do_update = (active & ~conv)[:, None]
        eff = jnp.where(osc[:, None], 0.5 * delta, delta)
        g = jnp.where(do_update, clamp(g + eff), g)
        step = jnp.sum(delta * delta, axis=-1)
        conv = conv | (step <= cfg.eps * cfg.eps) | osc
        return g, conv, delta

    big0 = jnp.full((n, 2), 1e9, jnp.float32)

    def body(carry):
        g_loc, converged, prev_d = carry
        # UNROLL x3: converged points are masked no-ops
        for _ in range(_UNROLL):
            g_loc, converged, prev_d = one_step(g_loc, converged, prev_d, ok)
        return g_loc, converged, prev_d

    phase1 = min(10, cfg.max_iters)
    trips1 = -(-phase1 // _UNROLL)

    def loop_cond1(state):
        i, (_, converged, _) = state
        return (i < trips1) & ~jnp.all(converged | ~ok)

    converged0 = jnp.zeros((n,), bool)
    _, (g_loc, converged, _) = lax.while_loop(
        loop_cond1,
        lambda s: (s[0] + 1, body(s[1])),
        (jnp.int32(0), (clamp_local(g_loc0), converged0, big0)),
    )

    # straggler compaction (see dense path): finish only the unconverged
    cap = min(n, max(n // 4, 32))
    live = ok & ~converged
    sel, keep = masked_top_k(live.astype(jnp.float32), live, cap)

    def body_sub(carry):
        g_sub, conv_sub, prev_d = carry
        for _ in range(_UNROLL):
            g_sub, conv_sub, prev_d = one_step(
                g_sub, conv_sub, prev_d, keep, sel=sel
            )
        return g_sub, conv_sub, prev_d

    trips2 = -(-(cfg.max_iters - phase1) // _UNROLL)

    def cond_sub(state):
        i, (_, conv_sub, _) = state
        return (i < trips2) & ~jnp.all(conv_sub | ~keep)

    _, (g_sub, _, _) = lax.while_loop(
        cond_sub,
        lambda s: (s[0] + 1, body_sub(s[1])),
        (jnp.int32(0), (g_loc[sel], ~live[sel] | ~keep, big0[:cap])),
    )
    g_loc = g_loc.at[sel].set(jnp.where(keep[:, None], g_sub, g_loc[sel]))

    # ONE dense high-precision pass: polish step from an exact full-image
    # J sample, and the residual from the same sample (the residual moves
    # by O(polish step) = sub-eps — cv2's err tolerance class)
    guess = g_loc + joff
    if use_pallas:
        from opencv_tpu.ops.pallas.lk_sample import sample_single_pallas

        jw = sample_single_pallas(
            next_img, guess, win=win, interpret=_pallas_interpret
        )
    else:
        jw = _sample_at(next_img, guess, win, _PS)
    diff = iw - jw
    d_x = (gyy * jnp.sum(diff * ix, (1, 2))
           - gxy * jnp.sum(diff * iy, (1, 2))) / safe_det
    d_y = (gxx * jnp.sum(diff * iy, (1, 2))
           - gxy * jnp.sum(diff * ix, (1, 2))) / safe_det
    guess = jnp.where(
        ok[:, None], guess + jnp.stack([d_x, d_y], -1), guess
    )
    residual = jnp.mean(jnp.abs(diff), axis=(1, 2))
    return guess, t.min_eig, residual


def _track_level_patch(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    base_pts: jnp.ndarray,
    guess_pts: jnp.ndarray,
    cfg: LKConfig,
    iter_precision=_PS_ITER,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Patch-cached LK level (see module docstring phase split).

    Schedule (measured on v5e): templates sampled DENSE once (iw at HIGH
    for the polish, gradients at iteration precision — they only build G
    and the mismatch projections); the Newton loop samples J from a
    single-bf16 cached patch (iteration precision is bf16 anyway, so the
    hi/lo split would buy nothing); the final polish + residual is ONE
    dense HIGH sample at the converged position, which also restores
    exact full-image semantics for any point that hit the patch clamp.
    """
    h, w = prev_img.shape
    use_pallas = _use_pallas_templates(h, w, cfg.win_size)
    t = _level_templates(
        prev_img, dx, dy, base_pts, cfg, iter_precision,
        use_pallas=use_pallas,
    )
    jy0, jx0, joff = _patch_origin(guess_pts, h, w)
    if use_pallas:
        # integer-origin extraction is frac-0 sampling in the tile
        # kernel; cast through bf16 to land bit-equal with the XLA
        # gather path (which reads a bf16 image)
        from opencv_tpu.ops.pallas.lk_sample import sample_single_pallas

        ctr = (
            jnp.stack([jx0, jy0], axis=-1).astype(jnp.float32)
            + jnp.float32(_PATCH // 2)
        )
        next_patch = (
            sample_single_pallas(next_img, ctr, win=_PATCH)
            .astype(jnp.bfloat16)
            .astype(jnp.float32)
        )
    else:
        next_patch = _extract_patches(
            next_img.astype(jnp.bfloat16)[None], jy0, jx0, _PATCH
        )[0]
    return _patch_iterate(
        t, next_patch, joff, guess_pts, next_img, cfg, iter_precision,
        use_pallas=use_pallas,
    )


def _dense_iterate(
    t: _Tmpl,
    next_img,
    guess_pts,
    cfg: LKConfig,
    iter_precision=_PS_ITER,
):
    """Newton loop + compaction + polish with dense full-image sampling
    (levels smaller than the cache patch)."""
    win = cfg.win_size
    n = guess_pts.shape[0]
    iw, ix, iy = t.iw, t.ix, t.iy
    gxx, gxy, gyy, safe_det, ok = t.gxx, t.gxy, t.gyy, t.safe_det, t.ok

    def newton_step(guess, precision):
        jw = _sample_at(next_img, guess, win, precision, jnp.bfloat16)
        diff = iw - jw  # [N,win,win]
        bx = jnp.sum(diff * ix, axis=(1, 2))
        by = jnp.sum(diff * iy, axis=(1, 2))
        # solve G d = b (2x2 closed form)
        d_x = (gyy * bx - gxy * by) / safe_det
        d_y = (gxx * by - gxy * bx) / safe_det
        return jnp.stack([d_x, d_y], axis=-1)

    def one_step(g, conv, prev_delta, active, sel=None):
        """Newton update with the reference's eps AND oscillation exits
        (lkpyramid.cpp:642-651) — see the patch path's note."""
        if sel is None:
            delta = newton_step(g, iter_precision)
        else:
            jw = _sample_at(next_img, g, win, iter_precision, jnp.bfloat16)
            diff = iw[sel] - jw
            bx = jnp.sum(diff * ix[sel], axis=(1, 2))
            by = jnp.sum(diff * iy[sel], axis=(1, 2))
            delta = jnp.stack(
                [(gyy[sel] * bx - gxy[sel] * by) / safe_det[sel],
                 (gxx[sel] * by - gxy[sel] * bx) / safe_det[sel]], axis=-1,
            )
        osc = (jnp.abs(delta[:, 0] + prev_delta[:, 0]) < 0.01) & (
            jnp.abs(delta[:, 1] + prev_delta[:, 1]) < 0.01
        )
        do_update = (active & ~conv)[:, None]
        eff = jnp.where(osc[:, None], 0.5 * delta, delta)
        g = jnp.where(do_update, g + eff, g)
        step = jnp.sum(delta * delta, axis=-1)
        conv = conv | (step <= cfg.eps * cfg.eps) | osc
        return g, conv, delta

    big0 = jnp.full((n, 2), 1e9, jnp.float32)

    def body(carry):
        guess, converged, prev_d = carry
        for _ in range(_UNROLL):  # see _UNROLL note
            guess, converged, prev_d = one_step(guess, converged, prev_d, ok)
        return guess, converged, prev_d

    # whole-batch early exit: per-point exits are masked updates; once
    # every live point has converged the rest of the budget is waste
    def loop_body(state):
        i, carry = state
        return i + 1, body(carry)

    converged0 = jnp.zeros((n,), bool)
    phase1 = min(10, cfg.max_iters)
    trips1 = -(-phase1 // _UNROLL)

    def loop_cond1(state):
        i, (_, converged, _) = state
        return (i < trips1) & ~jnp.all(converged | ~ok)

    _, (guess, converged, _) = lax.while_loop(
        loop_cond1, loop_body, (jnp.int32(0), (guess_pts, converged0, big0))
    )

    # STRAGGLER COMPACTION: on real video most points converge within
    # ~10 iterations, but a handful (occlusion, low texture) run the
    # full budget — and cv2's per-point exit pays only for those, while
    # masked whole-batch iteration pays N points x 30 trips. Compact the
    # unconverged survivors to a fixed N/4 capacity, finish ONLY those,
    # scatter back. Cost ~ 10N + 20(N/4) instead of 30N.
    cap = min(n, max(n // 4, 32))
    live = ok & ~converged
    sel, keep = masked_top_k(live.astype(jnp.float32), live, cap)

    def body_sub(carry):
        g_sub, conv_sub, prev_d = carry
        for _ in range(_UNROLL):  # see _UNROLL note
            g_sub, conv_sub, prev_d = one_step(
                g_sub, conv_sub, prev_d, keep, sel=sel
            )
        return g_sub, conv_sub, prev_d

    trips2 = -(-(cfg.max_iters - phase1) // _UNROLL)

    def cond_sub(state):
        i, (_, conv_sub, _) = state
        return (i < trips2) & ~jnp.all(conv_sub | ~keep)

    g_sub0 = guess[sel]
    conv_sub0 = ~live[sel] | ~keep
    _, (g_sub, _, _) = lax.while_loop(
        cond_sub,
        lambda s: (s[0] + 1, body_sub(s[1])),
        (jnp.int32(0), (g_sub0, conv_sub0, big0[:cap])),
    )
    # points beyond the straggler capacity keep their phase-1 estimate
    guess = guess.at[sel].set(jnp.where(keep[:, None], g_sub, guess[sel]))

    # one high-precision pass: the polish step corrects the bf16
    # iteration bias, and its pre-step sample doubles as the residual
    # (the residual moves by O(polish step) — sub-eps)
    jw = _sample_at(next_img, guess, win, _PS)
    diff = iw - jw
    bx = jnp.sum(diff * ix, axis=(1, 2))
    by = jnp.sum(diff * iy, axis=(1, 2))
    delta = jnp.stack(
        [(gyy * bx - gxy * by) / safe_det, (gxx * by - gxy * bx) / safe_det],
        axis=-1,
    )
    guess = jnp.where(ok[:, None], guess + delta, guess)
    residual = jnp.mean(jnp.abs(diff), axis=(1, 2))
    return guess, t.min_eig, residual


def _track_level_dense(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    dx: jnp.ndarray,
    dy: jnp.ndarray,
    base_pts: jnp.ndarray,  # [N,2] point positions in prev at this level
    guess_pts: jnp.ndarray,  # [N,2] current estimates in next at this level
    cfg: LKConfig,
    iter_precision=_PS_ITER,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK, dense full-image sampling (fallback for
    levels smaller than the cache patch). Returns (guess, min_eig, res)."""
    t = _level_templates(prev_img, dx, dy, base_pts, cfg, iter_precision)
    return _dense_iterate(t, next_img, guess_pts, cfg, iter_precision)


# patch-path crossover (re-measured r5 on v5e, 512 pts, IN the clip-scan
# shape that config 2 runs — the r4 standalone crossover at 350^2 was
# wrong for scans, where every dense full-image sample pays the
# scan-operand penalty): patch + Pallas tile kernel wins down to the
# ~95k-px level (257.0 f/s with levels 0-1 on patches vs 244.7 with
# level 1 dense vs 243.7 with level 2 also on patches)
_PATCH_MIN_AREA = 90_000


def _track_level(
    prev_img, next_img, dx, dy, base_pts, guess_pts, cfg,
    iter_precision=_PS_ITER,
):
    """Dispatch: patch-cached path on large levels (where dense banded
    sampling is HBM/FLOP-bound), dense full-image sampling on small ones
    (cheap there, and patches would not shrink with the level)."""
    h, w = prev_img.shape
    if min(h, w) >= _PATCH and h * w >= _PATCH_MIN_AREA:
        return _track_level_patch(
            prev_img, next_img, dx, dy, base_pts, guess_pts, cfg, iter_precision
        )
    return _track_level_dense(
        prev_img, next_img, dx, dy, base_pts, guess_pts, cfg, iter_precision
    )


def build_flow_pyramid(img: jnp.ndarray, cfg: LKConfig = LKConfig()):
    """Analog of cv::buildOpticalFlowPyramid (lkpyramid.cpp:697): levels +
    per-level Scharr derivatives, reusable across calc calls. Returns a
    tuple of (level, dx, dy) triples, finest first. The reference exposes
    exactly this reuse (withDerivatives=true); an engine tracking frame
    t-1 -> t -> t+1 builds each frame's pyramid ONCE."""
    img = img.astype(jnp.float32)
    pyr = build_lk_pyramid(img, cfg.n_levels)
    out = []
    for lvl_img in pyr.levels:
        dx, dy = imgproc.scharr_derivatives(lvl_img)
        out.append((lvl_img, dx, dy))
    return tuple(out)


def calc_optical_flow_pyr_lk_pyr(
    pyr_prev,
    pyr_next,
    pts: jnp.ndarray,
    pts_valid: jnp.ndarray | None = None,
    cfg: LKConfig = LKConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LK on prebuilt `build_flow_pyramid` outputs (pyramid-reuse path)."""
    h, w = pyr_prev[0][0].shape
    if pts_valid is None:
        pts_valid = jnp.ones((pts.shape[0],), bool)

    top = cfg.n_levels - 1
    guess = pts / (2.0 ** top)
    status = pts_valid
    err = jnp.zeros((pts.shape[0],), jnp.float32)
    for lvl in range(top, -1, -1):
        p_img, dx, dy = pyr_prev[lvl]
        n_img = pyr_next[lvl][0]
        base = pts / (2.0 ** lvl)
        guess, min_eig, err = _track_level(p_img, n_img, dx, dy, base, guess, cfg)
        if lvl > 0:
            guess = guess * 2.0
        else:
            # the min-eig gate applies at full resolution (lkpyramid.cpp
            # minEigThreshold semantics)
            status = status & (min_eig > cfg.min_eig_threshold)

    inside = (
        (guess[:, 0] >= 0.0)
        & (guess[:, 0] <= w - 1.0)
        & (guess[:, 1] >= 0.0)
        & (guess[:, 1] <= h - 1.0)
    )
    status = status & inside
    return guess, status, err


def calc_optical_flow_pyr_lk(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    pts: jnp.ndarray,
    pts_valid: jnp.ndarray | None = None,
    cfg: LKConfig = LKConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Analog of cv::calcOpticalFlowPyrLK (video/src/lkpyramid.cpp:1384).

    pts: [N,2] (x, y) in prev_img coords. Returns (new_pts [N,2],
    status [N] bool, err [N] f32 mean abs window residual).
    """
    pyr_prev = build_flow_pyramid(prev_img, cfg)
    pyr_next = build_flow_pyramid(next_img, cfg)
    return calc_optical_flow_pyr_lk_pyr(pyr_prev, pyr_next, pts, pts_valid, cfg)


def calc_optical_flow_pyr_lk_pairs(
    stacked_pyrs,
    pts: jnp.ndarray,
    pts_valid: jnp.ndarray | None = None,
    cfg: LKConfig = LKConfig(),
    phase1_chunk: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track EVERY consecutive frame pair of a clip at once — the
    batched-pairs analog of calc_optical_flow_pyr_lk_pyr for workloads
    where pairs carry no state (e.g. per-frame re-detection, the
    reference's GFTT+LK loop on clips that never keep 500 tracks).

    stacked_pyrs: vmapped build_flow_pyramid output — a tuple per level
    of (imgs [F,h,w], dx [F,h,w], dy [F,h,w]). pts [F-1, N, 2]: points
    in frame t to track into frame t+1; pts_valid [F-1, N].

    Phase-split schedule (measured on v5e): the template/gradient einsum
    falls off XLA's fast lowering when its image operand is dynamically
    sliced inside a scan (3.3x slower — the cost that made the naive
    scan-of-pairs SLOWER than the sequential chain), so templates and
    target patches for ALL pairs are built with the stacked level arrays
    as loop-invariant operands (vmap), and only the latency-cheap Newton
    loops + polish run in the per-pair scan (next-image polish reads via
    dynamic_index are ~free: +0.1 ms measured)."""
    n_pairs = pts.shape[0]
    if pts_valid is None:
        pts_valid = jnp.ones(pts.shape[:2], bool)
    h, w = stacked_pyrs[0][0].shape[1:]

    top = cfg.n_levels - 1
    guess = pts / (2.0 ** top)  # [P, N, 2]
    err = jnp.zeros(pts.shape[:2], jnp.float32)
    min_eig0 = None
    for lvl in range(top, -1, -1):
        imgs, dxs, dys = stacked_pyrs[lvl]
        prev_imgs = imgs[:-1]
        prev_dx = dxs[:-1]
        prev_dy = dys[:-1]
        next_imgs = imgs[1:]
        base = pts / (2.0 ** lvl)
        lh, lw = imgs.shape[1:]

        # ---- phase 1 (vmapped, constant operands): templates + patches.
        # Chunked with STATIC slices: full-width vmap materializes the
        # [P, N, win, H] banded weight tensors for every pair at once
        # (measured 10x the sequential HBM traffic); static chunk slices
        # stay constant-foldable (no dynamic-slice fast-path loss) while
        # bounding the transient weight working set.
        ck = phase1_chunk or max(1, min(n_pairs, 8))
        use_patch = min(lh, lw) >= _PATCH and lh * lw >= _PATCH_MIN_AREA

        def phase1(c0, c1):
            # use_pallas=False: the tile kernel can't be vmapped (one
            # pallas_call per pair would serialize anyway), and phase 1's
            # einsum operands are loop-invariant here — the exact case
            # where the XLA path is already on its fast lowering
            t = jax.vmap(
                lambda p_im, p_dx, p_dy, b: _level_templates(
                    p_im, p_dx, p_dy, b, cfg, use_pallas=False
                )
            )(prev_imgs[c0:c1], prev_dx[c0:c1], prev_dy[c0:c1], base[c0:c1])
            if not use_patch:
                return t, None, None
            jy0, jx0, joff_c = jax.vmap(
                lambda g: _patch_origin(g, lh, lw)
            )(guess[c0:c1])
            pat = jax.vmap(
                lambda im, y0, x0: _extract_patches(
                    im.astype(jnp.bfloat16)[None], y0, x0, _PATCH
                )[0]
            )(next_imgs[c0:c1], jy0, jx0)
            return t, pat, joff_c

        parts = [
            phase1(c0, min(c0 + ck, n_pairs))
            for c0 in range(0, n_pairs, ck)
        ]
        tmpl = jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *[p[0] for p in parts]
        )
        if use_patch:
            patches = jnp.concatenate([p[1] for p in parts])
            joff = jnp.concatenate([p[2] for p in parts])

        # ---- phase 2 (scan over pairs): latency-cheap iteration loops
        if use_patch:
            def step(carry, xs):
                t_i, patch, joff_i, g_in, idx = xs
                nxt = lax.dynamic_index_in_dim(
                    next_imgs, idx, 0, keepdims=False
                )
                g, me, res = _patch_iterate(
                    t_i, patch, joff_i, g_in, nxt, cfg
                )
                return carry, (g, me, res)

            _, (guess, me, res) = lax.scan(
                step, None,
                (tmpl, patches, joff, guess, jnp.arange(n_pairs)),
            )
        else:
            def step(carry, xs):
                t_i, g_in, idx = xs
                nxt = lax.dynamic_index_in_dim(
                    next_imgs, idx, 0, keepdims=False
                )
                g, me, res = _dense_iterate(t_i, nxt, g_in, cfg)
                return carry, (g, me, res)

            _, (guess, me, res) = lax.scan(
                step, None, (tmpl, guess, jnp.arange(n_pairs))
            )
        err = res
        if lvl > 0:
            guess = guess * 2.0
        else:
            min_eig0 = me

    status = pts_valid & (min_eig0 > cfg.min_eig_threshold)
    inside = (
        (guess[..., 0] >= 0.0)
        & (guess[..., 0] <= w - 1.0)
        & (guess[..., 1] >= 0.0)
        & (guess[..., 1] <= h - 1.0)
    )
    return guess, status & inside, err
