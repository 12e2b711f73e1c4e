"""Computational photography (reference `photo` module analogs):
fast non-local-means denoising (photo/src/denoising.cpp +
fast_nlmeans_denoising_invoker.hpp, CUDA denoising.cuda.cpp), diffusion
inpainting (photo/src/inpaint.cpp role), and HDR exposure fusion
(photo/src/merge.cpp MergeMertens).

TPU-native NLM: for every search offset the patch SSD is one box filter
of a squared-difference image, so the whole weight field is
|search_window| fused box-filter passes — no per-pixel patch loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc


def nl_means_denoise(
    img: jnp.ndarray,
    h: float = 10.0,
    patch_size: int = 7,
    search_size: int = 21,
) -> jnp.ndarray:
    """Grayscale fast NLM (cv::fastNlMeansDenoising analog)."""
    img = img.astype(jnp.float32)
    r = search_size // 2
    acc = jnp.zeros_like(img)
    wsum = jnp.zeros_like(img)
    h2 = h * h * patch_size * patch_size
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = imgproc.shift2d(img, dy, dx, fill=0.0)
            d2 = (img - shifted) ** 2
            ssd = imgproc.box_sum_integral(d2, patch_size)
            w = jnp.exp(-ssd / h2)
            # do not let out-of-image shifts vote
            valid = imgproc.shift2d(jnp.ones_like(img), dy, dx, fill=0.0)
            w = w * valid
            acc = acc + w * shifted
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-9)


def inpaint_diffusion(
    img: jnp.ndarray, mask: jnp.ndarray, iters: int = 300
) -> jnp.ndarray:
    """Fill masked pixels by harmonic (Laplace) diffusion from the
    boundary (the role of cv::inpaint; Navier-Stokes/Telea are
    different PDEs with the same contract)."""
    img = img.astype(jnp.float32)
    known = ~mask
    init = jnp.where(known, img, jnp.mean(img * known) / jnp.maximum(jnp.mean(known), 1e-9))

    def body(_, x):
        avg = 0.25 * (
            imgproc.shift2d(x, -1, 0, 0.0) + imgproc.shift2d(x, 1, 0, 0.0)
            + imgproc.shift2d(x, 0, -1, 0.0) + imgproc.shift2d(x, 0, 1, 0.0)
        )
        return jnp.where(known, img, avg)

    return lax.fori_loop(0, iters, body, init)


def merge_mertens(
    images: jnp.ndarray,
    contrast_w: float = 1.0,
    saturation_w: float = 1.0,
    exposure_w: float = 1.0,
) -> jnp.ndarray:
    """Exposure fusion (MergeMertens analog) for grayscale stacks
    [E, H, W] in [0, 255]; returns fused [H, W] in [0, 1]-ish scale.
    Single-scale weight blend (the reference blends per pyramid level —
    multi-scale lands with the blender work)."""
    x = images.astype(jnp.float32) / 255.0
    # contrast: |laplacian|
    lap = jnp.abs(
        4.0 * x
        - imgproc.shift2d(x, 0, 1, 0.0) - imgproc.shift2d(x, 0, -1, 0.0)
        - imgproc.shift2d(x, 1, 0, 0.0) - imgproc.shift2d(x, -1, 0, 0.0)
    )
    wexp = jnp.exp(-((x - 0.5) ** 2) / (2 * 0.2 ** 2))
    w = (lap + 1e-6) ** contrast_w * wexp ** exposure_w
    w = w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-9)
    return jnp.sum(w * x, axis=0)


def seamless_clone(
    src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray, iters: int = 400
) -> jnp.ndarray:
    """Poisson seamless cloning (cv::seamlessClone NORMAL_CLONE analog,
    photo/src/seamless_cloning.cpp): solve the Poisson equation inside
    the mask with the source's gradient field and the destination's
    boundary, by Jacobi iteration (fixed-trip, fused stencils)."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    lap_src = (
        4.0 * src
        - imgproc.shift2d(src, -1, 0, 0.0) - imgproc.shift2d(src, 1, 0, 0.0)
        - imgproc.shift2d(src, 0, -1, 0.0) - imgproc.shift2d(src, 0, 1, 0.0)
    )
    inside = mask

    def body(_, x):
        nb = (
            imgproc.shift2d(x, -1, 0, 0.0) + imgproc.shift2d(x, 1, 0, 0.0)
            + imgproc.shift2d(x, 0, -1, 0.0) + imgproc.shift2d(x, 0, 1, 0.0)
        )
        upd = 0.25 * (nb + lap_src)
        return jnp.where(inside, upd, dst)

    return lax.fori_loop(0, iters, body, jnp.where(inside, src, dst))


# ------------------------------------------------------------- HDR ---

def calibrate_debevec(
    images: jnp.ndarray,
    exposure_times: jnp.ndarray,
    n_samples: int = 70,
    lam: float = 10.0,
    seed: int = 0,
) -> jnp.ndarray:
    """Recover the log camera response g[256] from an exposure stack
    (CalibrateDebevec, photo/src/calibrate.cpp): solve the Debevec-Malik
    linear system g(Z_ij) - ln E_i = ln t_j with a second-difference
    smoothness prior and the hat weighting, g(128) = 0 gauge.

    images: u8-valued f32 [S, H, W]; exposure_times [S] seconds.
    One dense lstsq on the MXU replaces the reference's SVD loop.
    """
    import jax as _jax

    s, h, w = images.shape
    key = _jax.random.PRNGKey(seed)
    idx = _jax.random.choice(key, h * w, (n_samples,), replace=False)
    z = images.reshape(s, -1)[:, idx].astype(jnp.int32)  # [S, P]
    z = jnp.clip(z, 0, 255)

    n_unk = 256 + n_samples
    hat = jnp.minimum(jnp.arange(256), 255 - jnp.arange(256)).astype(
        jnp.float32
    ) + 1.0

    rows = []
    rhs = []
    wts = []
    lnt = jnp.log(exposure_times.astype(jnp.float32))
    for j in range(s):
        for_p = jnp.arange(n_samples)
        a = jnp.zeros((n_samples, n_unk), jnp.float32)
        a = a.at[for_p, z[j]].set(1.0)
        a = a.at[for_p, 256 + for_p].add(-1.0)
        rows.append(a)
        rhs.append(jnp.full((n_samples,), lnt[j]))
        wts.append(hat[z[j]])
    # smoothness rows: lam * w(k) * (g[k-1] - 2 g[k] + g[k+1]) = 0
    ks = jnp.arange(1, 255)
    sm = jnp.zeros((254, n_unk), jnp.float32)
    sm = sm.at[jnp.arange(254), ks - 1].set(1.0)
    sm = sm.at[jnp.arange(254), ks].set(-2.0)
    sm = sm.at[jnp.arange(254), ks + 1].set(1.0)
    rows.append(sm)
    rhs.append(jnp.zeros((254,)))
    wts.append(lam * hat[ks])
    # gauge: g[128] = 0
    gauge = jnp.zeros((1, n_unk), jnp.float32).at[0, 128].set(1.0)
    rows.append(gauge)
    rhs.append(jnp.zeros((1,)))
    wts.append(jnp.full((1,), 100.0))

    A = jnp.concatenate(rows, 0)
    b = jnp.concatenate(rhs, 0)
    wv = jnp.sqrt(jnp.concatenate(wts, 0))
    sol, *_ = jnp.linalg.lstsq(A * wv[:, None], b * wv)
    return sol[:256]  # log response g


def calibrate_robertson(
    images: jnp.ndarray,
    exposure_times: jnp.ndarray,
    iters: int = 8,
) -> jnp.ndarray:
    """Robertson response recovery (CalibrateRobertson,
    photo/src/calibrate.cpp): alternate E-step (radiance from current
    response) and M-step (response bin means), normalized at g[128]."""
    s = images.shape[0]
    z = jnp.clip(images.reshape(s, -1).astype(jnp.int32), 0, 255)  # [S, P]
    t = exposure_times.astype(jnp.float32)[:, None]
    hat = (
        jnp.minimum(jnp.arange(256), 255 - jnp.arange(256)).astype(jnp.float32)
        + 1.0
    )
    g = jnp.arange(256, dtype=jnp.float32) / 128.0  # linear init

    def body(_, g):
        wz = hat[z]
        gz = g[z]
        e = jnp.sum(wz * gz * t, 0) / jnp.maximum(jnp.sum(wz * t * t, 0), 1e-9)
        target = e[None, :] * t  # expected linear value per (s, p)
        num = jnp.zeros((256,)).at[z.reshape(-1)].add(target.reshape(-1))
        den = jnp.zeros((256,)).at[z.reshape(-1)].add(1.0)
        g_new = num / jnp.maximum(den, 1e-9)
        # monotone fill for empty bins: carry forward via cummax
        g_new = jnp.where(den > 0, g_new, 0.0)
        g_new = jax.lax.cummax(g_new)
        return g_new / jnp.maximum(g_new[128], 1e-9)

    return lax.fori_loop(0, iters, body, g)


def merge_debevec(
    images: jnp.ndarray,
    exposure_times: jnp.ndarray,
    log_response: jnp.ndarray,
) -> jnp.ndarray:
    """HDR radiance map from the stack + log response (MergeDebevec,
    photo/src/merge.cpp): ln E = sum w(z)(g(z) - ln t) / sum w(z)."""
    z = jnp.clip(images.astype(jnp.int32), 0, 255)  # [S, H, W]
    hat = (
        jnp.minimum(jnp.arange(256), 255 - jnp.arange(256)).astype(jnp.float32)
        + 1.0
    )
    wz = hat[z]
    lnt = jnp.log(exposure_times.astype(jnp.float32))[:, None, None]
    ln_e = jnp.sum(wz * (log_response[z] - lnt), 0) / jnp.maximum(
        jnp.sum(wz, 0), 1e-9
    )
    return jnp.exp(ln_e)


def tonemap_reinhard(hdr: jnp.ndarray, gamma: float = 2.2, intensity: float = 0.18) -> jnp.ndarray:
    """Simple global Reinhard tonemap (TonemapReinhard analog) to u8 range."""
    lw = jnp.exp(jnp.mean(jnp.log(jnp.maximum(hdr, 1e-6))))
    scaled = intensity * hdr / jnp.maximum(lw, 1e-9)
    ldr = scaled / (1.0 + scaled)
    return 255.0 * jnp.clip(ldr, 0.0, 1.0) ** (1.0 / gamma)


def align_mtb(
    images: jnp.ndarray, max_shift: int = 16
) -> jnp.ndarray:
    """Median-threshold-bitmap alignment (AlignMTB, photo/src/align.cpp):
    translate every frame onto the first by maximizing MTB agreement
    over a coarse-to-fine shift pyramid.

    TPU-native: at each pyramid level ALL 9 candidate shifts are scored
    at once (stacked XOR-popcount reduces); no per-candidate branching.
    Returns the aligned stack [S, H, W]."""
    from opencv_tpu.core import pyramid as pyr_mod

    s, h, w = images.shape
    n_levels = max(1, int(jnp.ceil(jnp.log2(jnp.float32(max_shift)))))

    def mtb(img):
        med = jnp.median(img.reshape(-1))
        return img > med, jnp.abs(img - med) > 4.0  # bitmap + exclusion

    ref = images[0]
    out = [ref]
    for si in range(1, s):
        mov = images[si]
        shift = jnp.zeros((2,), jnp.int32)  # (dy, dx)
        for lvl in range(n_levels - 1, -1, -1):
            scale = 2 ** lvl
            rh, rw = max(h // scale, 8), max(w // scale, 8)
            r_s = imgproc.resize_bilinear(ref, rh, rw)
            m_s = imgproc.resize_bilinear(mov, rh, rw)
            rb, rm = mtb(r_s)
            mb0, mm0 = mtb(m_s)
            shift = shift * 2
            # finest level searches a wider window: the coarse levels'
            # bitmaps on downsampled images are only ~1px accurate
            radius = 2 if lvl == 0 else 1
            best_err = None
            best = shift
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    cand = shift + jnp.asarray([dy, dx])
                    # zero-fill shift + validity: wrapped borders must
                    # not vote (align.cpp shifts with borderConstant)
                    bb = jnp.roll(mb0, (cand[0], cand[1]), (0, 1))
                    bm = jnp.roll(mm0, (cand[0], cand[1]), (0, 1))
                    yy = lax.broadcasted_iota(jnp.int32, (rh, rw), 0)
                    xx = lax.broadcasted_iota(jnp.int32, (rh, rw), 1)
                    ok = (
                        (yy - cand[0] >= 0) & (yy - cand[0] < rh)
                        & (xx - cand[1] >= 0) & (xx - cand[1] < rw)
                    )
                    diff = (rb ^ bb) & rm & bm & ok
                    # +1/+1: among zero-disagreement candidates prefer
                    # the one with the most eligible (voting) overlap
                    err = (jnp.sum(diff) + 1.0) / (
                        jnp.sum(rm & bm & ok) + 1.0
                    )
                    if best_err is None:
                        best_err, best = err, cand
                    else:
                        take = err < best_err
                        best_err = jnp.where(take, err, best_err)
                        best = jnp.where(take, cand, best)
            shift = best
        out.append(jnp.roll(mov, (shift[0], shift[1]), (0, 1)))
    return jnp.stack(out)


# --------------------------------------------------------------------------
# TV-L1 denoising (photo/src/denoise_tvl1.cpp:1)
# --------------------------------------------------------------------------


def denoise_tvl1(
    observations: jnp.ndarray | list,
    lam: float = 1.0,
    n_iters: int = 30,
) -> jnp.ndarray:
    """cv::denoise_TVL1 analog: primal-dual (Chambolle-Pock) minimization
    of  TV(x) + lam * sum_i |x - f_i|  over one or more noisy observations
    (reference photo/src/denoise_tvl1.cpp:1 uses the same primal-dual
    scheme). Input/output in [0, 255] float; fully on-device lax.fori_loop.
    """
    if isinstance(observations, (list, tuple)):
        obs = jnp.stack([jnp.asarray(o, jnp.float32) for o in observations])
    else:
        obs = jnp.asarray(observations, jnp.float32)
        if obs.ndim == 2:
            obs = obs[None]
    k = obs.shape[0]
    x0 = obs[0] / 255.0
    f = obs / 255.0

    tau = 0.25
    sigma = 0.25
    theta = 1.0
    clip = lam * tau

    def grad(u):
        gx = jnp.diff(u, axis=1, append=u[:, -1:])
        gy = jnp.diff(u, axis=0, append=u[-1:, :])
        return gx, gy

    def div(px, py):
        dx = px - jnp.concatenate([jnp.zeros_like(px[:, :1]), px[:, :-1]], 1)
        dy = py - jnp.concatenate([jnp.zeros_like(py[:1, :]), py[:-1, :]], 0)
        return dx + dy

    def body(_, state):
        x, xbar, px, py = state
        gx, gy = grad(xbar)
        px = px + sigma * gx
        py = py + sigma * gy
        mag = jnp.maximum(1.0, jnp.sqrt(px * px + py * py))
        px = px / mag
        py = py / mag
        v = x + tau * div(px, py)
        if k == 1:
            # exact single-observation prox: soft-shrink toward f
            d = v - f[0]
            x_new = f[0] + jnp.sign(d) * jnp.maximum(jnp.abs(d) - clip, 0.0)
        else:
            # exact multi-observation prox of clip*sum_i |x - f_i| by
            # candidate enumeration: the minimizer is either inside a
            # sorted-f segment (v - clip*(2j - k)) or AT an observation
            cands = jnp.stack(
                [v - clip * (2 * j - k) for j in range(k + 1)]
                + [f[i] for i in range(k)]
            )  # [2k+1, H, W]
            obj = 0.5 * (cands - v) ** 2 + clip * jnp.sum(
                jnp.abs(cands[:, None] - f[None]), axis=1
            )
            best = jnp.argmin(obj, axis=0)
            x_new = jnp.take_along_axis(cands, best[None], axis=0)[0]
        xbar = x_new + theta * (x_new - x)
        return x_new, xbar, px, py

    zero = jnp.zeros_like(x0)
    x, _, _, _ = lax.fori_loop(0, n_iters, body, (x0, x0, zero, zero))
    return jnp.clip(x * 255.0, 0.0, 255.0)


# --------------------------------------------------------------------------
# TELEA-style inpainting by distance-band marching (photo/src/inpaint.cpp:1)
# --------------------------------------------------------------------------


def inpaint_telea(
    img: jnp.ndarray, mask: jnp.ndarray, radius: float = 3.0
) -> jnp.ndarray:
    """cv::inpaint INPAINT_TELEA analog. The reference marches pixels in
    increasing distance-to-boundary order with a priority queue (Telea's
    FMM, photo/src/inpaint.cpp:1) — inherently sequential. TPU-native
    re-expression: process whole DISTANCE BANDS at once. Band k fills
    every pixel whose boundary distance is in (k-1, k], estimating from
    already-known neighbors inside `radius`, weighted by the same
    direction x geometric-distance x level factors Telea uses. The number
    of device passes is the inpaint region's inradius, and each pass is
    fused elementwise + box-window work.
    """
    from opencv_tpu.ops.distance import distance_transform

    img = jnp.asarray(img, jnp.float32)
    mask = jnp.asarray(mask) != 0
    dist = distance_transform(mask)  # 0 outside the hole
    # band count is data-dependent; bound by the image inradius (static)
    h, w = img.shape[:2]
    max_bands = int(min(h, w) // 2 + 2)

    r = int(max(1, round(radius)))
    offs = [
        (dy, dx)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
        if (dy, dx) != (0, 0) and dy * dy + dx * dx <= r * r + 1e-6
    ]

    def band_pass(k, state):
        x, known = state
        kf = k.astype(jnp.float32)
        target = mask & (dist <= kf + 1.0) & ~known
        num = jnp.zeros_like(x)
        den = jnp.zeros(x.shape[:2], jnp.float32)
        for dy, dx in offs:
            nb = imgproc.shift2d(known.astype(jnp.float32), dy, dx, fill=0.0)
            val = imgproc.shift2d(x, dy, dx, fill=0.0)
            nb_dist = imgproc.shift2d(dist, dy, dx, fill=0.0)
            geo = 1.0 / (dy * dy + dx * dx)
            lev = 1.0 / (1.0 + jnp.abs(dist - nb_dist))
            # direction factor: alignment of the offset with grad(dist)
            gy = imgproc.shift2d(dist, -1, 0, fill=0.0) - imgproc.shift2d(dist, 1, 0, fill=0.0)
            gx = imgproc.shift2d(dist, 0, -1, fill=0.0) - imgproc.shift2d(dist, 0, 1, fill=0.0)
            gn = jnp.sqrt(gx * gx + gy * gy) + 1e-6
            dirf = jnp.abs(dy * gy + dx * gx) / (gn * float((dy * dy + dx * dx) ** 0.5))
            wgt = nb * geo * lev * (0.1 + dirf)
            if x.ndim == 3:
                num = num + wgt[..., None] * val
            else:
                num = num + wgt * val
            den = den + wgt
        est = num / jnp.maximum(den, 1e-9)[..., None] if x.ndim == 3 else (
            num / jnp.maximum(den, 1e-9)
        )
        fillable = target & (den > 1e-9)
        fm = fillable[..., None] if x.ndim == 3 else fillable
        x = jnp.where(fm, est, x)
        known = known | fillable
        return x, known

    x0 = jnp.where(mask[..., None] if img.ndim == 3 else mask, 0.0, img)
    known0 = ~mask
    x, _ = lax.fori_loop(0, max_bands, band_pass, (x0, known0))
    return x


# --------------------------------------------------------------------------
# Contrast-preserving decolorization (photo/src/decolor.cpp:1)
# --------------------------------------------------------------------------


def decolor(img_rgb: jnp.ndarray, n_pairs: int = 4096, seed: int = 0):
    """cv::decolor analog (Lu, Xu & Jia 2012): choose grayscale weights
    that preserve color contrast. The reference optimizes the bimodal
    contrast-preserving energy over a discretized (wr, wg, wb) simplex;
    here ALL candidate weightings are scored in one batch (energy over a
    random pixel-pair sample — pure MXU/VPU work) and the argmax wins.

    Returns (gray [H,W] in [0,255], color_boost [H,W,3]).
    """
    img = jnp.asarray(img_rgb, jnp.float32) / 255.0
    h, w, _ = img.shape
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    flat = img.reshape(-1, 3)
    n = flat.shape[0]
    ia = jax.random.randint(k1, (n_pairs,), 0, n)
    ib = jax.random.randint(k2, (n_pairs,), 0, n)
    ca, cb = flat[ia], flat[ib]  # [P,3]
    # target contrast: euclidean color difference (the reference's delta)
    delta = jnp.linalg.norm(ca - cb, axis=1) / jnp.sqrt(3.0)

    # candidate simplex weights at 0.05 resolution (the reference uses a
    # discrete candidate set too)
    import numpy as _np

    cand = []
    for wr in range(0, 21):
        for wg in range(0, 21 - wr):
            cand.append((wr / 20.0, wg / 20.0, (20 - wr - wg) / 20.0))
    W = jnp.asarray(_np.asarray(cand, _np.float32))  # [C,3]

    ga = ca @ W.T  # [P,C]
    gb = cb @ W.T
    gdiff = ga - gb
    sig = 0.05
    # bimodal energy: each pair's gray difference should match +/- delta
    e = -jnp.log(
        jnp.exp(-((gdiff - delta[:, None]) ** 2) / (2 * sig * sig))
        + jnp.exp(-((gdiff + delta[:, None]) ** 2) / (2 * sig * sig))
        + 1e-12
    )
    best = jnp.argmin(jnp.sum(e, axis=0))
    wbest = W[best]
    gray = jnp.clip(img @ wbest, 0.0, 1.0)
    # color boost: saturation-preserving recombination (reference's
    # contrast_preserve boost output)
    lum = jnp.mean(img, axis=2, keepdims=True)
    boost = jnp.clip(img + (gray[..., None] - lum), 0.0, 1.0)
    return gray * 255.0, boost * 255.0


# --------------------------------------------------------------------------
# NPR: domain-transform filter family (photo/src/npr.cpp:1, npr.hpp)
# --------------------------------------------------------------------------


def _dt_recursive_1d(x: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Forward+backward recursive domain-transform pass along axis 1.
    x [H,W,C], v [H,W] feedback coefficients (a^ct). The recurrence
    y_j = (1-v_j) x_j + v_j y_{j-1} is a linear scan — evaluated in log
    depth with lax.associative_scan (TPU-friendly, no sequential loop).
    """

    def lin_scan(xs, vs, reverse=False):
        a = vs[..., None]
        b = xs * (1.0 - a)
        # fix boundary: first element passes through unchanged
        def combine(l, r):
            al, bl = l
            ar, br = r
            return al * ar, ar * bl + br

        aa, bb = lax.associative_scan(
            combine, (a, b), axis=1, reverse=reverse
        )
        return bb + aa * (xs[:, -1:] if reverse else xs[:, :1])

    # forward: v[0] must be 0 so y_0 = x_0
    vf = v.at[:, 0].set(0.0)
    y = lin_scan(x, vf)
    # backward: shift v left (reference uses V[j+1] coupling on the
    # reverse pass) with v[last] = 0
    vb = jnp.concatenate([v[:, 1:], jnp.zeros_like(v[:, :1])], axis=1)
    y = lin_scan(y, vb, reverse=True)
    return y


def edge_preserving_filter(
    img_rgb: jnp.ndarray,
    sigma_s: float = 60.0,
    sigma_r: float = 0.4,
    n_iters: int = 3,
) -> jnp.ndarray:
    """cv::edgePreservingFilter RECURS_FILTER analog (npr.cpp:52, the
    domain-transform recursive filter of npr.hpp:172-230): horizontal +
    vertical linear recurrences over a^(domain transform), 3 iterations
    with the standard shrinking sigma schedule."""
    img = jnp.asarray(img_rgb, jnp.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    # domain transforms (npr.hpp:397-460): ct = 1 + (s/r) * sum_c |d I|
    dx = jnp.sum(jnp.abs(jnp.diff(img, axis=1)), axis=2)
    dy = jnp.sum(jnp.abs(jnp.diff(img, axis=0)), axis=2)
    ctx = jnp.pad(dx, ((0, 0), (1, 0))) * (sigma_s / sigma_r) + 1.0
    cty = jnp.pad(dy, ((1, 0), (0, 0))) * (sigma_s / sigma_r) + 1.0

    out = img
    for i in range(n_iters):
        sigma_h = (
            sigma_s * (3.0 ** 0.5) * (2.0 ** (n_iters - (i + 1)))
            / ((4.0 ** n_iters - 1) ** 0.5)
        )
        a = jnp.exp(-(2.0 ** 0.5) / sigma_h)
        out = _dt_recursive_1d(out, a ** ctx)
        out = jnp.transpose(
            _dt_recursive_1d(
                jnp.transpose(out, (1, 0, 2)), (a ** cty).T
            ),
            (1, 0, 2),
        )
    out = jnp.clip(out * 255.0, 0.0, 255.0)
    return out[..., 0] if jnp.asarray(img_rgb).ndim == 2 else out


def detail_enhance(
    img_rgb: jnp.ndarray, sigma_s: float = 10.0, sigma_r: float = 0.15
) -> jnp.ndarray:
    """cv::detailEnhance (npr.cpp:70): base = DT filter; out = base +
    factor * (img - base), factor = 3."""
    img = jnp.asarray(img_rgb, jnp.float32)
    base = edge_preserving_filter(img, sigma_s, sigma_r)
    return jnp.clip(base + 3.0 * (img - base), 0.0, 255.0)


def stylization(
    img_rgb: jnp.ndarray, sigma_s: float = 60.0, sigma_r: float = 0.45
) -> jnp.ndarray:
    """cv::stylization (npr.cpp): DT-filtered base recombined with its
    own soft edge map for the posterized look."""
    img = jnp.asarray(img_rgb, jnp.float32)
    base = edge_preserving_filter(img, sigma_s, sigma_r)
    g = jnp.mean(base, axis=-1) if base.ndim == 3 else base
    gy, gx = jnp.gradient(g)
    mag = jnp.sqrt(gx * gx + gy * gy)
    edge = jnp.clip(1.0 - mag / (jnp.max(mag) + 1e-6) * 4.0, 0.0, 1.0)
    return jnp.clip(base * (edge[..., None] if base.ndim == 3 else edge), 0.0, 255.0)


def pencil_sketch(
    img_rgb: jnp.ndarray,
    sigma_s: float = 60.0,
    sigma_r: float = 0.07,
    shade_factor: float = 0.02,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cv::pencilSketch (npr.cpp): gray sketch from the DT-filter's
    residual structure + color pencil = sketch-shaded input."""
    img = jnp.asarray(img_rgb, jnp.float32)
    base = edge_preserving_filter(img, sigma_s, sigma_r)
    g = jnp.mean(base, axis=-1) if base.ndim == 3 else base
    gy, gx = jnp.gradient(g)
    mag = jnp.sqrt(gx * gx + gy * gy)
    sketch = jnp.clip(255.0 - mag * (255.0 / (jnp.max(mag) + 1e-6)), 0.0, 255.0)
    sketch = jnp.clip(sketch * (1.0 - shade_factor) + 255.0 * shade_factor, 0, 255)
    color = jnp.clip(img * (sketch[..., None] / 255.0 if img.ndim == 3 else sketch / 255.0), 0, 255)
    return sketch, color
