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
