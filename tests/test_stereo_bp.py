"""Belief-propagation stereo tests (cudastereo BP/CSBP analogs).

Gold pattern: synthetic random-texture pair with a known piecewise
disparity field (same construction as the SGBM tests)."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.ops import stereo, stereo_bp


def _synthetic_pair(rng, h=64, w=96, d_bg=4, d_fg=10):
    """Right image + known disparity -> left image by shifting columns."""
    right = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # smooth the texture slightly so subpixel shifts are benign
    k = np.array([0.25, 0.5, 0.25])
    right = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, right)
    disp = np.full((h, w), d_bg, np.int32)
    disp[18:46, 30:70] = d_fg  # foreground block
    xs = np.arange(w)
    left = np.zeros_like(right)
    for y in range(h):
        src = xs - disp[y]
        src = np.clip(src, 0, w - 1)
        left[y] = right[y, src]
    return left.astype(np.float32), right.astype(np.float32), disp


def _bad_pixel_rate(pred, gt, border=12, tol=1):
    p = pred[border:-border, border:-border]
    g = gt[border:-border, border:-border]
    return float(np.mean(np.abs(p - g) > tol))


def test_truncated_linear_dt_matches_bruteforce(rng):
    m = rng.uniform(0, 10, (5, 7, 16)).astype(np.float32)
    jump, cap = 0.8, 3.0
    got = np.asarray(stereo_bp._truncated_linear_dt(jnp.asarray(m), jump, cap))
    d = m.shape[-1]
    want = np.empty_like(m)
    for k in range(d):
        pen = np.minimum(np.abs(np.arange(d) - k) * jump, cap)
        want[..., k] = np.min(m + pen, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bp_recovers_disparity(rng):
    left, right, disp = _synthetic_pair(rng)
    pred = np.asarray(
        stereo_bp.stereo_bp(
            jnp.asarray(left), jnp.asarray(right), num_disparities=16,
            n_iters=6, n_levels=3,
        )
    )
    assert _bad_pixel_rate(pred, disp) < 0.12


def test_bp_beats_or_matches_bm(rng):
    left, right, disp = _synthetic_pair(rng)
    bp = np.asarray(
        stereo_bp.stereo_bp(
            jnp.asarray(left), jnp.asarray(right), num_disparities=16,
            n_iters=6, n_levels=3,
        )
    )
    bm = np.asarray(
        stereo.compute_disparity_bm(
            jnp.asarray(left), jnp.asarray(right), num_disparities=16,
            block_size=9,
        )
    )
    assert _bad_pixel_rate(bp, disp) <= _bad_pixel_rate(bm, disp) + 0.02


def test_csbp_recovers_disparity(rng):
    left, right, disp = _synthetic_pair(rng)
    pred = np.asarray(
        stereo_bp.stereo_csbp(
            jnp.asarray(left), jnp.asarray(right), num_disparities=16,
            nr_plane=6, n_iters=8,
        )
    )
    assert _bad_pixel_rate(pred, disp) < 0.15
