"""photo (NLM, inpaint, exposure fusion) and videostab tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import photo, videostab


def test_nlm_denoise_reduces_noise(rng):
    clean = np.zeros((64, 64), np.float32)
    clean[:, 32:] = 150.0
    clean = np.asarray(imgproc.gaussian_blur(jnp.asarray(clean), 5, 1.5))
    noisy = clean + rng.normal(0, 12.0, clean.shape).astype(np.float32)
    den = np.asarray(photo.nl_means_denoise(jnp.asarray(noisy), h=12.0, search_size=11))
    err_before = np.abs(noisy - clean).mean()
    err_after = np.abs(den - clean).mean()
    assert err_after < err_before * 0.45


def test_nlm_preserves_edges(rng):
    clean = np.zeros((64, 64), np.float32)
    clean[:, 32:] = 150.0
    noisy = clean + rng.normal(0, 8.0, clean.shape).astype(np.float32)
    den = np.asarray(photo.nl_means_denoise(jnp.asarray(noisy), h=10.0, search_size=11))
    # edge magnitude at the step survives
    assert (den[:, 33] - den[:, 30]).mean() > 120.0


def test_inpaint_fills_hole(rng):
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
    img = 2.0 * xx + 1.0 * yy  # harmonic -> diffusion reproduces exactly
    mask = np.zeros((48, 48), bool)
    mask[20:28, 20:28] = True
    corrupted = img.copy()
    corrupted[mask] = 0.0
    out = np.asarray(
        photo.inpaint_diffusion(jnp.asarray(corrupted), jnp.asarray(mask), iters=500)
    )
    np.testing.assert_allclose(out[mask], img[mask], atol=1.0)
    np.testing.assert_array_equal(out[~mask], corrupted[~mask])


def test_merge_mertens_prefers_well_exposed():
    base = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (32, 1))
    under = base * 0.25
    over = np.clip(base * 2.5, 0, 255)
    fused = np.asarray(photo.merge_mertens(jnp.asarray(np.stack([under, base, over]))))
    assert fused.shape == base.shape
    # fused mid-tones track the well-exposed frame more than the extremes
    mid = slice(None), slice(24, 40)
    assert abs(fused[mid].mean() - base[mid].mean() / 255.0) < 0.15


@pytest.mark.slow
def test_videostab_reduces_jitter(rng):
    # smooth texture translated by a jittery trajectory
    base = rng.uniform(0, 255, size=(80, 100)).astype(np.float32)
    base = np.asarray(imgproc.gaussian_blur(jnp.asarray(base), 7, 2.0))
    jitter = np.cumsum(rng.normal(0, 1.5, size=(12, 2)), axis=0).astype(np.float32)
    frames = []
    for i in range(12):
        m = jnp.asarray([[1.0, 0.0, jitter[i, 0]], [0.0, 1.0, jitter[i, 1]]])
        frames.append(np.asarray(imgproc.warp_affine(jnp.asarray(base), m, 80, 100)))
    stab = videostab.stabilize(frames, radius=4)

    def frame_jitter(seq):
        diffs = [
            np.abs(a[20:-20, 20:-20] - b[20:-20, 20:-20]).mean()
            for a, b in zip(seq[:-1], seq[1:])
        ]
        return np.mean(diffs)

    assert frame_jitter(stab) < frame_jitter(frames) * 0.6
