"""videostab submodule tests: Wiener deblur + temporal border inpainting
(deblurring.cpp / inpainting.cpp capability slots)."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ops import videostab


def test_wiener_deblur_reduces_motion_blur(rng):
    img = np.asarray(imgproc.gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, (64, 80)).astype(np.float32)), 5, 1.5
    ))
    L = 5
    blurred = np.zeros_like(img)
    for i in range(L):
        blurred += np.roll(img, i - L // 2, axis=1)
    blurred /= L
    de = np.asarray(videostab.deblur_weiner_gaussian(jnp.asarray(blurred), L))
    inner = (slice(8, -8), slice(8, -8))
    err_blur = np.abs(blurred[inner] - img[inner]).mean()
    err_deblur = np.abs(de[inner] - img[inner]).mean()
    assert err_deblur < 0.85 * err_blur, (err_blur, err_deblur)


def test_inpaint_borders_from_neighbours(rng):
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    frames = [img, img.copy(), img]
    masks = [np.ones_like(img, bool) for _ in frames]
    # punch a hole in the middle frame; neighbours see the truth
    masks[1][:, :12] = False
    frames[1][:, :12] = 0.0
    out = videostab.inpaint_borders(frames, masks)
    np.testing.assert_allclose(out[1][:, :12], img[:, :12], atol=1e-4)
    # untouched pixels stay identical
    np.testing.assert_allclose(out[1][:, 12:], img[:, 12:], atol=1e-4)


def test_suppress_wobble_removes_alternating_jitter(rng):
    t = np.arange(40)
    smooth = np.stack([0.5 * np.sin(t / 15.0), 0.02 * t], 1)  # slow drift
    wobble = 0.3 * (-1.0) ** t  # period-2 rolling-shutter style jitter
    motions = np.zeros((40, 2, 3), np.float32)
    motions[:, 0, 2] = smooth[:, 0] + wobble
    motions[:, 1, 2] = smooth[:, 1]
    out = videostab.suppress_wobble(motions, period=2)
    # the alternating component shrinks by >10x; the slow drift survives
    resid = out[:, 0, 2] - smooth[:, 0]
    assert np.abs(resid[5:-5]).max() < 0.05
    keep = out[:, 1, 2]
    np.testing.assert_allclose(keep[5:-5], smooth[5:-5, 1], atol=0.02)
