"""Stitching exposure compensation vs cv2.detail gold + timelapser.

Reference: modules/stitching/src/exposure_compensate.cpp:85-182
(GainCompensator), :300+ (BlocksGainCompensator);
modules/stitching/src/timelapsers.cpp:1."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.stitching import exposure

cv2 = pytest.importorskip("cv2")


def _canvas_pair(rng, gain2=1.5):
    """Two overlapping tiles on one canvas; tile 2 over-exposed by
    gain2. Returns canvas-aligned (images, masks) plus the cv2-style
    per-tile crops and corners."""
    h, w = 60, 140
    tex = rng.uniform(60, 160, (h, w)).astype(np.float32)
    img1 = tex[:, :90]
    img2 = np.clip(tex[:, 50:] * gain2, 0, 255)
    canvas1 = np.zeros((h, w), np.float32)
    canvas2 = np.zeros((h, w), np.float32)
    m1 = np.zeros((h, w), bool)
    m2 = np.zeros((h, w), bool)
    canvas1[:, :90] = img1
    m1[:, :90] = True
    canvas2[:, 50:] = img2
    m2[:, 50:] = True
    return (canvas1, canvas2), (m1, m2), (img1, img2)


def test_gain_compensator_matches_cv2(rng):
    (c1, c2), (m1, m2), (img1, img2) = _canvas_pair(rng)
    # the compensator itself applies the reference's gray*sqrt(3) RGB
    # norm scale (exposure.py _RGB_NORM); floor() matches the u8
    # quantization cv2 sees
    out, gains = exposure.gain_compensate(
        [np.floor(c1), np.floor(c2)], [m1, m2]
    )
    gains = np.asarray(gains)

    comp = cv2.detail.ExposureCompensator_createDefault(
        cv2.detail.ExposureCompensator_GAIN
    )
    corners = [(0, 0), (50, 0)]
    imgs_u8 = [
        cv2.cvtColor(img1.astype(np.uint8), cv2.COLOR_GRAY2BGR),
        cv2.cvtColor(img2.astype(np.uint8), cv2.COLOR_GRAY2BGR),
    ]
    masks_u8 = [np.full(img1.shape, 255, np.uint8),
                np.full(img2.shape, 255, np.uint8)]
    comp.feed(corners, imgs_u8, masks_u8)
    # extract cv2 gains by applying to a unit image
    cv2_gains = []
    for i, im in enumerate(imgs_u8):
        probe = np.full_like(im, 100)
        comp.apply(i, corners[i], probe, masks_u8[i])
        cv2_gains.append(probe.mean() / 100.0)

    # same direction and ~same magnitude (cv2 feeds RGB norms of u8
    # pixels; ours feeds the gray values — the ratio g1/g2 is the
    # invariant quantity)
    ratio_us = gains[0] / gains[1]
    ratio_cv = cv2_gains[0] / cv2_gains[1]
    assert abs(ratio_us - ratio_cv) / ratio_cv < 0.05, (gains, cv2_gains)
    # and it actually equalizes the overlap
    ov = m1 & m2
    before = abs(c1[ov].mean() - c2[ov].mean())
    o1, o2 = np.asarray(out[0]), np.asarray(out[1])
    after = abs(o1[ov].mean() - o2[ov].mean())
    # the beta=100 gain prior (exposure_compensate.cpp:141) deliberately
    # pulls gains toward 1, so the residual does not vanish — cv2 leaves
    # the same fraction at this exposure ratio
    assert after < 0.4 * before, (before, after)


def test_block_gain_compensator_equalizes_vignette(rng):
    """Smoothly varying exposure (vignette) needs the per-block variant:
    the single global gain cannot flatten it, block gains can."""
    h, w = 64, 128
    tex = rng.uniform(80, 120, (h, w)).astype(np.float32)
    ramp = 1.0 + 0.6 * np.linspace(0, 1, w)[None, :]  # x-ramp on tile 2
    c1 = np.zeros((h, w), np.float32)
    c2 = np.zeros((h, w), np.float32)
    m1 = np.zeros((h, w), bool)
    m2 = np.zeros((h, w), bool)
    c1[:, :80] = tex[:, :80]
    m1[:, :80] = True
    c2[:, 48:] = tex[:, 48:] * ramp[:, 48:]
    m2[:, 48:] = True

    out, gmap = exposure.block_gain_compensate([c1, c2], [m1, m2], block=16)
    o1, o2 = np.asarray(out[0]), np.asarray(out[1])
    ov = m1 & m2
    err_before = np.abs(c1[ov] - c2[ov]).mean()
    err_after = np.abs(o1[ov] - o2[ov]).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # gains vary across the ramp direction for image 2
    g2 = np.asarray(gmap[1])
    assert g2[:, 60].mean() > g2[:, 120].mean() * 0.9


def test_timelapse_frames(rng):
    (c1, c2), (m1, m2), _ = _canvas_pair(rng)
    frames = exposure.timelapse([c1, c2], [m1, m2], crop=False)
    assert len(frames) == 2
    assert frames[0].shape == c1.shape
    np.testing.assert_allclose(frames[0], np.where(m1, c1, 0.0))
    np.testing.assert_allclose(frames[1], np.where(m2, c2, 0.0))
    cropped = exposure.timelapse([c1, c2], [m1, m2], crop=True)
    assert cropped[0].shape == c1.shape  # masks span the full canvas


def test_stitch_panorama_gain_stage_runs(rng):
    """The pano pipeline accepts the new exposure stage end-to-end
    (rotation views like test_global_stitch, one view over-exposed)."""
    from test_global_stitch import _views
    from opencv_tpu.stitching.global_stitch import stitch_panorama

    views, _ = _views(rng, [-0.25, 0.0, 0.25])
    views[1] = np.clip(views[1] * 1.35, 0, 255)
    pano = stitch_panorama(views, n_features=600, seed=1, blend_bands=2,
                           exposure_comp="gain")
    assert pano.shape[0] > 0 and np.isfinite(pano).all()
