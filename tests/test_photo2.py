"""Round-3 photo completions vs cv2 gold / quality invariants:
TV-L1 denoise (denoise_tvl1.cpp), TELEA inpaint (inpaint.cpp),
decolor (decolor.cpp), NPR domain-transform family (npr.cpp)."""

import numpy as np
import pytest

from opencv_tpu.ops import photo


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def clean_image():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:96, :128].astype(np.float32)
    img = 100 + 60 * np.sin(xx / 17) + 40 * np.cos(yy / 13)
    img[30:60, 40:90] += 55.0  # a hard edge block
    return np.clip(img, 0, 255).astype(np.float32)


def test_denoise_tvl1_improves_psnr_and_keeps_edges(clean_image):
    rng = np.random.default_rng(1)
    noisy = np.clip(clean_image + rng.normal(0, 20, clean_image.shape), 0, 255)
    den = np.asarray(photo.denoise_tvl1(noisy.astype(np.float32), lam=1.0,
                                        n_iters=100))
    assert _psnr(den, clean_image) > _psnr(noisy, clean_image) + 3.0
    # the hard edge survives: gradient magnitude across the block border
    edge_in = np.abs(np.diff(den[45, 30:50])).max()
    assert edge_in > 20.0, edge_in


def test_denoise_tvl1_multi_observation(clean_image):
    rng = np.random.default_rng(2)
    obs = [
        np.clip(clean_image + rng.normal(0, 25, clean_image.shape), 0, 255)
        .astype(np.float32)
        for _ in range(3)
    ]
    den = np.asarray(photo.denoise_tvl1(obs, lam=1.0, n_iters=100))
    assert _psnr(den, clean_image) > _psnr(obs[0], clean_image) + 4.0


def test_denoise_tvl1_near_cv2(clean_image):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    noisy = np.clip(clean_image + rng.normal(0, 15, clean_image.shape), 0, 255)
    gold = np.zeros(noisy.shape, np.uint8)
    cv2.denoise_TVL1([noisy.astype(np.uint8)], gold, 1.0, 30)
    gold = gold.astype(np.float32)
    ours = np.asarray(photo.denoise_tvl1(noisy.astype(np.float32), 1.0, 100))
    # same objective, different step schedules: demand strong agreement
    # relative to the noise scale
    assert np.mean(np.abs(ours - gold)) < 6.0


def test_inpaint_telea_reconstructs_smooth_region(clean_image):
    mask = np.zeros(clean_image.shape, np.uint8)
    mask[20:34, 15:31] = 1  # hole in the smooth sine region
    corrupted = clean_image.copy()
    corrupted[mask > 0] = 0
    out = np.asarray(photo.inpaint_telea(corrupted, mask, radius=3))
    hole_err = np.abs(out - clean_image)[mask > 0]
    assert hole_err.mean() < 6.0, hole_err.mean()
    # untouched pixels pass through exactly
    np.testing.assert_array_equal(out[mask == 0], corrupted[mask == 0])


def test_inpaint_telea_close_to_cv2(clean_image):
    cv2 = pytest.importorskip("cv2")
    mask = np.zeros(clean_image.shape, np.uint8)
    mask[50:62, 60:80] = 1
    corrupted = clean_image.copy()
    corrupted[mask > 0] = 0
    gold = cv2.inpaint(
        corrupted.astype(np.uint8), mask, 3, cv2.INPAINT_TELEA
    ).astype(np.float32)
    ours = np.asarray(photo.inpaint_telea(corrupted, mask, radius=3))
    assert np.abs(ours - gold)[mask > 0].mean() < 8.0


def test_decolor_preserves_isoluminant_contrast():
    # red and green patches with identical luminance: plain Y loses the
    # edge, contrast-preserving decolor must keep it
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :32] = [200, 60, 60]
    img[:, 32:] = [60, 200, 57]  # tuned to ~equal BT.601 luma
    gray, boost = photo.decolor(img)
    gray = np.asarray(gray)
    step = abs(float(gray[:, :30].mean()) - float(gray[:, 34:].mean()))
    luma = img @ np.array([0.299, 0.587, 0.114], np.float32)
    luma_step = abs(float(luma[:, :30].mean()) - float(luma[:, 34:].mean()))
    assert step > luma_step + 20.0, (step, luma_step)
    assert np.asarray(boost).shape == img.shape


def test_edge_preserving_filter_smooths_but_keeps_edges(clean_image):
    rgb = np.stack([clean_image] * 3, -1)
    rng = np.random.default_rng(4)
    noisy = np.clip(rgb + rng.normal(0, 12, rgb.shape), 0, 255).astype(np.float32)
    out = np.asarray(photo.edge_preserving_filter(noisy, 60.0, 0.4))
    # flat-region variance drops a lot
    flat_before = noisy[5:15, 5:15, 0].std()
    flat_after = out[5:15, 5:15, 0].std()
    assert flat_after < 0.75 * flat_before
    # the block edge survives
    edge = np.abs(np.diff(out[45, 30:50, 0])).max()
    assert edge > 15.0


def test_edge_preserving_filter_matches_cv2_shape():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    gold = cv2.edgePreservingFilter(img, flags=cv2.RECURS_FILTER,
                                    sigma_s=60, sigma_r=0.4).astype(np.float32)
    ours = np.asarray(photo.edge_preserving_filter(img.astype(np.float32),
                                                   60.0, 0.4))
    # same filter, same schedule: close agreement expected
    assert np.mean(np.abs(ours - gold)) < 8.0, np.mean(np.abs(ours - gold))


def test_detail_enhance_boosts_detail(clean_image):
    rgb = np.stack([clean_image] * 3, -1).astype(np.float32)
    out = np.asarray(photo.detail_enhance(rgb))
    assert out.shape == rgb.shape
    # high-frequency energy increases
    hf = lambda x: np.abs(np.diff(x[..., 0], axis=1)).mean()
    assert hf(out) > hf(rgb) * 0.9


def test_stylization_and_pencil_sketch_run(clean_image):
    rgb = np.stack([clean_image] * 3, -1).astype(np.float32)
    sty = np.asarray(photo.stylization(rgb))
    assert sty.shape == rgb.shape and sty.min() >= 0 and sty.max() <= 255
    sketch, color = photo.pencil_sketch(rgb)
    sketch, color = np.asarray(sketch), np.asarray(color)
    assert sketch.shape == clean_image.shape
    assert color.shape == rgb.shape
    # sketch is mostly white paper with dark strokes at edges
    assert sketch.mean() > 150.0
    assert sketch.min() < 120.0
