"""HOG tests: descriptor properties + end-to-end detection with an SVM
trained on the fly (the reference ships trained coefficients; we verify
the machinery by training our own linear classifier on synthetic data)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencv_tpu.ops import hog


CFG = hog.HOGConfig()


def make_bar_window(rng, on=True):
    """64x128 window; positives contain a bright vertical bar (a crude
    'pedestrian'), negatives are noise blobs."""
    img = rng.uniform(0, 40, size=(128, 64)).astype(np.float32)
    if on:
        x = rng.integers(24, 40)
        wbar = rng.integers(10, 16)
        img[20:110, x - wbar // 2 : x + wbar // 2] += rng.uniform(120, 200)
    else:
        for _ in range(6):
            y, x = rng.integers(10, 110), rng.integers(5, 55)
            img[y : y + 8, x : x + 8] += rng.uniform(60, 150)
    return img


def test_descriptor_shape_and_norm(rng):
    img = make_bar_window(rng)
    d = np.asarray(hog.compute_descriptor(jnp.asarray(img)))
    assert d.shape == (CFG.descriptor_dim,)
    assert CFG.descriptor_dim == 3780  # standard 64x128 HOG dimension
    # every block is L2-normalized => block norms <= ~1
    blocks = d.reshape(-1, CFG.block_dim)
    norms = np.linalg.norm(blocks, axis=1)
    assert norms.max() <= 1.01


def test_descriptor_illumination_invariance(rng):
    # near-invariance: the reference's exact L2-Hys adds constants to the
    # norm denominators (hog.cpp:1163 sqrt(sum)+0.1*blockDim), so a gain
    # change shifts features by O(eps/norm) — ~1%, same as the reference
    img = make_bar_window(rng)
    d1 = np.asarray(hog.compute_descriptor(jnp.asarray(img)))
    d2 = np.asarray(hog.compute_descriptor(jnp.asarray(img * 2.0)))
    np.testing.assert_allclose(d1, d2, rtol=0.05, atol=2e-3)


def test_cell_histogram_orientation(rng):
    # vertical edges -> horizontal gradient -> angle 0 -> bin 0 heavy
    img = np.tile(
        np.repeat(np.array([0.0, 100.0], np.float32), 4)[None, :], (64, 8)
    )
    cells = np.asarray(hog.cell_histograms(jnp.asarray(img)))
    total = cells.sum(axis=(0, 1))
    # bin 0 wraps with bin 8 around angle 0; together they dominate
    assert (total[0] + total[-1]) > 0.8 * total.sum()


@pytest.fixture(scope="module")
def trained_svm():
    rng = np.random.default_rng(11)
    X, y = [], []
    for _ in range(60):
        X.append(np.asarray(hog.compute_descriptor(jnp.asarray(make_bar_window(rng, True)))))
        y.append(1.0)
        X.append(np.asarray(hog.compute_descriptor(jnp.asarray(make_bar_window(rng, False)))))
        y.append(-1.0)
    X = np.stack(X)
    y = np.asarray(y)
    # ridge-regression "SVM" (enough for a separable synthetic task)
    lam = 1e-2
    w = np.linalg.solve(X.T @ X + lam * np.eye(X.shape[1]), X.T @ y)
    b = -(X @ w).mean() + y.mean() * 0.0
    return w.astype(np.float32), float(b)


def test_window_classifier_separates(trained_svm, rng):
    w, b = trained_svm
    pos_scores, neg_scores = [], []
    for _ in range(10):
        dp = np.asarray(hog.compute_descriptor(jnp.asarray(make_bar_window(rng, True))))
        dn = np.asarray(hog.compute_descriptor(jnp.asarray(make_bar_window(rng, False))))
        pos_scores.append(dp @ w + b)
        neg_scores.append(dn @ w + b)
    assert min(pos_scores) > max(neg_scores)


def test_score_map_equals_per_window_descriptor(trained_svm, rng):
    """The conv-based sliding classifier must equal explicit per-window
    dot products over the same full-image block features. (Descriptors of
    *cropped* windows differ slightly at window borders, where the crop
    loses gradient context — same boundary caveat as the reference's
    padded detectMultiScale.)"""
    w, b = trained_svm
    img = rng.uniform(0, 60, size=(160, 96)).astype(np.float32)
    img[16:106, 40:52] += 150.0
    sm = np.asarray(hog.score_map(jnp.asarray(img), jnp.asarray(w), b))
    feat = np.asarray(hog.block_histograms(jnp.asarray(img)))
    for (by, bx) in [(0, 0), (2, 1), (3, 3)]:
        d = feat[by : by + CFG.blocks_y, bx : bx + CFG.blocks_x].reshape(-1)
        np.testing.assert_allclose(sm[by, bx], d @ w + b, rtol=1e-3, atol=1e-3)
    # and the cropped-window descriptor agrees to border-effect tolerance
    win = img[16 : 16 + 128, 8 : 8 + 64]
    d_crop = np.asarray(hog.compute_descriptor(jnp.asarray(win)))
    assert abs(sm[2, 1] - (d_crop @ w + b)) < 0.15


def test_detect_multi_scale_finds_target(trained_svm, rng):
    w, b = trained_svm
    img = rng.uniform(0, 40, size=(256, 320)).astype(np.float32)
    # plant a bar 'pedestrian' at a known location, roughly window-sized
    img[60:150, 140:152] += 160.0
    det = hog.detect_multi_scale(
        jnp.asarray(img), jnp.asarray(w), b, n_scales=4, hit_threshold=0.2,
    )
    boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
    assert len(boxes) >= 1
    # best box covers the bar center (146, 105)
    x, y, bw, bh = boxes[0]
    assert x <= 146 <= x + bw
    assert y <= 105 <= y + bh


REF_HOG_CPP = "/root/reference/modules/objdetect/src/hog.cpp"
REF_BB1 = "/root/reference/samples/data/basketball1.png"


@pytest.mark.skipif(
    not (os.path.exists(REF_HOG_CPP) and os.path.exists(REF_BB1)),
    reason="reference data absent",
)
def test_shipped_people_detector_fires_on_pedestrians():
    """Validation against the fork's SHIPPED model: parse the
    getDefaultPeopleDetector coefficients (hog.cpp:2174, data read at
    runtime) and check the sliding classifier goes positive on the
    upright players in basketball1.png — and stays negative on a
    person-free texture."""
    import re
    from PIL import Image
    from opencv_tpu.core import imgproc

    body = (
        open(REF_HOG_CPP).read()
        .split("getDefaultPeopleDetector()")[1]
        .split("return std::vector<float>")[0]
    )
    vals = np.asarray(
        [float(x) for x in re.findall(r"(-?[\d.]+(?:e[+-]?\d+)?)f", body)],
        np.float32,
    )
    assert vals.size == 3781  # 3780 weights + rho
    w, bias = hog.load_opencv_detector(vals)
    img = np.asarray(Image.open(REF_BB1).convert("L"), np.float32)
    ji = jnp.asarray(img)
    best = -np.inf
    best_x = None
    for si in (6, 8, 10):  # scales ~1.34-1.63: player height ~190 px
        s = 1.05 ** si
        scaled = imgproc.resize_bilinear(ji, int(img.shape[0] / s), int(img.shape[1] / s))
        sm = np.asarray(hog.score_map(scaled, w, bias))
        if sm.max() > best:
            best = float(sm.max())
            iy, ix = np.unravel_index(sm.argmax(), sm.shape)
            best_x = ix * 8 * s
    assert best > 0.3, f"no positive person score (best {best:.3f})"
    assert 300 < best_x < 500, f"hit at x={best_x:.0f}, players are at x~350-470"
    # negative control: a flat-texture noise image must not fire
    rng = np.random.default_rng(0)
    neg = rng.uniform(0, 255, (160, 96)).astype(np.float32)
    smn = np.asarray(hog.score_map(jnp.asarray(neg), w, bias))
    assert smn.max() < 0.0
