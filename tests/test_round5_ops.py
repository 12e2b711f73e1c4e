"""Round-5 surface additions: SVMSGD (ml/src/svmsgd.cpp:60) and
linearPolar/logPolar (imgproc/src/imgwarp.cpp:3248 warpPolar)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.ml import classifiers


# ------------------------------------------------------------- SVMSGD


def _two_blobs(rng, n=400, sep=3.0):
    x_pos = rng.normal([+sep, 0.5], 1.0, (n // 2, 2))
    x_neg = rng.normal([-sep, -0.5], 1.0, (n // 2, 2))
    x = np.concatenate([x_pos, x_neg]).astype(np.float32)
    y = np.concatenate([np.ones(n // 2), -np.ones(n // 2)]).astype(np.float32)
    p = rng.permutation(n)
    return x[p], y[p]


@pytest.mark.parametrize("sgd_type", ["sgd", "asgd"])
def test_svmsgd_separates_blobs(sgd_type):
    rng = np.random.default_rng(0)
    x, y = _two_blobs(rng)
    model = classifiers.train_svmsgd(
        jnp.asarray(x), jnp.asarray(y), svmsgd_type=sgd_type, iters=20000
    )
    pred = np.asarray(classifiers.svmsgd_predict(model, jnp.asarray(x)))
    acc = (pred == y).mean()
    assert acc > 0.97, acc


def test_svmsgd_hard_margin_shift_is_margin_midpoint():
    rng = np.random.default_rng(1)
    x, y = _two_blobs(rng, sep=5.0)
    model = classifiers.train_svmsgd(
        jnp.asarray(x), jnp.asarray(y), margin_type="hard", iters=20000
    )
    # calcShift semantics (svmsgd.cpp:203): with the returned shift, the
    # minimal positive-class margin equals the minimal negative-class
    # margin in magnitude
    d = np.asarray(classifiers.svmsgd_decision(model, jnp.asarray(x)))
    m_pos = d[y > 0].min()
    m_neg = (-d[y < 0]).min()
    assert abs(m_pos - m_neg) < 1e-3
    acc = ((d > 0) == (y > 0)).mean()
    assert acc > 0.97


def test_svmsgd_decision_is_affine():
    rng = np.random.default_rng(2)
    x, y = _two_blobs(rng)
    model = classifiers.train_svmsgd(jnp.asarray(x), jnp.asarray(y), iters=5000)
    pts = rng.normal(0, 2, (10, 2)).astype(np.float32)
    d = np.asarray(classifiers.svmsgd_decision(model, jnp.asarray(pts)))
    manual = pts @ np.asarray(model.weights) + float(model.shift)
    assert np.abs(d - manual).max() < 1e-5


# ------------------------------------------------- linearPolar/logPolar


def _ring_image(h=96, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((xx - w / 2) ** 2 + (yy - h / 2) ** 2)
    return (100 + 80 * np.sin(r / 4.0)).astype(np.float32)


def test_linear_polar_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _ring_image()
    c = (48.0, 48.0)
    ours = np.asarray(imgproc.linear_polar(jnp.asarray(img), c, 40.0))
    gold = cv2.warpPolar(img, (96, 96), c, 40.0,
                         cv2.INTER_LINEAR)  # linearPolar == warpPolar linear
    # compare where cv2 produced in-range samples (transparent border
    # pixels differ from our clamp convention)
    mask = gold != 0
    diff = np.abs(ours - gold)[mask]
    assert np.median(diff) < 0.5
    assert (diff < 2.0).mean() > 0.9


def test_log_polar_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _ring_image()
    c = (48.0, 48.0)
    import math
    ours = np.asarray(imgproc.log_polar(jnp.asarray(img), c, 25.0))
    # legacy logPolar(m) == warpPolar(maxRadius=exp(W/m), LOG)
    gold = cv2.warpPolar(img, (96, 96), c, math.exp(96 / 25.0),
                         cv2.INTER_LINEAR + cv2.WARP_POLAR_LOG)
    mask = gold != 0
    diff = np.abs(ours - gold)[mask]
    assert np.median(diff) < 0.5
    assert (diff < 2.0).mean() > 0.9


def test_polar_ring_becomes_vertical_stripe():
    """A concentric ring maps to a constant-rho (vertical) stripe."""
    img = _ring_image()
    pol = np.asarray(imgproc.linear_polar(jnp.asarray(img), (48.0, 48.0), 48.0))
    # column-wise variance (across angles) should be tiny vs row-wise
    col_var = pol[:, 8:-8].var(axis=0).mean()
    row_var = pol[8:-8, :].var(axis=1).mean()
    assert col_var < 0.05 * row_var


def test_warp_polar_roundtrip():
    """forward then inverse reproduces the interior of the image."""
    img = _ring_image()
    c = (48.0, 48.0)
    fwd = imgproc.warp_polar(jnp.asarray(img), (96, 96), c, 40.0)
    back = np.asarray(
        imgproc.warp_polar(fwd, (96, 96), c, 40.0, inverse=True)
    )
    yy, xx = np.mgrid[0:96, 0:96]
    r = np.sqrt((xx - c[0]) ** 2 + (yy - c[1]) ** 2)
    interior = (r > 4) & (r < 36)
    diff = np.abs(back - img)[interior]
    assert np.median(diff) < 1.5
