"""applyColorMap + getGaborKernel vs cv2 gold.

Reference: imgproc/src/{colormap.cpp:1,gabor.cpp:1}. cv2 builds each map
by linearly interpolating 64-sample anchor tables of the same Octave
functions we evaluate in closed form, so small (<=10/255) interpolation
artifacts are expected exactly where the functions curve steeply."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencv_tpu.ops import colormap

cv2 = pytest.importorskip("cv2")

_NAME2CV = {
    "autumn": "COLORMAP_AUTUMN", "bone": "COLORMAP_BONE",
    "jet": "COLORMAP_JET", "winter": "COLORMAP_WINTER",
    "rainbow": "COLORMAP_RAINBOW", "ocean": "COLORMAP_OCEAN",
    "summer": "COLORMAP_SUMMER", "spring": "COLORMAP_SPRING",
    "cool": "COLORMAP_COOL", "hsv": "COLORMAP_HSV",
    "pink": "COLORMAP_PINK", "hot": "COLORMAP_HOT",
}


@pytest.mark.parametrize("name", sorted(_NAME2CV))
def test_colormap_matches_cv2(name):
    gray = np.arange(256, dtype=np.uint8)[None, :]
    want = cv2.applyColorMap(
        gray, getattr(cv2, _NAME2CV[name])
    )[0][:, ::-1].astype(np.float32)  # BGR -> RGB
    got = np.asarray(colormap.apply_color_map(gray, name))[0]
    tol = 10.5 if name == "pink" else 6.0
    assert np.abs(got - want).max() <= tol


def test_colormap_image_shape(rng):
    img = rng.integers(0, 256, (20, 30)).astype(np.uint8)
    out = np.asarray(colormap.apply_color_map(img, "jet"))
    assert out.shape == (20, 30, 3)
    assert out.min() >= 0 and out.max() <= 255


@pytest.mark.parametrize(
    "ksize,sigma,theta,lambd,gamma,psi",
    [
        ((21, 21), 4.0, 0.0, 10.0, 0.5, np.pi / 2),
        ((15, 11), 3.0, np.pi / 4, 8.0, 0.8, 0.0),
        ((9, 9), 2.0, np.pi / 3, 6.0, 1.0, 1.0),
    ],
)
def test_gabor_kernel_matches_cv2(ksize, sigma, theta, lambd, gamma, psi):
    want = cv2.getGaborKernel(ksize, sigma, theta, lambd, gamma, psi,
                              ktype=cv2.CV_32F)
    got = np.asarray(
        colormap.get_gabor_kernel(ksize, sigma, theta, lambd, gamma, psi)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
