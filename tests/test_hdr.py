"""HDR pipeline tests: Debevec/Robertson calibration, merge, MTB align.

Gold pattern: synthesize an exposure stack from a known radiance map and
a known response curve, then check the recovered response/radiance."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.ops import photo


GAMMA = 2.2


def _stack(rng, times, h=48, w=64, shifts=None):
    """u8 exposure stack from a smooth radiance field with response
    z = 255 * (E*t)^(1/gamma) clipped."""
    yy, xx = np.mgrid[0:h, 0:w]
    E = 0.02 + 0.6 * (np.sin(xx / 9.0) * np.cos(yy / 7.0) * 0.5 + 0.5)
    # blocky texture gives the median-threshold bitmaps real structure
    blocks = rng.uniform(0, 0.35, (h // 4 + 1, w // 4 + 1))
    E += np.kron(blocks, np.ones((4, 4)))[:h, :w]
    imgs = []
    for k, t in enumerate(times):
        x = np.clip(E * t, 0, None) ** (1 / GAMMA)
        img = np.clip(255.0 * x, 0, 255)
        if shifts is not None:
            img = np.roll(img, shifts[k], axis=(0, 1))
        imgs.append(img)
    return np.stack(imgs).astype(np.float32), E


def test_calibrate_debevec_recovers_loglinear_response(rng):
    times = np.array([1 / 60, 1 / 15, 1 / 4, 1.0], np.float32)
    stack, _ = _stack(rng, times)
    g = np.asarray(photo.calibrate_debevec(jnp.asarray(stack),
                                           jnp.asarray(times)))
    # true log response: g(z) = gamma * ln(z/255); compare shape over the
    # well-exposed range after matching at z=128
    zs = np.arange(30, 226)
    want = GAMMA * np.log(zs / 255.0)
    want -= GAMMA * np.log(128 / 255.0)
    got = g[zs] - g[128]
    assert np.abs(got - want).mean() < 0.15


def test_merge_debevec_radiance_proportional(rng):
    times = np.array([1 / 60, 1 / 15, 1 / 4, 1.0], np.float32)
    stack, E = _stack(rng, times)
    g = photo.calibrate_debevec(jnp.asarray(stack), jnp.asarray(times))
    hdr = np.asarray(photo.merge_debevec(jnp.asarray(stack),
                                         jnp.asarray(times), g))
    # radiance recovered up to one global scale
    m = (hdr > 0) & (E > 0.05)
    ratio = hdr[m] / E[m]
    spread = np.std(np.log(ratio))
    assert spread < 0.25, spread
    ldr = np.asarray(photo.tonemap_reinhard(jnp.asarray(hdr)))
    assert ldr.min() >= 0 and ldr.max() <= 255


def test_calibrate_robertson_monotone(rng):
    times = np.array([1 / 30, 1 / 8, 1 / 2], np.float32)
    stack, _ = _stack(rng, times)
    g = np.asarray(photo.calibrate_robertson(jnp.asarray(stack),
                                             jnp.asarray(times)))
    assert (np.diff(g) >= -1e-6).all()
    assert abs(g[128] - 1.0) < 1e-3
    # convex for a gamma curve: response at 64 below half of g[192]
    assert g[64] < g[192]


def test_align_mtb_recovers_shifts(rng):
    times = np.array([1 / 16, 1 / 4, 1.0], np.float32)
    shifts = [(0, 0), (3, -5), (-4, 2)]
    stack, _ = _stack(rng, times, shifts=shifts)
    aligned = np.asarray(photo.align_mtb(jnp.asarray(stack), max_shift=8))
    # the unshifted stack regenerates from the same seed as the fixture
    stack0, _ = _stack(np.random.default_rng(1234), times, shifts=None)
    for k in range(1, 3):
        a = aligned[k][8:-8, 8:-8]
        w = stack0[k][8:-8, 8:-8]
        assert np.abs(a - w).mean() < 2.0, k
