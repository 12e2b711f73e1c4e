"""Distance transform, flood fill, mean shift tests."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import distance


def test_edt_exact_vs_bruteforce(rng):
    mask = rng.random((20, 24)) > 0.2
    mask[5, 7] = False  # ensure background exists
    d = np.asarray(distance.distance_transform(jnp.asarray(mask)))
    ys, xs = np.nonzero(~mask)
    bg = np.stack([ys, xs], 1)
    for y in range(20):
        for x in range(24):
            if mask[y, x]:
                want = np.sqrt(((bg - [y, x]) ** 2).sum(1).min())
                assert abs(d[y, x] - want) < 1e-3
            else:
                assert d[y, x] == 0.0


def test_flood_fill_region():
    img = np.zeros((16, 16), np.float32)
    img[4:10, 4:10] = 100.0
    img[12:15, 12:15] = 100.0  # disconnected same-value region
    out, region = distance.flood_fill(jnp.asarray(img), (5, 5), 200.0, 1.0, 1.0)
    out, region = np.asarray(out), np.asarray(region)
    assert (out[4:10, 4:10] == 200.0).all()
    assert (out[12:15, 12:15] == 100.0).all()  # not connected -> untouched
    assert not region[0, 0]


def test_mean_shift_flattens_regions(rng):
    img = np.zeros((24, 32), np.float32)
    img[:, :16] = 60.0
    img[:, 16:] = 180.0
    noisy = img + rng.normal(0, 5.0, img.shape).astype(np.float32)
    out = np.asarray(distance.mean_shift_filter(jnp.asarray(noisy), 4, 30.0))
    # interiors flatten toward region means, edge stays sharp
    assert out[:, 2:12].std() < noisy[:, 2:12].std() * 0.5
    assert abs(out[:, 2:12].mean() - 60.0) < 3.0
    assert abs(out[:, 20:30].mean() - 180.0) < 3.0
    assert (out[:, 20] - out[:, 12]).mean() > 100.0
