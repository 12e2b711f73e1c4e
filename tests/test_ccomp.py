"""Connected components + blob detector tests."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import ccomp


def test_connected_components_two_regions():
    mask = np.zeros((12, 12), bool)
    mask[2:5, 2:5] = True
    mask[7:10, 7:11] = True
    labels = np.asarray(ccomp.connected_components(jnp.asarray(mask)))
    assert labels[0, 0] == 0
    l1 = labels[3, 3]
    l2 = labels[8, 8]
    assert l1 > 0 and l2 > 0 and l1 != l2
    assert (labels[2:5, 2:5] == l1).all()
    assert (labels[7:10, 7:11] == l2).all()


def test_connected_components_snake():
    """A winding 1-px path must end up a single component (propagation
    reaches the fixed point, not just one sweep)."""
    mask = np.zeros((10, 20), bool)
    mask[1, 1:18] = True
    mask[1:8, 17] = True
    mask[7, 3:18] = True
    mask[3:8, 3] = True
    labels = np.asarray(ccomp.connected_components(jnp.asarray(mask)))
    vals = np.unique(labels[mask])
    assert len(vals) == 1


def test_connectivity_4_vs_8():
    mask = np.zeros((6, 6), bool)
    mask[1, 1] = True
    mask[2, 2] = True  # diagonal touch
    l8 = np.asarray(ccomp.connected_components(jnp.asarray(mask), 8))
    l4 = np.asarray(ccomp.connected_components(jnp.asarray(mask), 4))
    assert l8[1, 1] == l8[2, 2]
    assert l4[1, 1] != l4[2, 2]


def test_detect_blobs_finds_dark_circles(rng):
    img = np.full((80, 100), 200.0, np.float32)

    def disk(cy, cx, r):
        yy, xx = np.mgrid[0:80, 0:100]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 30.0

    disk(20, 25, 6)
    disk(55, 70, 9)
    blobs = ccomp.detect_blobs(jnp.asarray(img), threshold=100.0, min_area=20.0)
    v = np.asarray(blobs.valid)
    xy = np.asarray(blobs.xy)[v]
    assert v.sum() == 2
    got = {tuple(np.round(p).astype(int)) for p in xy}
    assert (25, 20) in got and (70, 55) in got
    assert np.asarray(blobs.circularity)[v].min() > 0.5


def test_detect_blobs_area_filter():
    img = np.full((40, 40), 200.0, np.float32)
    img[5:7, 5:7] = 30.0  # area 4 — below min_area
    img[20:30, 20:30] = 30.0  # area 100
    blobs = ccomp.detect_blobs(jnp.asarray(img), threshold=100.0, min_area=10.0)
    assert int(np.asarray(blobs.valid).sum()) == 1
