"""Mean-shift segmentation + circles-grid detection tests."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.ops import distance
from opencv_tpu.ops.chessboard import find_circles_grid


def test_mean_shift_segmentation_three_regions(rng):
    img = np.empty((48, 60), np.float32)
    img[:, :20] = 40.0
    img[:, 20:40] = 120.0
    img[:, 40:] = 220.0
    img += rng.normal(0, 3.0, img.shape).astype(np.float32)
    labels, seg = distance.mean_shift_segmentation(
        jnp.asarray(img), spatial_radius=3, range_radius=25.0, min_size=10
    )
    labels = np.asarray(labels)
    seg = np.asarray(seg)
    # three dominant labels, one per band
    l0 = np.bincount(labels[:, 5:15].reshape(-1)).argmax()
    l1 = np.bincount(labels[:, 25:35].reshape(-1)).argmax()
    l2 = np.bincount(labels[:, 45:55].reshape(-1)).argmax()
    assert len({l0, l1, l2}) == 3
    assert abs(seg[:, 5:15].mean() - 40.0) < 8.0
    assert abs(seg[:, 45:55].mean() - 220.0) < 8.0


def _grid_image(cols, rows, step=24, r=6, jitter=0.0, rng=None, angle=0.0):
    h = rows * step + 40
    w = cols * step + 40
    img = np.full((h, w), 220.0, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    centers = []
    c, s = np.cos(angle), np.sin(angle)
    for i in range(rows):
        for j in range(cols):
            x = 20 + j * step + (rng.uniform(-jitter, jitter) if jitter else 0)
            y = 20 + i * step + (rng.uniform(-jitter, jitter) if jitter else 0)
            # rotate about image center
            cx, cy = w / 2, h / 2
            xr = c * (x - cx) - s * (y - cy) + cx
            yr = s * (x - cx) + c * (y - cy) + cy
            img[(yy - yr) ** 2 + (xx - xr) ** 2 <= r * r] = 30.0
            centers.append((xr, yr))
    return img, np.asarray(centers, np.float32)


def test_find_circles_grid_axis_aligned(rng):
    img, truth = _grid_image(5, 4, rng=rng, jitter=0.8)
    pts, ok = find_circles_grid(jnp.asarray(img), (5, 4))
    assert ok
    # every detected center matches a true center within 2 px
    d = np.linalg.norm(pts[:, None] - truth[None], axis=-1)
    assert d.min(axis=1).max() < 2.0
    # row-major ordering: consecutive points in a row are ~step apart
    row0 = pts[:5]
    gaps = np.linalg.norm(np.diff(row0, axis=0), axis=1)
    assert np.allclose(gaps, gaps[0], atol=3.0)


def test_find_circles_grid_reports_failure(rng):
    img = np.full((80, 100), 200.0, np.float32)
    img += rng.normal(0, 3, img.shape).astype(np.float32)
    _, ok = find_circles_grid(jnp.asarray(img), (5, 4))
    assert not ok
