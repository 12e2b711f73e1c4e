"""Hough circles + generalized Hough tests (cudaimgproc hough_circles /
generalized_hough analogs)."""

import numpy as np

import jax.numpy as jnp

from opencv_tpu.ops import hough


def _disk_image(circles, h=128, w=160, bg=30.0, fg=200.0):
    img = np.full((h, w), bg, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for cx, cy, r in circles:
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = fg
    return img


def test_hough_circles_finds_planted_disks():
    planted = [(40, 40, 12), (110, 70, 18), (60, 100, 9)]
    img = _disk_image(planted)
    res = hough.hough_circles(
        jnp.asarray(img), min_radius=6, max_radius=24,
        acc_threshold=12.0, min_dist=12, max_circles=8,
    )
    xyr = np.asarray(res.xyr)[np.asarray(res.valid)]
    assert len(xyr) >= 3
    for cx, cy, r in planted:
        d = np.linalg.norm(xyr[:, :2] - [cx, cy], axis=1)
        k = np.argmin(d)
        assert d[k] < 3.0, (cx, cy, xyr)
        assert abs(xyr[k, 2] - r) <= 2.0, (r, xyr[k])


def test_generalized_hough_locates_template():
    # template: an L-shaped corner structure
    t = np.full((40, 40), 20.0, np.float32)
    t[8:32, 8:14] = 220.0
    t[26:32, 8:30] = 220.0
    # scene: template pasted at a known offset + distractor blob
    img = np.full((120, 150), 20.0, np.float32)
    oy, ox = 50, 80
    img[oy:oy + 40, ox:ox + 40] = t
    img[15:25, 15:25] = 220.0
    table = hough.build_r_table(jnp.asarray(t), n_bins=24, cap=48)
    det = hough.generalized_hough(
        jnp.asarray(img), table, vote_threshold=40.0, max_detections=4,
    )
    xy = np.asarray(det.xy)[np.asarray(det.valid)]
    assert len(xy) >= 1
    want = np.array([ox + 19.5, oy + 19.5])
    d = np.linalg.norm(xy - want, axis=1).min()
    assert d < 4.0, (xy, want)


def test_generalized_hough_rotation_grid():
    t = np.full((40, 40), 20.0, np.float32)
    t[8:32, 8:14] = 220.0
    t[26:32, 8:30] = 220.0
    # rotate the template 90 degrees and paste
    tr = np.rot90(t).copy()
    img = np.full((120, 150), 20.0, np.float32)
    oy, ox = 40, 60
    img[oy:oy + 40, ox:ox + 40] = tr
    table = hough.build_r_table(jnp.asarray(t), n_bins=24, cap=48)
    angles = (0.0, np.pi / 2, np.pi, 3 * np.pi / 2)
    det = hough.generalized_hough(
        jnp.asarray(img), table, vote_threshold=40.0, max_detections=4,
        angles=angles,
    )
    valid = np.asarray(det.valid)
    assert valid.any()
    xy = np.asarray(det.xy)[valid]
    ang = np.asarray(det.angle)[valid]
    want = np.array([ox + 19.5, oy + 19.5])
    k = np.argmin(np.linalg.norm(xy - want, axis=1))
    assert np.linalg.norm(xy[k] - want) < 4.0
    assert min(abs(ang[k] - np.pi / 2), abs(ang[k] - 3 * np.pi / 2)) < 1e-6
