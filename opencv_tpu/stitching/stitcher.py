"""Two-image (extendable) panorama stitcher.

Reference pipeline (stitching/src/stitcher.cpp:122-148 estimateTransform
-> composePanorama): feature match -> homography RANSAC -> warp onto a
common canvas -> blend. This is the minimal planar/rotational pipeline;
the bundle-adjusted multi-camera path shares optim/ba.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import MatchConfig, ORBConfig, RansacConfig
from opencv_tpu.geometry import homography as hom
from opencv_tpu.ops import matching, orb
from opencv_tpu.stitching.blend import feather_blend


def stitch_pair(
    img0: np.ndarray,
    img1: np.ndarray,
    seed: int = 0,
    n_features: int = 1000,
    blend: str = "feather",
) -> np.ndarray:
    """Stitch img1 onto img0's frame; returns the composite canvas."""
    j0 = jnp.asarray(img0, jnp.float32)
    j1 = jnp.asarray(img1, jnp.float32)
    cfg = ORBConfig(n_features=n_features, n_levels=4)
    kp0, d0 = orb.detect_and_compute(j0, cfg)
    kp1, d1 = orb.detect_and_compute(j1, cfg)
    m = matching.knn_match(d0, d1, query_valid=kp0.valid, train_valid=kp1.valid,
                           config=MatchConfig())
    res = hom.find_homography_ransac(
        jax.random.PRNGKey(seed),
        kp1.xy[m.train_idx], kp0.xy[m.query_idx],  # maps img1 -> img0 coords
        valid=m.valid,
        cfg=RansacConfig(n_hypotheses=1024, threshold=3.0),
    )
    H10 = np.asarray(res.model, np.float64)  # x0 ~ H10 x1

    # canvas bounds: img0 plus img1's warped corners
    h0, w0 = img0.shape
    h1, w1 = img1.shape
    corners = np.array(
        [[0, 0, 1], [w1, 0, 1], [0, h1, 1], [w1, h1, 1]], np.float64
    ).T
    wc = H10 @ corners
    wc = wc[:2] / wc[2]
    x_min = min(0.0, wc[0].min())
    y_min = min(0.0, wc[1].min())
    x_max = max(float(w0), wc[0].max())
    y_max = max(float(h0), wc[1].max())
    out_w = int(np.ceil(x_max - x_min))
    out_h = int(np.ceil(y_max - y_min))
    # translation putting the canvas origin at (x_min, y_min)
    T = np.array([[1, 0, -x_min], [0, 1, -y_min], [0, 0, 1]], np.float64)

    # warp_perspective takes the output->input map
    M0 = np.linalg.inv(T)
    M1 = np.linalg.inv(T @ H10)
    w0_img = imgproc.warp_perspective(j0, jnp.asarray(M0, jnp.float32), out_h, out_w)
    w1_img = imgproc.warp_perspective(j1, jnp.asarray(M1, jnp.float32), out_h, out_w)
    ones0 = imgproc.warp_perspective(jnp.ones_like(j0), jnp.asarray(M0, jnp.float32), out_h, out_w)
    ones1 = imgproc.warp_perspective(jnp.ones_like(j1), jnp.asarray(M1, jnp.float32), out_h, out_w)
    m0 = ones0 > 0.5
    m1 = ones1 > 0.5
    if blend == "feather":
        out = feather_blend([w0_img, w1_img], [m0, m1])
    else:
        out = jnp.where(m0, w0_img, w1_img)
    return np.asarray(out)
