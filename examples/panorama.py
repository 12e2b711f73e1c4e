"""Multi-image panorama stitching demo (analog of the reference's
samples/cpp/stitching.cpp driving cv::Stitcher).

Renders three pure-rotation views of a synthetic scene, estimates focal
+ rotations (autocalib -> MST -> ray bundle adjustment), and composes a
seam-blended spherical panorama. Writes panorama.png.

Run: python examples/panorama.py [--cpu]
"""

import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--out", default="panorama.png")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from opencv_tpu.core import imgproc  # noqa: E402
from opencv_tpu.geometry.rotation import rodrigues  # noqa: E402
from opencv_tpu.io.image import imwrite  # noqa: E402
from opencv_tpu.stitching import global_stitch as gs  # noqa: E402

F, H, W = 200.0, 160, 200


def render_views():
    rng = np.random.default_rng(3)
    ts = 720
    tex = rng.uniform(30, 225, (ts // 8, ts // 8)).astype(np.float32)
    tex = np.asarray(imgproc.resize_bilinear(jnp.asarray(tex), ts, ts))
    span = 1.8
    S = np.array([[ts / (2 * span), 0, ts / 2],
                  [0, ts / (2 * span), ts / 2], [0, 0, 1]])
    K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]])
    views = []
    for yaw in (-0.45, 0.0, 0.45):
        R = np.asarray(rodrigues(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
        M = S @ np.linalg.inv(K @ R)
        views.append(np.asarray(imgproc.warp_perspective(
            jnp.asarray(tex), jnp.asarray(M, jnp.float32), H, W)))
    return views


def main():
    views = render_views()
    R, f, diag = gs.estimate_panorama(views, n_features=700, seed=1)
    print(f"estimated focal: {f:.1f} (true {F}); "
          f"{len(diag['edges'])} confident pairs, tree {diag['tree']}")
    pano = gs.stitch_panorama(views, n_features=700, seed=1, blend_bands=2)
    imwrite(args.out, pano)
    print(f"panorama {pano.shape[1]}x{pano.shape[0]} -> {args.out}")


if __name__ == "__main__":
    main()
