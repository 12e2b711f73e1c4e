"""Segmentation + tracking showcase (analog of the reference's
samples/cpp/{grabcut.cpp,watershed.cpp,camshiftdemo.cpp} trio, headless):
GrabCut foreground extraction, marker watershed, and a CamShift track
over a synthetic moving blob — all through the installed package.

Run: python examples/segmentation_demo.py [--cpu]
"""

import argparse
import sys

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from opencv_tpu.ops import camshift, grabcut, watershed  # noqa: E402


def main():
    rng = np.random.default_rng(0)

    # ---- GrabCut: red-ish blob on green ground
    h, w = 70, 90
    img = np.zeros((h, w, 3), np.float32)
    img[..., 1] = 120
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((xx - 45) ** 2 / 400 + (yy - 35) ** 2 / 250) < 1
    img[blob] = [40, 40, 200]
    img += rng.normal(0, 6.0, img.shape).astype(np.float32)
    mask = np.asarray(
        grabcut.grab_cut(jnp.asarray(np.clip(img, 0, 255)),
                         rect=(18, 10, 58, 52), iter_count=4)
    )
    fg = mask % 2 == 1
    iou = (fg & blob).sum() / max((fg | blob).sum(), 1)
    print(f"grabcut: fg={int(fg.sum())} px, IoU vs truth = {iou:.3f}")

    # ---- watershed: two basins
    surface = 100 - 80 * np.exp(-((xx - 25) ** 2) / 200) \
        - 80 * np.exp(-((xx - 65) ** 2) / 200)
    markers = np.zeros((h, w), np.int32)
    markers[30:34, 20:28] = 1
    markers[30:34, 60:68] = 2
    labels = np.asarray(
        watershed.watershed(jnp.asarray(surface.astype(np.float32)), markers)
    )
    sizes = {int(k): int((labels == k).sum()) for k in (1, 2)}
    print(f"watershed: basin sizes = {sizes}, dam px = {int((labels == -1).sum())}")

    # ---- CamShift: follow a bright blob across frames
    def frame(cx, cy):
        f = rng.uniform(20, 60, (120, 160)).astype(np.float32)
        m = (np.mgrid[0:120, 0:160][1] - cx) ** 2 + (
            np.mgrid[0:120, 0:160][0] - cy
        ) ** 2 < 14 ** 2
        return np.where(m, 210.0, f).astype(np.float32)

    centers = [(40 + 9 * t, 50 + 4 * t) for t in range(7)]
    frames = [frame(cx, cy) for cx, cy in centers]
    win = (25, 35, 30, 30)
    tmpl = frames[0][win[1]:win[1] + win[3], win[0]:win[0] + win[2]]
    hist = camshift.calc_hist([jnp.asarray(tmpl)], [32], [(0, 256)],
                              density=True) * 255.0
    out = camshift.track_window_sequence(
        [[jnp.asarray(f)] for f in frames[1:]], hist, [(0, 256)], win
    )
    errs = [np.hypot(b[0][0] - c[0], b[0][1] - c[1])
            for (b, _), c in zip(out, centers[1:])]
    print(f"camshift: mean center error = {np.mean(errs):.2f} px over "
          f"{len(errs)} frames")
    ok = iou > 0.8 and np.mean(errs) < 6 and sizes[1] > 500 and sizes[2] > 500
    print("OK" if ok else "DEGRADED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
