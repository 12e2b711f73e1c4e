"""Lane detection (analog of samples/gpu/lane_detection.cpp): Canny ->
Hough segment detector with the reference's parameters
(createHoughSegmentDetector(1.0, pi/180, 30, 200), lane_detection.cpp:244).

Run: python examples/lane_detection.py [--cpu]
Synthetic road: two converging lane lines + clutter.
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

from opencv_tpu.core import imgproc  # noqa: E402
from opencv_tpu.ops import edges, hough  # noqa: E402


def draw_line(img, x0, y0, x1, y1, value=220.0, thick=2):
    n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2 + 1)
    t = np.linspace(0, 1, n)
    xs = np.round(x0 + t * (x1 - x0)).astype(int)
    ys = np.round(y0 + t * (y1 - y0)).astype(int)
    for d in range(thick):
        img[np.clip(ys, 0, img.shape[0] - 1), np.clip(xs + d, 0, img.shape[1] - 1)] = value
    return img


def main():
    rng = np.random.default_rng(0)
    h, w = 240, 320
    img = rng.uniform(20, 60, size=(h, w)).astype(np.float32)
    # road: left lane (80,230)->(150,120); right lane (260,230)->(180,120)
    draw_line(img, 80, 230, 150, 120)
    draw_line(img, 260, 230, 180, 120)

    # denoise before Canny (the reference pipeline smooths the frame
    # before edge detection; raw sensor noise would dominate gradients)
    smooth = imgproc.gaussian_blur(jnp.asarray(img), 5, 1.5)
    e = edges.canny(smooth, 60, 120)
    segs = hough.hough_segments(
        e, threshold=30.0, min_line_length=60, max_line_gap=5, max_lines=16
    )
    xyxy = np.asarray(segs.xyxy)[np.asarray(segs.valid)]
    print(f"edges: {int(np.asarray(e).sum())} px, segments found: {len(xyxy)}")
    for s in xyxy[:6]:
        print("  segment", np.round(s, 1))

    def has_segment_near(x0, y0, x1, y1, tol=12):
        for s in xyxy:
            a = np.array([s[0], s[1]])
            b = np.array([s[2], s[3]])
            p = np.array([x0, y0])
            q = np.array([x1, y1])
            if (min(np.linalg.norm(a - p) + np.linalg.norm(b - q),
                    np.linalg.norm(a - q) + np.linalg.norm(b - p)) < 2 * tol):
                return True
        return False

    left = has_segment_near(80, 230, 150, 120)
    right = has_segment_near(260, 230, 180, 120)
    print(f"left lane: {'FOUND' if left else 'missed'}  "
          f"right lane: {'FOUND' if right else 'missed'}")
    return 0 if (left and right) else 1


if __name__ == "__main__":
    sys.exit(main())
