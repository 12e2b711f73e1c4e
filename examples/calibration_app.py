"""Calibration application (analog of the reference's
apps/interactive-calibration tool, headless): synthesize chessboard
views at varied poses, detect the corner grid in each IMAGE, calibrate,
report per-view reprojection quality, drop the worst frames and
re-calibrate — the interactive tool's frame-filtering loop
(apps/interactive-calibration/calibController.cpp) without the GUI.

Run: python examples/calibration_app.py [--cpu] [--views N] [--noise PX]
"""

import argparse
import sys

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--views", type=int, default=8)
parser.add_argument("--noise", type=float, default=0.0,
                    help="extra gaussian pixel noise on the images")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from opencv_tpu.core import imgproc  # noqa: E402
from opencv_tpu.geometry import calibration  # noqa: E402
from opencv_tpu.geometry.rotation import rodrigues  # noqa: E402
from opencv_tpu.ops.chessboard import find_chessboard_corners  # noqa: E402

COLS, ROWS = 7, 5
SQ = 40
H, W = 480, 640
F = 520.0
K_GT = np.array([[F, 0, W / 2 + 6], [0, F * 1.01, H / 2 - 4], [0, 0, 1]])
SQUARE_WORLD = 0.1


def board_image():
    bw, bh = (COLS + 1) * SQ, (ROWS + 1) * SQ
    board = np.full((bh + 2 * SQ, bw + 2 * SQ), 210.0, np.float32)
    for i in range(ROWS + 1):
        for j in range(COLS + 1):
            if (i + j) % 2 == 0:
                board[SQ * (i + 1):SQ * (i + 2),
                      SQ * (j + 1):SQ * (j + 2)] = 30.0
    return board, bw, bh


def render_view(board, bw, bh, rvec, tvec):
    R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)), np.float64)
    s = SQUARE_WORLD / SQ
    T = np.array([[s, 0, -(bw / 2 + SQ) * s],
                  [0, s, -(bh / 2 + SQ) * s], [0, 0, 1]])
    Hom = K_GT @ np.column_stack([R[:, 0], R[:, 1], tvec]) @ T
    img = np.asarray(imgproc.warp_perspective(
        jnp.asarray(board), jnp.asarray(np.linalg.inv(Hom), jnp.float32),
        H, W,
    ))
    return img


def main():
    rng = np.random.default_rng(0)
    board, bw, bh = board_image()
    obj = np.zeros((ROWS * COLS, 3), np.float32)
    jj, ii = np.meshgrid(np.arange(COLS), np.arange(ROWS))
    obj[:, 0] = jj.reshape(-1) * SQUARE_WORLD
    obj[:, 1] = ii.reshape(-1) * SQUARE_WORLD

    img_pts = []
    for v in range(args.views):
        rvec = rng.uniform(-0.35, 0.35, 3).astype(np.float32)
        tvec = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.15, 0.15),
                         rng.uniform(2.1, 2.9)])
        img = render_view(board, bw, bh, rvec, tvec)
        if args.noise > 0:
            img = img + rng.normal(0, args.noise, img.shape)
        corners = find_chessboard_corners(jnp.asarray(
            np.clip(img, 0, 255).astype(np.float32)), (COLS, ROWS))
        if corners is None:
            print(f"view {v}: board NOT found — skipped")
            continue
        img_pts.append(np.asarray(corners))
        print(f"view {v}: grid found")
    if len(img_pts) < 4:
        print("not enough views")
        return 1

    def run_calib(pts):
        res = calibration.calibrate_camera(
            np.stack([obj] * len(pts)), np.stack(pts)
        )
        return res

    res = run_calib(img_pts)
    print(f"\ncalibration over {len(img_pts)} views: RMS = {res.rms:.3f} px")
    print(f"  fx {res.K[0,0]:.1f} (gt {K_GT[0,0]:.1f})  "
          f"fy {res.K[1,1]:.1f} (gt {K_GT[1,1]:.1f})")
    print(f"  cx {res.K[0,2]:.1f} (gt {K_GT[0,2]:.1f})  "
          f"cy {res.K[1,2]:.1f} (gt {K_GT[1,2]:.1f})")

    # interactive-calibration's frame filter: drop the worst-residual
    # view and re-calibrate when it improves RMS
    per_view = []
    for v, pts in enumerate(img_pts):
        K4 = jnp.asarray(
            [res.K[0, 0], res.K[1, 1], res.K[0, 2], res.K[1, 2]]
        )
        uv = calibration.project_points_full(
            jnp.asarray(res.rvecs[v]), jnp.asarray(res.tvecs[v]),
            K4, jnp.asarray(res.dist), jnp.asarray(obj),
        )
        per_view.append(float(np.linalg.norm(
            np.asarray(uv) - pts, axis=1).mean()))
    worst = int(np.argmax(per_view))
    print(f"per-view mean reproj error: "
          f"{[round(e, 3) for e in per_view]} -> dropping view {worst}")
    res2 = run_calib([p for i, p in enumerate(img_pts) if i != worst])
    print(f"re-calibrated over {len(img_pts)-1} views: RMS = {res2.rms:.3f} px")

    best = res2 if res2.rms < res.rms else res
    ok = (best.rms < 0.8
          and abs(best.K[0, 0] - K_GT[0, 0]) < 0.03 * K_GT[0, 0]
          and abs(best.K[1, 1] - K_GT[1, 1]) < 0.03 * K_GT[1, 1])
    print("OK" if ok else "DEGRADED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
