"""Demo: monocular VO on a synthetic 3D scene, end to end.

Run: python examples/vo_synthetic.py [--cpu] [--frames N]
Prints per-frame tracking state and the final Sim(3)-aligned ATE-RMSE.
"""

import argparse
import sys
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--frames", type=int, default=20)
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from opencv_tpu.core import imgproc  # noqa: E402
from opencv_tpu.core.config import ORBConfig  # noqa: E402
from opencv_tpu.geometry.rotation import rodrigues  # noqa: E402
from opencv_tpu.slam.vo import VisualOdometry, VOConfig  # noqa: E402
from opencv_tpu.utils.evaluate import ate_rmse  # noqa: E402

H, W, F = 240, 320, 260.0
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def render(world, inten, rvec, tvec):
    R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
    pc = world @ R.T + tvec
    z = pc[:, 2]
    vis = z > 0.5
    u = F * pc[:, 0] / z + W / 2
    v = F * pc[:, 1] / z + H / 2
    vis &= (u >= 2) & (u < W - 2) & (v >= 2) & (v < H - 2)
    img = np.zeros((H, W), np.float32)
    uf, vf = u[vis], v[vis]
    u0, v0 = np.floor(uf).astype(int), np.floor(vf).astype(int)
    au, av = uf - u0, vf - v0
    ii = inten[vis]
    np.add.at(img, (v0, u0), ii * (1 - au) * (1 - av))
    np.add.at(img, (v0, u0 + 1), ii * au * (1 - av))
    np.add.at(img, (v0 + 1, u0), ii * (1 - au) * av)
    np.add.at(img, (v0 + 1, u0 + 1), ii * au * av)
    img = np.asarray(imgproc.gaussian_blur(jnp.asarray(img), 5, 1.1))
    return np.clip(img * 4.0, 0, 255)


def main():
    rng = np.random.default_rng(7)
    n = 1600
    wx = rng.uniform(-6, 8, n)
    wy = rng.uniform(-4, 4, n)
    wz = (
        7.0 + 2.8 * np.sin(0.85 * wx) * np.cos(0.7 * wy)
        + 1.5 * np.cos(1.3 * wx + 0.9 * wy) + 0.35 * wx
    )
    world = np.stack([wx, wy, wz], 1).astype(np.float32)
    inten = rng.uniform(60, 255, n).astype(np.float32)

    vo = VisualOdometry(
        K,
        VOConfig(
            orb=ORBConfig(n_features=600, n_levels=3, fast_threshold=12.0),
            n_hypotheses=512,
            keyframe_min_inliers=80,
            window_size=5,
            ba_iters=8,
        ),
    )
    centers = []
    for i in range(args.frames):
        c = np.array([0.12 * i, 0.0, 0.05 * i], np.float32)
        yaw = np.deg2rad(0.3 * i)
        rvec = np.array([0.0, yaw, 0.0], np.float32)
        R = np.asarray(rodrigues(jnp.asarray(rvec)))
        tvec = (-R @ c).astype(np.float32)
        img = render(world, inten, rvec, tvec)
        t0 = time.time()
        vo.process(img)
        centers.append(c)
        print(
            f"frame {i:3d}  state={vo.state:13s} keyframes={len(vo.keyframes):2d} "
            f"landmarks={int(vo.lm_valid.sum()):4d}  ({time.time() - t0:.2f}s)"
        )
    centers = np.asarray(centers)
    traj = vo.trajectory()
    path = np.linalg.norm(np.diff(centers, axis=0), axis=1).sum()
    err = ate_rmse(traj, centers)
    print(f"\npath length {path:.3f}  ATE-RMSE (Sim3-aligned) {err:.4f} "
          f"({100 * err / path:.2f}% of path)")
    return 0 if err < 0.05 * path else 1


if __name__ == "__main__":
    sys.exit(main())
