"""ATE parity vs the reference pipeline, measured on data this box has.

BASELINE.md's north star asks for ATE-RMSE parity with the OpenCV
pipeline on KITTI/TUM; those datasets are unreachable here (documented in
tests/test_vo_real_video.py), but cv2 5.0.0 IS installed and the repo
renders real-textured sequences with exact ground truth (utils/synth.py).
So: render two sequences (pure-forward dolly, closed loop orbit), run

  (a) the reference pipeline via cv2 — a monocular VO built from the
      EXACT call chain of the reference sources: ORB detect+describe
      (features2d/src/orb.cpp:965) -> BFMatcher ratio kNN
      (features2d/src/matchers.cpp:749) -> findEssentialMat RANSAC
      (calib3d/src/five-point.cpp:405) -> recoverPose (:461) ->
      triangulatePoints (calib3d/src/triangulate.cpp:346) ->
      solvePnPRansac per frame (calib3d/src/solvepnp.cpp:196) with the
      final all-inlier refine (:312);
  (b) the repo's own engine (opencv_tpu.slam.vo.VisualOdometry)

on IDENTICAL frames, and score both with Sim(3)-aligned ATE-RMSE
(utils/evaluate.py) against the renderer's exact camera centers.

Writes benchmarks/ate_parity.json. The parity assertion lives in
tests/test_ate_parity.py (repo ATE <= 1.25x cv2 ATE on the forward
sequence). Full-size run: `python benchmarks/ate_parity.py` (TPU or CPU);
`--small` renders the reduced shapes the test uses.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_DATA = "/root/reference/samples/data"


# --------------------------------------------------------------- scenes


def _load_gray(name):
    from PIL import Image

    return np.asarray(Image.open(f"{REF_DATA}/{name}").convert("L"), np.float32)


def make_camera(h, w):
    f = 0.82 * w  # ~ KITTI-like FOV
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)


def render_forward(h, w, n_frames):
    """Pure-forward/lateral dolly through a two-plane photo-textured
    scene: the monocular odometry workload with no loop."""
    from opencv_tpu.utils.synth import (
        dolly_trajectory,
        render_sequence,
        two_plane_scene,
    )

    K = make_camera(h, w)
    planes = two_plane_scene(
        _load_gray("baboon.jpg"), _load_gray("fruits.jpg")
    )
    traj = dolly_trajectory(n_frames, step_x=0.055, step_z=0.02,
                            yaw_per_frame_deg=0.12)
    frames, gt = render_sequence(
        None, K, h, w, n_frames=n_frames, planes=planes, trajectory=traj
    )
    return frames, gt, K


def render_loop(h, w, n_frames):
    """Closed orbit inside a photo-textured prism: drift accumulates all
    the way around; only a loop closure can cancel it."""
    from opencv_tpu.utils.synth import (
        circle_trajectory,
        prism_scene,
        render_sequence,
    )

    K = make_camera(h, w)
    texs = [
        _load_gray(n)
        for n in ("baboon.jpg", "fruits.jpg", "building.jpg", "board.jpg",
                  "lena.jpg", "sudoku.png")
    ]
    planes = prism_scene(texs, n_walls=12, radius=9.0)
    traj = circle_trajectory(n_frames=n_frames, radius=3.2, closed=True)
    frames, gt = render_sequence(
        None, K, h, w, n_frames=n_frames, planes=planes, trajectory=traj
    )
    return frames, gt, K


# ------------------------------------------------- cv2 reference pipeline


class Cv2MonoVO:
    """Monocular VO assembled from the reference's own call chain (cites
    in the module docstring). Map = 3D landmarks + ORB descriptors;
    per-frame solvePnPRansac; keyframe triangulation extends the map."""

    def __init__(self, K, n_features=2000, ratio=0.75,
                 min_pnp_inliers=15, kf_inlier_floor=80):
        import cv2

        self.cv2 = cv2
        self.K = np.asarray(K, np.float64)
        self.orb = cv2.ORB_create(nfeatures=n_features, nlevels=8)
        self.bf = cv2.BFMatcher(cv2.NORM_HAMMING)
        self.ratio = ratio
        self.min_pnp_inliers = min_pnp_inliers
        self.kf_inlier_floor = kf_inlier_floor
        self.poses: list[tuple[np.ndarray, np.ndarray]] = []  # (R, t) w->c
        self.map_pts = np.zeros((0, 3))
        self.map_desc = np.zeros((0, 32), np.uint8)
        self.kf = None  # (xy, desc, R, t)
        self.state = "init"
        self.f0 = None

    # -- primitives ------------------------------------------------

    def _detect(self, img):
        kps, desc = self.orb.detectAndCompute(img, None)
        if desc is None or len(kps) == 0:
            return np.zeros((0, 2)), np.zeros((0, 32), np.uint8)
        return np.array([k.pt for k in kps], np.float64), desc

    def _ratio_match(self, d0, d1):
        if len(d0) < 2 or len(d1) < 2:
            return np.zeros((0, 2), int)
        out = []
        for p in self.bf.knnMatch(d0, d1, k=2):
            if len(p) == 2 and p[0].distance < self.ratio * p[1].distance:
                out.append((p[0].queryIdx, p[0].trainIdx))
        return np.array(out, int).reshape(-1, 2)

    def _triangulate(self, R0, t0, R1, t1, p0, p1):
        cv2 = self.cv2
        P0 = self.K @ np.hstack([R0, t0.reshape(3, 1)])
        P1 = self.K @ np.hstack([R1, t1.reshape(3, 1)])
        X = cv2.triangulatePoints(P0, P1, p0.T, p1.T)
        X = (X[:3] / np.where(np.abs(X[3]) < 1e-12, 1e-12, X[3])).T
        z0 = (X @ R0.T + t0)[:, 2]
        z1 = (X @ R1.T + t1)[:, 2]
        # cheirality + sane depth + reprojection gate in BOTH views
        def reproj(R, t):
            pc = X @ R.T + t
            uv = (pc[:, :2] / pc[:, 2:3]) * [self.K[0, 0], self.K[1, 1]]
            return uv + [self.K[0, 2], self.K[1, 2]]

        e0 = np.linalg.norm(reproj(R0, t0) - p0, axis=1)
        e1 = np.linalg.norm(reproj(R1, t1) - p1, axis=1)
        good = (z0 > 0.1) & (z1 > 0.1) & (z0 < 120) & (e0 < 2.0) & (e1 < 2.0)
        return X, good

    # -- stages ------------------------------------------------------

    def _bootstrap(self, xy, desc):
        cv2 = self.cv2
        m = self._ratio_match(self.f0[1], desc)
        if len(m) < 50:
            return False
        p0 = self.f0[0][m[:, 0]]
        p1 = xy[m[:, 1]]
        if np.median(np.linalg.norm(p1 - p0, axis=1)) < 8.0:
            return False  # parallax gate (same pixels as the repo engine)
        E, mask = cv2.findEssentialMat(p0, p1, self.K, cv2.RANSAC, 0.999, 1.0)
        if E is None or E.shape != (3, 3):
            return False
        n, R, t, mask2 = cv2.recoverPose(E, p0, p1, self.K, mask=mask.copy())
        if n < 40:
            return False
        inl = mask2.ravel().astype(bool)
        X, good = self._triangulate(
            np.eye(3), np.zeros(3), R, t.ravel(), p0[inl], p1[inl]
        )
        if good.sum() < 30:
            return False
        self.map_pts = X[good]
        self.map_desc = desc[m[inl, 1]][good]
        self.kf = (xy, desc, R, t.ravel())
        self.poses.append((R, t.ravel()))
        self.state = "tracking"
        return True

    def _track(self, xy, desc):
        cv2 = self.cv2
        m = self._ratio_match(desc, self.map_desc)
        if len(m) < self.min_pnp_inliers:
            return None
        obj = self.map_pts[m[:, 1]]
        imgp = xy[m[:, 0]]
        ok, rvec, tvec, inl = cv2.solvePnPRansac(
            obj, imgp, self.K, None, iterationsCount=300,
            reprojectionError=2.0, confidence=0.999,
            flags=cv2.SOLVEPNP_EPNP,
        )
        if not ok or inl is None or len(inl) < self.min_pnp_inliers:
            return None
        # the reference's final all-inlier refine (solvepnp.cpp:312)
        rvec, tvec = cv2.solvePnPRefineLM(
            obj[inl.ravel()], imgp[inl.ravel()], self.K, None, rvec, tvec
        )
        R = cv2.Rodrigues(rvec)[0]
        return R, tvec.ravel(), len(inl)

    def _extend_map(self, xy, desc, R, t):
        kxy, kdesc, kR, kt = self.kf
        m = self._ratio_match(kdesc, desc)
        if len(m) < 20:
            return
        X, good = self._triangulate(kR, kt, R, t, kxy[m[:, 0]], xy[m[:, 1]])
        if good.sum() == 0:
            return
        self.map_pts = np.concatenate([self.map_pts, X[good]])
        self.map_desc = np.concatenate([self.map_desc, desc[m[good, 1]]])
        if len(self.map_pts) > 16000:  # keep the freshest landmarks
            self.map_pts = self.map_pts[-16000:]
            self.map_desc = self.map_desc[-16000:]
        self.kf = (xy, desc, R, t)

    def process(self, img):
        img = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        xy, desc = self._detect(img)
        if self.state == "init":
            if self.f0 is None:
                if len(xy) >= 100:
                    self.f0 = (xy, desc)
                self.poses.append((np.eye(3), np.zeros(3)))
                return
            if not self._bootstrap(xy, desc):
                self.poses.append(self.poses[-1])
            return
        out = self._track(xy, desc)
        if out is None:
            self.poses.append(self.poses[-1])  # hold last pose
            return
        R, t, n_inl = out
        self.poses.append((R, t))
        if n_inl < self.kf_inlier_floor:
            self._extend_map(xy, desc, R, t)

    def trajectory(self):
        return np.stack([-(R.T @ t) for (R, t) in self.poses])


def run_cv2_vo(frames, K, n_features=2000):
    vo = Cv2MonoVO(K, n_features=n_features)
    for f in frames:
        vo.process(f)
    return vo.trajectory()


# -------------------------------------------------------- repo pipeline


def run_repo_vo(frames, K, n_features=2000, enable_loop=True):
    from opencv_tpu.core.config import ORBConfig
    from opencv_tpu.slam.vo import VisualOdometry, VOConfig

    vo = VisualOdometry(
        K,
        VOConfig(
            orb=ORBConfig(n_features=n_features),
            enable_loop_closure=enable_loop,
        ),
    )
    traj = vo.process_sequence(np.asarray(frames), chunk=8)
    return traj, vo


# ------------------------------------------------------------------ main


def _shapes(small):
    if small:
        return 240, 320, 100, 100
    return 480, 640, 200, 220


def _render(seq, small):
    h, w, n_fwd, n_loop = _shapes(small)
    if seq == "forward_dolly":
        return render_forward(h, w, n_fwd)
    return render_loop(h, w, n_loop)


def run_one(seq, pipeline, small, out_path):
    """Child-process entry: render the sequence (deterministic), run ONE
    pipeline, dump {traj, ate, wall_s}. Process isolation exists because
    a 640x480 engine's program set exhausts XLA:CPU's LLVM JIT section
    memory when stacked with a second engine run in one process (the
    known crash documented in COVERAGE.md)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OPENCV_TPU_CACHE",
                       os.path.expanduser("~/.cache/opencv_tpu_jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if pipeline == "cv2" or small:
        # the cv2 child only needs jnp for rendering; the SMALL repo
        # config fits the CPU lane (the slow test uses it). The
        # FULL-SIZE repo engine runs on the TPU: at 640x480 its program
        # set exhausts XLA:CPU's LLVM JIT section memory (SIGSEGV — the
        # crash class documented in COVERAGE.md), while the TPU path
        # compiles remotely and reuses the persistent cache.
        jax.config.update("jax_platforms", "cpu")
    frames, gt, K = _render(seq, small)
    from opencv_tpu.utils.evaluate import ate_rmse

    t0 = time.time()
    if pipeline == "cv2":
        traj = run_cv2_vo(frames, K)
        extra = {}
    else:
        traj, engine = run_repo_vo(frames, K)
        extra = {
            "repo_state": engine.state,
            "repo_loop_closures": int(getattr(engine, "loop_closures", 0)),
            "repo_relocalizations": int(getattr(engine, "relocalizations", 0)),
        }
    wall = time.time() - t0
    payload = {
        "seq": seq,
        "pipeline": pipeline,
        "platform": jax.default_backend(),
        "ate": ate_rmse(traj, gt),
        "wall_s": round(wall, 1),
        "frames": int(frames.shape[0]),
        "resolution": [int(frames.shape[1]), int(frames.shape[2])],
        **extra,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)
    print(json.dumps(payload), flush=True)


def main():
    import subprocess
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced shapes (the test lane's config)")
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks",
                                                  "ate_parity.json"))
    ap.add_argument("--run-one", nargs=3, metavar=("SEQ", "PIPE", "OUT"),
                    help="internal: run one (sequence, pipeline) child")
    args = ap.parse_args()

    if args.run_one:
        seq, pipe, out = args.run_one
        run_one(seq, pipe, args.small, out)
        return

    rows = []
    for seq in ("forward_dolly", "closed_loop_orbit"):
        parts = {}
        for pipe in ("cv2", "repo"):
            with tempfile.NamedTemporaryFile(suffix=".json",
                                             delete=False) as f:
                tmp = f.name
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--run-one", seq, pipe, tmp]
            if args.small:
                cmd.append("--small")
            subprocess.run(cmd, check=True)
            with open(tmp) as f:
                parts[pipe] = json.load(f)
            os.unlink(tmp)
        row = {
            "sequence": seq,
            "frames": parts["cv2"]["frames"],
            "resolution": parts["cv2"]["resolution"],
            "ate_cv2": round(parts["cv2"]["ate"], 4),
            "ate_repo": round(parts["repo"]["ate"], 4),
            "ratio_repo_over_cv2": round(
                parts["repo"]["ate"] / max(parts["cv2"]["ate"], 1e-9), 4
            ),
            "wall_s_cv2": parts["cv2"]["wall_s"],
            "wall_s_repo": parts["repo"]["wall_s"],
            "platform_repo": parts["repo"].get("platform"),
            "repo_state": parts["repo"].get("repo_state"),
            "repo_loop_closures": parts["repo"].get("repo_loop_closures"),
            "repo_relocalizations": parts["repo"].get("repo_relocalizations"),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    payload = {
        "note": "Sim(3)-aligned ATE-RMSE, identical rendered frames, "
        "exact GT camera centers; cv2 pipeline mirrors the reference "
        "call chain (see module docstring). Units = world (scene is "
        "~18 units wide).",
        "cv2_version": __import__("cv2").__version__,
        "small": bool(args.small),
        "sequences": rows,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
