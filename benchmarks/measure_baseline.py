"""Measure the reference OpenCV pipeline on THIS machine (BASELINE.md configs 1-3).

BASELINE.md requires reference numbers to be *generated on the eval machine*,
not copied (reference methodology: modules/ts/src/ts_perf.cpp:419 calcMetrics
min/median/gmean sampling; config definitions mirror
modules/cudafeatures2d/perf/perf_features2d.cpp:52-180 and
modules/cudaoptflow/perf/perf_optflow.cpp:54-284).

The reference tree itself (OpenCV 3.4.7 fork) cannot run its CUDA path here
(no NVIDIA GPU) and a source build on this 2-core host is impractical, so the
measured baseline is the closest available pinned OpenCV build: the `cv2`
wheel present in the image (version recorded in the output). Its CPU pipeline
is a *stronger* baseline than a 3.4.7 source build (newer SIMD dispatch), so
beating it is conservative.

Inputs are real images shipped by the reference (read-only):
  - config 1/3: aloeL/aloeR stereo pair, gray, cropped to KITTI size 376x1241
  - config 2: first 100 frames of samples/data/Megamind.avi, gray

Writes benchmarks/baselines_measured.json. Run once per machine:
    python benchmarks/measure_baseline.py
"""

import json
import os
import platform
import statistics
import time

import numpy as np

REF_DATA = "/root/reference/samples/data"
OUT = os.path.join(os.path.dirname(__file__), "baselines_measured.json")

KITTI_H, KITTI_W = 376, 1241
N_CLIP_FRAMES = 100


def _timeit(fn, min_samples=10, max_samples=50, max_seconds=30.0):
    """ts_perf-style sampling: run fn repeatedly, report min/median/gmean (s)."""
    samples = []
    t_start = time.perf_counter()
    while len(samples) < max_samples:
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
        if len(samples) >= min_samples and time.perf_counter() - t_start > max_seconds:
            break
    gmean = float(np.exp(np.mean(np.log(samples))))
    return {
        "min_s": min(samples),
        "median_s": statistics.median(samples),
        "gmean_s": gmean,
        "n_samples": len(samples),
    }


def load_pair(cv2):
    a = cv2.imread(f"{REF_DATA}/aloeL.jpg", cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(f"{REF_DATA}/aloeR.jpg", cv2.IMREAD_GRAYSCALE)
    # center crop to KITTI odometry resolution
    y0 = (a.shape[0] - KITTI_H) // 2
    x0 = (a.shape[1] - KITTI_W) // 2
    return (
        a[y0 : y0 + KITTI_H, x0 : x0 + KITTI_W].copy(),
        b[y0 : y0 + KITTI_H, x0 : x0 + KITTI_W].copy(),
    )


def load_clip(cv2, n=N_CLIP_FRAMES):
    cap = cv2.VideoCapture(f"{REF_DATA}/Megamind.avi")
    frames = []
    while len(frames) < n:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
    cap.release()
    return frames


def config1_orb_match(cv2, img0, img1):
    """ORB 2000 / 8 levels detect+describe both frames + BF-Hamming 2-NN."""
    orb = cv2.ORB_create(nfeatures=2000, nlevels=8)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)

    def run():
        kp0, d0 = orb.detectAndCompute(img0, None)
        kp1, d1 = orb.detectAndCompute(img1, None)
        bf.knnMatch(d0, d1, k=2)

    stats = _timeit(run)
    # two frames pass through detect+describe per run
    stats["frames_per_s_median"] = 2.0 / stats["median_s"]
    stats["frames_per_s_best"] = 2.0 / stats["min_s"]
    return stats


def config2_pyrlk_clip(cv2, frames):
    """GFTT 2000 + pyramidal LK (21x21 win, 3 levels) chained over the clip."""
    lk_params = dict(
        winSize=(21, 21),
        maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )

    def detect(img):
        p = cv2.goodFeaturesToTrack(
            img, maxCorners=2000, qualityLevel=0.01, minDistance=7
        )
        return np.empty((0, 1, 2), np.float32) if p is None else p

    def run():
        pts = detect(frames[0])
        prev = frames[0]
        for cur in frames[1:]:
            if len(pts) >= 1:
                nxt, st, _ = cv2.calcOpticalFlowPyrLK(
                    prev, cur, pts, None, **lk_params
                )
                pts = nxt[st.ravel() == 1].reshape(-1, 1, 2)
            if len(pts) < 500:
                pts = detect(cur)
            prev = cur

    stats = _timeit(run, min_samples=5, max_samples=20)
    stats["frames_per_s_median"] = len(frames) / stats["median_s"]
    stats["frames_per_s_best"] = len(frames) / stats["min_s"]
    return stats


def config3_two_view(cv2, img0, img1):
    """RANSAC E + recoverPose + triangulation + PnP odometry on the pair."""
    orb = cv2.ORB_create(nfeatures=2000, nlevels=8)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    kp0, d0 = orb.detectAndCompute(img0, None)
    kp1, d1 = orb.detectAndCompute(img1, None)
    knn = bf.knnMatch(d0, d1, k=2)
    good = [m for m, n in knn if m.distance < 0.75 * n.distance]
    p0 = np.float32([kp0[m.queryIdx].pt for m in good])
    p1 = np.float32([kp1[m.trainIdx].pt for m in good])
    K = np.array(
        [[718.856, 0, KITTI_W / 2.0], [0, 718.856, KITTI_H / 2.0], [0, 0, 1]],
        dtype=np.float64,
    )

    def run():
        E, mask = cv2.findEssentialMat(
            p0, p1, K, method=cv2.RANSAC, prob=0.999, threshold=1.0
        )
        _, R, t, mask2 = cv2.recoverPose(E, p0, p1, K, mask=mask.copy())
        inl = mask2.ravel() > 0
        P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P1 = K @ np.hstack([R, t])
        X = cv2.triangulatePoints(P0, P1, p0[inl].T, p1[inl].T)
        X3 = (X[:3] / X[3]).T.astype(np.float32)
        cv2.solvePnPRansac(
            X3, p1[inl], K, None, flags=cv2.SOLVEPNP_EPNP, reprojectionError=2.0
        )

    stats = _timeit(run)
    stats["pairs_per_s_median"] = 1.0 / stats["median_s"]
    stats["n_matches"] = int(len(good))
    return stats


def main():
    import cv2

    img0, img1 = load_pair(cv2)
    frames = load_clip(cv2)

    results = {
        "machine": {
            "platform": platform.platform(),
            "cpu_count": os.cpu_count(),
            "cv2_version": cv2.__version__,
            "cv2_threads": cv2.getNumThreads(),
            "note": (
                "reference pipeline measured on eval-machine host CPU via the "
                "pinned cv2 wheel; reference CUDA path unavailable (no NVIDIA "
                "GPU on this host)"
            ),
        },
        "config1_orb2000_8lvl_match": config1_orb_match(cv2, img0, img1),
        "config2_pyrlk_clip100": config2_pyrlk_clip(cv2, frames),
        "config3_two_view_odometry": config3_two_view(cv2, img0, img1),
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
