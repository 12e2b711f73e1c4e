"""Tracking-by-detection application (analog of samples/gpu/tbd.cpp, the
fork's flagship sample).

Frame loop: obtain detections (ground-truth boxes, like the reference's
`--use_gt` mode, or a HOG detector with user-supplied SVM weights) ->
per-class tbd::Tracker step -> MOT metrics + per-phase FPS (mirrors the
reference's hogWorkFps / frame FPS overlays, tbd.cpp:1123-1151).

Run: python examples/tbd_app.py [--cpu] [--frames N]
Synthetic scene: pedestrians (class 0) and vehicles (class 1) moving
with constant velocity plus noise; detections are jittered GT boxes with
dropouts — the stale/noisy-detection regime the ISORC'20 paper studies.
"""

import argparse
import sys
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--frames", type=int, default=60)
parser.add_argument("--drop_rate", type=float, default=0.15)
parser.add_argument(
    "--history_distribution", default="1",
    help="comma-separated distribution over the AGE of the track state "
    "fed to each tracking step (e.g. '7,3' = 0.7 chance of the prior "
    "frame's tracks, 0.3 of two frames back) — the ISORC'20 "
    "stale-state experiment (tbd.cpp:173,645-704)",
)
parser.add_argument(
    "--num_tracking_iters", type=int, default=1,
    help="repeat the whole tracking experiment N times "
    "(tbd.cpp:179 --num_tracking_iters)",
)
args = parser.parse_args()
history_dist = np.array(
    [float(v) for v in args.history_distribution.split(",")], np.float64
)
history_dist = history_dist / history_dist.sum()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from opencv_tpu.tbd import MotMetrics, TbdConfig, Tracker  # noqa: E402


def gt_boxes(t):
    peds = np.array(
        [
            [20 + 3.0 * t, 40 + 0.5 * t, 14, 30],
            [300 - 2.5 * t, 60, 14, 30],
            [40 + 2.0 * t, 120, 14, 30],
        ],
        np.float32,
    )
    vehicles = np.array(
        [
            [10 + 6.0 * t, 200, 40, 24],
            [500 - 5.0 * t, 230, 44, 26],
        ],
        np.float32,
    )
    return peds, vehicles


def run_experiment(rng):
    """One full tracking pass (the reference repeats this
    --num_tracking_iters times, tbd.cpp:498). The history-distribution
    machinery mirrors tbd.cpp:629-706: per frame, sample an AGE from the
    distribution, feed the tracker the track state stored that many
    frames ago (from a ring buffer), step, store the result."""
    ped_tracker = Tracker(TbdConfig())
    veh_tracker = Tracker(TbdConfig())
    ped_metrics = MotMetrics()
    veh_metrics = MotMetrics()
    hlen = len(history_dist)
    ped_buf = [None] * hlen  # ring buffers of track snapshots
    veh_buf = [None] * hlen
    history_ages = []

    t_track = 0.0
    for t in range(args.frames):
        peds, vehicles = gt_boxes(t)
        # jittered detections with dropouts (stale-detection experiment)
        def detect(gt):
            keep = rng.random(len(gt)) > args.drop_rate
            return gt[keep] + rng.normal(0, 0.8, (keep.sum(), 4)).astype(np.float32)

        det_p, det_v = detect(peds), detect(vehicles)

        # sample the history age (tbd.cpp:650-662); age 1 = previous frame
        age = int(rng.choice(hlen, p=history_dist)) + 1
        history_ages.append(age)
        t0 = time.time()
        if hlen > 1:
            if t >= age and ped_buf[(t - age) % hlen] is not None:
                ped_tracker.set_tracks(ped_buf[(t - age) % hlen])
                veh_tracker.set_tracks(veh_buf[(t - age) % hlen])
            else:
                ped_tracker.reset()
                veh_tracker.reset()
        conf_p = ped_tracker.step(det_p)
        conf_v = veh_tracker.step(det_v)
        if hlen > 1:
            ped_buf[t % hlen] = ped_tracker.get_tracks()
            veh_buf[t % hlen] = veh_tracker.get_tracks()
        t_track += time.time() - t0
        if t >= 5:
            if conf_p:
                ped_metrics.update(np.stack([tr.bbox for tr in conf_p]), peds)
            if conf_v:
                veh_metrics.update(np.stack([tr.bbox for tr in conf_v]), vehicles)
    return ped_metrics, veh_metrics, t_track, history_ages


def main():
    rng = np.random.default_rng(0)
    t0_all = time.time()
    for it in range(args.num_tracking_iters):
        ped_metrics, veh_metrics, t_track, history_ages = run_experiment(rng)
        if args.num_tracking_iters > 1:
            print(f"iter {it}: tracking-only "
                  f"{args.frames / max(t_track, 1e-9):.1f} FPS")
    wall = time.time() - t0_all
    if len(history_dist) > 1:
        counts = np.bincount(history_ages, minlength=len(history_dist) + 1)
        print("history ages used:",
              {a: int(c) for a, c in enumerate(counts) if a >= 1})

    print(f"frames: {args.frames}  total {wall:.2f}s "
          f"({args.frames / wall:.1f} FPS, tracking-only {args.frames / max(t_track, 1e-9):.1f} FPS)")
    print(f"pedestrians: MOTA={ped_metrics.mota:.3f} MOTP={ped_metrics.motp:.3f} "
          f"TP={ped_metrics.tp} FP={ped_metrics.fp} FN={ped_metrics.fn}")
    print(f"vehicles:    MOTA={veh_metrics.mota:.3f} MOTP={veh_metrics.motp:.3f} "
          f"TP={veh_metrics.tp} FP={veh_metrics.fp} FN={veh_metrics.fn}")
    ok = ped_metrics.mota > 0.8 and veh_metrics.mota > 0.8
    print("OK" if ok else "DEGRADED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
