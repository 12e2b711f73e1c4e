"""Benchmarks vs the MEASURED OpenCV reference baseline (BASELINE.md configs).

Configs (mirroring benchmarks/measure_baseline.py, which records the
reference pipeline's numbers on this machine — run it once per host):

  1. ORB 2000 / 8-level detect+describe on two real frames (aloe stereo
     pair cropped to KITTI 376x1241) + BF-Hamming 2-NN matching.
  2. Pyramidal LK (21x21, 4 pyramid images) chained over the first 100
     frames of the reference's Megamind.avi clip, GFTT re-detection when
     the tracked count drops below 500 — the exact baseline loop.
  3. Two-view odometry on the pair: E-RANSAC + recoverPose +
     triangulation + PnP-RANSAC.
  4. Sliding-window BA (6 cams x 2048 pts x 12288 obs) LM iterations/s —
     the reference has no comparable solver (its BA is dense CvLevMarq,
     stitching/src/motion_estimators.cpp:221), so no vs_baseline.

Prints ONE JSON line (the config-1 headline, driver contract) on stdout;
writes ALL per-config lines to benchmarks/bench_results.json.
"""

import json
import os
import time

import numpy as np

import jax

# persistent compilation cache: the Pallas kernels cost minutes through
# the remote-compile tunnel on first build; cached runs start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("OPENCV_TPU_CACHE", os.path.expanduser("~/.cache/opencv_tpu_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
REF_DATA = "/root/reference/samples/data"
KITTI_H, KITTI_W = 376, 1241

# stand-ins used only if benchmarks/baselines_measured.json is absent on
# this host (then vs_baseline is against these and flagged "standin")
FALLBACK_BASELINE = {"config1": 32.5, "config2": 83.1, "config3": 95.0}


def load_measured_baselines():
    path = os.path.join(REPO, "benchmarks", "baselines_measured.json")
    try:
        with open(path) as f:
            m = json.load(f)
        return {
            "config1": m["config1_orb2000_8lvl_match"]["frames_per_s_median"],
            "config2": m["config2_pyrlk_clip100"]["frames_per_s_median"],
            "config3": m["config3_two_view_odometry"]["pairs_per_s_median"],
        }, True
    except Exception:
        return dict(FALLBACK_BASELINE), False


def load_pair():
    """Real two-view pair: aloe stereo crops at KITTI resolution (gray f32)."""
    from PIL import Image

    def gray(p):
        return np.asarray(Image.open(p).convert("L"), np.float32)

    a = gray(f"{REF_DATA}/aloeL.jpg")
    b = gray(f"{REF_DATA}/aloeR.jpg")
    y0 = (a.shape[0] - KITTI_H) // 2
    x0 = (a.shape[1] - KITTI_W) // 2
    return (
        a[y0 : y0 + KITTI_H, x0 : x0 + KITTI_W],
        b[y0 : y0 + KITTI_H, x0 : x0 + KITTI_W],
    )


def load_clip(n=100):
    """First n Megamind frames, gray f32 [n,H,W], decoded by the
    framework's OWN MJPEG-AVI reader from the committed transcode
    (benchmarks/data/megamind_gray.avi, provenance in
    benchmarks/reencode_clips.py). Zero cv2/ffmpeg dependency."""
    from opencv_tpu.io.video import read_mjpeg_avi

    path = os.path.join(REPO, "benchmarks", "data", "megamind_gray.avi")
    if not os.path.exists(path):
        return None
    frames = read_mjpeg_avi(path).astype(np.float32)
    return frames[:n] if frames.shape[0] >= n else None


def device_time_per_trip(run, n_iters):
    """Amortized on-device seconds per trip of jitted `run(n)`.

    block_until_ready does not reliably synchronize through the axon
    relay, so instead run N trips inside one on-device fori_loop (with a
    data dependency) and difference two trip counts.
    """
    float(run(jnp.int32(2)))  # compile (dynamic trip count -> one compile)
    t0 = time.perf_counter()
    float(run(jnp.int32(n_iters + 2)))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(jnp.int32(2)))
    tb = time.perf_counter() - t0
    return (ta - tb) / n_iters


# ---------------------------------------------------------------- config 1


def bench_config1(img0_np, img1_np):
    from opencv_tpu.core.config import MatchConfig, ORBConfig
    from opencv_tpu.ops import matching, orb

    cfg = ORBConfig(n_features=2000, n_levels=8)
    img0 = jnp.asarray(img0_np)
    img1 = jnp.asarray(img1_np)

    def frontend_pair(a, b):
        kp0, d0 = orb.detect_and_compute(a, cfg)
        kp1, d1 = orb.detect_and_compute(b, cfg)
        m = matching.knn_match(
            d0, d1, query_valid=kp0.valid, train_valid=kp1.valid,
            config=MatchConfig(),
        )
        return kp0.xy, kp1.xy, m.train_idx, m.distance, m.valid

    @jax.jit
    def run(n):
        def body(i, carry):
            out = frontend_pair(img0 * (1.0 + carry * 1e-30), img1)
            return jnp.sum(out[3]) * 1e-12

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = device_time_per_trip(run, 30)
    return 2.0 / dt  # two frames per trip


# ---------------------------------------------------------------- config 2


def bench_config2(frames_np):
    from opencv_tpu.core.config import LKConfig
    from opencv_tpu.ops import gftt, lk

    frames = jnp.asarray(frames_np)  # [F,H,W]
    n_frames = frames.shape[0]
    # static point capacity: the clip yields <= ~450 GFTT corners per
    # frame (the baseline run tracks the same ~350-450 actual points), so
    # a 512 slot budget carries the identical workload
    n_pts = 512
    lk_cfg = LKConfig(win_size=21, n_levels=4)  # = cv2 maxLevel 3

    def detect(img):
        kp = gftt.good_features_to_track(
            img, max_corners=n_pts, quality_level=0.01, min_distance=7.0
        )
        return kp.xy, kp.valid

    def clip_pass(frames):
        # each frame's pyramid + Scharr derivatives are built ONCE (the
        # reference's buildOpticalFlowPyramid reuse, lkpyramid.cpp:697),
        # vectorized over the whole clip; the scan STREAMS each frame's
        # pyramid in as xs and carries the previous frame's — no dynamic
        # slicing of the [F, ...] stacks inside the loop (24 frame-sized
        # gather copies per step otherwise)
        pyrs = jax.vmap(lambda f: lk.build_flow_pyramid(f, lk_cfg))(frames)
        xs = jax.tree.map(lambda a: a[1:], pyrs)
        pyr0 = jax.tree.map(lambda a: a[0], pyrs)

        pts0, valid0 = detect(frames[0])

        def step(carry, cur_pyr):
            pts, valid, prev_pyr = carry
            new_pts, status, _ = lk.calc_optical_flow_pyr_lk_pyr(
                prev_pyr, cur_pyr, pts, valid, lk_cfg
            )
            count = jnp.sum(status)
            pts, valid = lax.cond(
                count < 500,
                lambda: detect(cur_pyr[0][0]),
                lambda: (new_pts, status),
            )
            return (pts, valid, cur_pyr), count

        (pts, valid, _), counts = lax.scan(step, (pts0, valid0, pyr0), xs)
        return jnp.sum(pts) + jnp.sum(counts)

    @jax.jit
    def run(n):
        def body(i, carry):
            return clip_pass(frames * (1.0 + carry * 1e-30)) * 1e-12

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = device_time_per_trip(run, 3)
    return n_frames / dt


def bench_config2_batched(frames_np, chunk=11):
    """Config 2b: the same per-frame workload as config 2 (GFTT detect on
    every frame + pyramidal LK to the next), restructured for chip
    throughput: on this clip every frame re-detects (survivor count is
    always < the 500 threshold, verified below against the sequential
    semantics), so consecutive pairs carry no state and batch cleanly —
    the TPU-first shape, like config3b's vmap x8. Pairs run in chunks of
    `chunk` via scan(vmap) to bound the patch-cache working set.
    """
    from opencv_tpu.core.config import LKConfig
    from opencv_tpu.ops import gftt, lk

    frames = jnp.asarray(frames_np)  # [F,H,W]
    n_frames = frames.shape[0]
    n_pairs = n_frames - 1
    assert n_pairs % chunk == 0, "chunk must divide the pair count"
    n_pts = 512
    lk_cfg = LKConfig(win_size=21, n_levels=4)

    def detect(img):
        kp = gftt.good_features_to_track(
            img, max_corners=n_pts, quality_level=0.01, min_distance=7.0
        )
        return kp.xy, kp.valid

    def clip_pass(frames):
        pyrs = jax.vmap(lambda f: lk.build_flow_pyramid(f, lk_cfg))(frames)
        prev = jax.tree.map(lambda a: a[:-1].reshape((-1, chunk) + a.shape[1:]), pyrs)
        nxt = jax.tree.map(lambda a: a[1:].reshape((-1, chunk) + a.shape[1:]), pyrs)

        def pair_chunk(_, chunk_pyrs):
            prev_c, next_c = chunk_pyrs
            xy, valid = jax.vmap(lambda p: detect(p[0][0]))(prev_c)
            _, status, _ = jax.vmap(
                lambda a, b, x, v: lk.calc_optical_flow_pyr_lk_pyr(
                    a, b, x, v, lk_cfg
                )
            )(prev_c, next_c, xy, valid)
            return None, jnp.sum(status, axis=1)

        _, counts = lax.scan(pair_chunk, None, (prev, nxt))
        return counts.reshape(-1)

    # semantic equivalence with the sequential chain: every pair's
    # survivor count must sit under the re-detect threshold, so the
    # sequential scan would have re-detected at every frame anyway
    counts = np.asarray(jax.jit(clip_pass)(frames))
    assert counts.shape[0] == n_pairs
    assert (counts < 500).all(), "clip keeps >=500 tracks; batched config2b invalid"

    @jax.jit
    def run(n):
        def body(i, carry):
            return jnp.sum(clip_pass(frames * (1.0 + carry * 1e-30))) * 1e-12

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = device_time_per_trip(run, 3)
    return n_frames / dt


# ---------------------------------------------------------------- config 3


def bench_config3(img0_np, img1_np):
    """Two-view geometry at fixed match capacity on real matched points."""
    from opencv_tpu.core.config import MatchConfig, ORBConfig, RansacConfig
    from opencv_tpu.geometry import epipolar, pnp
    from opencv_tpu.ops import matching, orb

    cfg = ORBConfig(n_features=2000, n_levels=8)
    K = np.array(
        [[718.856, 0, KITTI_W / 2.0], [0, 718.856, KITTI_H / 2.0], [0, 0, 1]],
        np.float32,
    )

    @jax.jit
    def detect_match(a, b):
        kp0, d0 = orb.detect_and_compute(a, cfg)
        kp1, d1 = orb.detect_and_compute(b, cfg)
        m = matching.knn_match(
            d0, d1, query_valid=kp0.valid, train_valid=kp1.valid,
            config=MatchConfig(ratio=0.75),
        )
        return kp0.xy, kp1.xy, m.query_idx, m.train_idx, m.valid

    xy0, xy1, qi, ti, mv = jax.tree.map(
        np.asarray, detect_match(jnp.asarray(img0_np), jnp.asarray(img1_np))
    )

    def norm(xy):
        return (xy - K[:2, 2]) / np.array([K[0, 0], K[1, 1]], np.float32)

    p0 = jnp.asarray(norm(xy0[qi]))
    p1 = jnp.asarray(norm(xy1[ti]))
    mvj = jnp.asarray(mv)
    key = jax.random.PRNGKey(0)

    def two_view(p0, p1, mv):
        res = epipolar.find_essential_ransac(
            key, p0, p1, valid=mv,
            cfg=RansacConfig(n_hypotheses=1024, threshold=2e-3),
        )
        rec = epipolar.recover_pose(res.model, p0, p1, res.inliers)
        X = epipolar.triangulate_normalized(rec.R, rec.t, p0, p1)
        pres = pnp.solve_pnp_ransac(
            key, X, p1, valid=rec.mask,
            cfg=RansacConfig(n_hypotheses=1024, threshold=3e-3),
        )
        return pres.tvec, pres.n_inliers

    @jax.jit
    def run(n):
        def body(i, carry):
            t, _ = two_view(p0 * (1.0 + carry * 1e-30), p1, mvj)
            return jnp.sum(t) * 1e-12

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt = device_time_per_trip(run, 20)

    # TPU-native operating point: two-view problems BATCHED over pairs
    # (a mapping/SfM pipeline solves many pairs at once; vmap amortizes
    # the kernel-launch + small-matrix latency the single-pair path pays)
    batch = 8
    p0b = jnp.tile(p0[None], (batch, 1, 1)) * (
        1.0 + 1e-4 * jnp.arange(batch)[:, None, None]
    )
    p1b = jnp.tile(p1[None], (batch, 1, 1))
    mvb = jnp.tile(mvj[None], (batch, 1))

    v_two_view = jax.vmap(two_view)

    @jax.jit
    def run_batched(n):
        def body(i, carry):
            t, _ = v_two_view(p0b * (1.0 + carry * 1e-30), p1b, mvb)
            return jnp.sum(t) * 1e-12

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    dt_b = device_time_per_trip(run_batched, 10)
    return 1.0 / dt, batch / dt_b


# ---------------------------------------------------------------- config 4


def bench_config4():
    """Sliding-window BA LM iterations/s at engine scale (6 KF x 2048 lm)."""
    from opencv_tpu.optim import ba

    C, P = 6, 2048
    rng = np.random.default_rng(0)
    pts = rng.uniform([-5, -5, 4], [5, 5, 20], (P, 3)).astype(np.float32)
    cam_r = rng.normal(0, 0.01, (C, 3)).astype(np.float32)
    cam_t = (rng.normal(0, 0.1, (C, 3)) + [0, 0, 0]).astype(np.float32)
    obs_cam = np.repeat(np.arange(C, dtype=np.int32), P)
    obs_pt = np.tile(np.arange(P, dtype=np.int32), C)
    # observations with noise
    from opencv_tpu.geometry.rotation import rodrigues

    uv = []
    for c in range(C):
        R = np.asarray(rodrigues(jnp.asarray(cam_r[c])))
        pc = pts @ R.T + cam_t[c]
        uv.append(pc[:, :2] / pc[:, 2:3])
    obs_uv = (np.concatenate(uv) + rng.normal(0, 1e-3, (C * P, 2))).astype(
        np.float32
    )
    prob = ba.BAProblem(
        cam_rvec=jnp.asarray(cam_r),
        cam_tvec=jnp.asarray(cam_t),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.ones((C * P,), bool),
        fixed_cams=jnp.asarray(np.arange(C) < 2),
    )

    @jax.jit
    def run(n):
        def body(i, state):
            return ba.ba_step(state, huber_delta=5e-3)

        state0 = ba.BAStepState(
            problem=prob, lam=jnp.float32(1e-4), cost=ba.cost(prob),
            n_accepted=jnp.int32(0),
        )
        out = lax.while_loop(
            lambda s: s[0] < n,
            lambda s: (s[0] + 1, body(s[0], s[1])),
            (jnp.int32(0), state0),
        )
        return out[1].cost

    dt = device_time_per_trip(run, 40)
    return 1.0 / dt


# ------------------------------------------------- map-scale matching


def bench_mapmatch(nq=2048, nt=262144):
    """Frame-to-map matching at SLAM map scale (VERDICT r1 item 7): 2-NN
    + ratio test of one frame's descriptors against a 256k-landmark map,
    streaming Pallas kernel vs the dense XLA matcher. This is also the
    FLANN-LSH kill-shot measurement: the reference's LSH index exists to
    avoid brute force at this size; on the MXU, brute force IS the fast
    path (numbers recorded in COVERAGE.md)."""
    from opencv_tpu.core.config import MatchConfig
    from opencv_tpu.ops import matching

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.integers(0, 2**32, size=(nq, 8), dtype=np.uint64).astype(np.uint32)
    )
    t = jnp.asarray(
        rng.integers(0, 2**32, size=(nt, 8), dtype=np.uint64).astype(np.uint32)
    )
    cfg = MatchConfig(cross_check=False)

    def timed(fn):
        @jax.jit
        def run(n):
            def body(i, acc):
                m = fn(jnp.bitwise_xor(q, acc.astype(jnp.uint32)[:, None]), t)
                return acc * 0 + m.train_idx[:nq].astype(jnp.int32)

            out = lax.fori_loop(0, n, body, jnp.zeros((nq,), jnp.int32))
            return jnp.sum(out)

        return device_time_per_trip(run, 10)

    dt_stream = timed(
        lambda qq, tt: matching.knn_match_auto(
            qq, tt, config=cfg, force_streaming=True
        )
    )
    dt_dense = timed(
        lambda qq, tt: matching.knn_match(qq, tt, config=cfg)
    )
    return 1.0 / dt_stream, 1.0 / dt_dense


# ------------------------------------------------------------------- main


def main():
    baselines, measured = load_measured_baselines()
    img0, img1 = load_pair()
    results = []

    fps1 = bench_config1(img0, img1)
    results.append(
        {
            "metric": "config1_orb2000_8lvl_detect_describe_match_frames_per_s",
            "value": round(fps1, 2),
            "unit": "frames/s/chip",
            "vs_baseline": round(fps1 / baselines["config1"], 3),
            "baseline": round(baselines["config1"], 2),
            "baseline_kind": "measured_cv2" if measured else "standin",
        }
    )

    clip = load_clip()
    if clip is not None:
        fps2 = bench_config2(clip)
        results.append(
            {
                "metric": "config2_pyrlk_clip100_frames_per_s",
                "value": round(fps2, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps2 / baselines["config2"], 3),
                "baseline": round(baselines["config2"], 2),
                "baseline_kind": "measured_cv2" if measured else "standin",
            }
        )

        fps2b = bench_config2_batched(clip)
        results.append(
            {
                "metric": "config2b_pyrlk_clip100_batched_frames_per_s",
                "value": round(fps2b, 2),
                "unit": "frames/s/chip (11-pair chunks)",
                "vs_baseline": round(fps2b / baselines["config2"], 3),
                "baseline": round(baselines["config2"], 2),
                "baseline_kind": "measured_cv2" if measured else "standin",
            }
        )

    pps3, pps3_batched = bench_config3(img0, img1)
    results.append(
        {
            "metric": "config3_two_view_odometry_pairs_per_s",
            "value": round(pps3, 2),
            "unit": "pairs/s/chip",
            "vs_baseline": round(pps3 / baselines["config3"], 3),
            "baseline": round(baselines["config3"], 2),
            "baseline_kind": "measured_cv2" if measured else "standin",
        }
    )
    results.append(
        {
            "metric": "config3b_two_view_odometry_batched8_pairs_per_s",
            "value": round(pps3_batched, 2),
            "unit": "pairs/s/chip (vmap x8)",
            "vs_baseline": round(pps3_batched / baselines["config3"], 3),
            "baseline": round(baselines["config3"], 2),
            "baseline_kind": "measured_cv2" if measured else "standin",
        }
    )

    ips4 = bench_config4()
    results.append(
        {
            "metric": "config4_window_ba_6x2048_lm_iters_per_s",
            "value": round(ips4, 2),
            "unit": "LM iters/s/chip",
            "vs_baseline": None,
            "baseline": None,
            "baseline_kind": "no_reference_equivalent",
        }
    )

    mps_stream, mps_dense = bench_mapmatch()
    results.append(
        {
            "metric": "mapmatch_256k_streaming_frames_per_s",
            "value": round(mps_stream, 2),
            "unit": "frame-vs-256k-map matches/s/chip",
            "vs_baseline": round(mps_stream / mps_dense, 3),
            "baseline": round(mps_dense, 2),
            "baseline_kind": "dense_xla_matcher_same_chip",
        }
    )

    with open(os.path.join(REPO, "benchmarks", "bench_results.json"), "w") as f:
        json.dump(results, f, indent=2)

    # driver contract: exactly one JSON line on stdout (headline = config 1)
    head = results[0]
    print(
        json.dumps(
            {
                "metric": head["metric"],
                "value": head["value"],
                "unit": head["unit"],
                "vs_baseline": head["vs_baseline"],
            }
        )
    )


if __name__ == "__main__":
    main()
