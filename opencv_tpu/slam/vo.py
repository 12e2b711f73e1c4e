"""Monocular visual odometry: the end-to-end engine the reference enables.

Pipeline (SURVEY.md §7.7): ORB front-end → descriptor matching →
two-view bootstrap (E-RANSAC + recoverPose + triangulation) → per-frame
frame-to-map PnP-RANSAC odometry → keyframing + new-landmark
triangulation → sliding-window bundle adjustment.

Architecture split (SURVEY.md §7 hard part (f)): *control* (keyframe
decisions, map bookkeeping, window compaction) runs in host Python on
NumPy; every *batch-numeric* stage (detection, matching, RANSAC, BA) is a
jitted JAX function with static capacities.

Latency discipline (the design rule that sets end-to-end frames/s — the
number the reference's own app prints per frame, samples/gpu/tbd.cpp:
1140-1151): the host↔device link is a LATENCY channel, not a memory bus.
Every device→host fetch costs a full round trip (~20 ms over a remote
TPU client), so the engine
  * fuses each pipeline stage into ONE jitted program per frame
    (detect+match+PnP is a single call, not three),
  * fetches ONE batched bundle per stage (`jax.device_get` of a dict),
    with the per-keypoint payload (xy/desc) fetched only at keyframes,
  * keeps the landmark map and the keyframe-descriptor DB resident on
    device (host keeps NumPy mirrors for bookkeeping; uploads happen
    only when the map actually changes),
  * does all scalar pose math (Rodrigues, camera centers, baselines) in
    host NumPy instead of round-tripping 3-vectors through the device.
`process_sequence` adds chunked tracking on top: K frames per jitted
call (`lax.map`), one small fetch per chunk, with keyframe/BA/loop-
closure work applied at chunk granularity (the tracking-vs-mapping
staleness this introduces is the standard SLAM threading model).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from opencv_tpu.core.config import LKConfig, MatchConfig, ORBConfig, RansacConfig
from opencv_tpu.geometry import decompose, epipolar, homography as hom_mod, pnp
from opencv_tpu.geometry.rotation import rodrigues, rodrigues_inv
from opencv_tpu.ops import lk as lk_mod, matching, orb
from opencv_tpu.optim import ba
from opencv_tpu.slam import loop_closure

_rodrigues_batch = jax.jit(jax.vmap(rodrigues))
_rodrigues_inv_batch = jax.jit(jax.vmap(rodrigues_inv))


# ---------------------------------------------------------------- host math
# NumPy ports of geometry/rotation.py's exp/log maps (identical guarded
# formulas). Pose bookkeeping runs dozens of these per frame; at ~20 ms
# per device round trip they must stay on host.


def _np_rodrigues(rvec: np.ndarray) -> np.ndarray:
    rvec = np.asarray(rvec, np.float64)
    theta2 = float(rvec @ rvec)
    x, y, z = rvec
    k = np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    k2 = k @ k
    if theta2 < 1e-8:
        a = 1.0 - theta2 / 6.0
        b = 0.5 - theta2 / 24.0
    else:
        theta = np.sqrt(theta2)
        a = np.sin(theta) / theta
        b = (1.0 - np.cos(theta)) / theta2
    return (np.eye(3) + a * k + b * k2).astype(np.float32)


def _np_rodrigues_inv(R: np.ndarray) -> np.ndarray:
    R = np.asarray(R, np.float64)
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s2 = float(w @ w)
    theta = np.arctan2(np.sqrt(s2), tr - 1.0)
    if theta > np.pi - 1e-3:
        axis2 = np.clip((np.diag(R) + 1.0) * 0.5, 0.0, 1.0)
        axis = np.sqrt(axis2) * np.sign(np.where(w >= 0, 1.0, -1.0))
        return (axis * theta).astype(np.float32)
    if s2 < 1e-12:
        scale = 0.5 + s2 / 24.0
    else:
        scale = theta / (2.0 * np.sin(theta) + 1e-30)
    return (w * scale).astype(np.float32)


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x over mask (matches np.median's mid-pair average)."""
    n = jnp.sum(mask.astype(jnp.int32))
    xs = jnp.sort(jnp.where(mask, x, jnp.inf))
    lo = xs[jnp.maximum((n - 1) // 2, 0)]
    hi = xs[jnp.maximum(n // 2, 0)]
    return jnp.where(n > 0, 0.5 * (lo + hi), jnp.inf)


@dataclasses.dataclass(frozen=True)
class VOConfig:
    orb: ORBConfig = ORBConfig(n_features=1000)
    match: MatchConfig = MatchConfig(ratio=0.8, cross_check=True)
    # inter-keyframe tracker: "orb" re-detects + re-matches every frame;
    # "klt" tracks the keyframe's landmarks with pyramidal LK between
    # keyframes (the reference pipeline shape: video/src/lkpyramid.cpp
    # front-end + descriptor work only at keyframes) and falls back to
    # ORB matching when the track thins out
    tracker: str = "orb"
    lk: "LKConfig" = None  # default LKConfig() resolved in __post_init__
    klt_min_tracked: int = 40
    # RANSAC thresholds in PIXELS; the engine divides by the focal length
    # (geometry runs in normalized coords). Pixel units keep the gates
    # camera-independent — a fixed normalized threshold silently tightens
    # ~3x when moving from a f=700 to a f=260 camera.
    essential_threshold_px: float = 1.0
    pnp_threshold_px: float = 2.0
    # parallax gates in PIXELS (same reasoning)
    bootstrap_parallax_px: float = 8.0  # raw median match displacement
    triangulation_parallax_px: float = 12.0  # rotation-compensated
    n_hypotheses: int = 1024
    # initializer robustness (the ORB-SLAM reset pattern): refuse to seed
    # KF0 from a near-featureless frame (black lead-ins, fades), and if
    # bootstrap makes no progress for this many frames (static shot,
    # scene cut), re-seed KF0 from the current frame instead of waiting
    # on a stale one forever
    min_init_features: int = 100
    bootstrap_max_frames: int = 40
    # RANSAC early-exit mode. None = auto: the adaptive chunked
    # while_loop on TPU (real hardware, stable), fixed-batch on XLA:CPU
    # where building the engine's many adaptive programs in one process
    # intermittently segfaults the *compiler* (repro:
    # benchmarks/repro_xla_cpu_whileloop_segfault.py; see COVERAGE.md)
    ransac_adaptive: bool | None = None
    min_track_inliers: int = 30
    keyframe_min_inliers: int = 60  # below this tracked count -> new KF
    keyframe_min_baseline: float = 0.12  # relative translation trigger
    # relative decay trigger (the ORB-SLAM "tracks < 90% of reference
    # KF" idea): new KF when inliers fall below this fraction of the
    # best count seen since the last KF. Absolute floors alone fail on
    # rotation-dominant motion — the map rotates out of view while the
    # count is still above keyframe_min_inliers, and by the time the
    # floor fires there is nothing left to triangulate against
    # (measured on the closed-loop orbit: 650 -> 17 inliers across a
    # weak-texture wall with zero keyframes created)
    keyframe_decay_ratio: float = 0.5
    # NOTE on the parallax gates above: at ~1 deg of true parallax both H
    # and E estimates are irrecoverably noise-driven (measured: a wrong
    # H decomposition can carry >90% parallax-filtered support), so the
    # bootstrap waits for substantially more before initializing.
    max_landmarks: int = 8192
    # loop closure (slam/loop_closure.py), checked at keyframe insertion:
    # retrieval votes over the keyframe DB -> PnP verification against the
    # candidate's local landmarks -> pose-graph relaxation over keyframes,
    # propagated to landmarks (via their anchor keyframe) and past poses
    enable_loop_closure: bool = True
    loop_exclude_recent: int = 8  # never match the last k keyframes
    loop_min_votes: int = 40
    loop_min_inliers: int = 30
    loop_cooldown: int = 5  # keyframes between accepted closures
    # relocalization on tracking loss: retrieval + PnP verification against
    # the best candidate keyframe's local landmarks (instead of holding the
    # last pose forever)
    relocalize: bool = True
    window_size: int = 6
    window_landmark_cap: int = 2048
    ba_iters: int = 12
    min_parallax_depth: float = 120.0  # reject triangulations beyond this

    def __post_init__(self):
        if self.lk is None:
            object.__setattr__(self, "lk", LKConfig(n_levels=4))


class Keyframe:
    """Host-side keyframe record."""

    def __init__(self, frame_id, rvec, tvec, kp_xy, desc, kp_valid, landmark_idx):
        self.frame_id = frame_id
        self.rvec = rvec  # np [3]
        self.tvec = tvec  # np [3]
        self.kp_xy = kp_xy  # np [N,2] normalized coords
        self.desc = desc  # np [N,8] uint32
        self.kp_valid = kp_valid  # np [N]
        self.landmark_idx = landmark_idx  # np [N] i64, -1 = unassociated


# keys fetched for every tracked frame (small: scalars + per-kp indices)
_SMALL_KEYS = ("rvec", "tvec", "ok", "n_inl", "n_matches", "ti", "inl")
# keys fetched only at keyframes / relocalization (per-kp payload)
_BIG_KEYS = ("xy", "desc", "kvalid")


# ------- jitted device kernels (shared across engine instances) -------
# Keyed by (config, intrinsics): a fresh VisualOdometry with the same
# configuration reuses already-compiled programs instead of retracing
# per instance (jax jit caches are per function object).


@functools.lru_cache(maxsize=8)
def _compiled_kernels(cfg: VOConfig, k4: tuple) -> dict:
    fx, fy, cx, cy = k4
    f = (fx + fy) / 2.0
    _e_thr = cfg.essential_threshold_px / f
    _pnp_thr = cfg.pnp_threshold_px / f
    _huber = 3.0 / f
    pnp_cfg = RansacConfig(
        n_hypotheses=cfg.n_hypotheses, threshold=_pnp_thr
    )
    e_cfg = RansacConfig(n_hypotheses=cfg.n_hypotheses, threshold=_e_thr)
    depth_cap = float(cfg.min_parallax_depth)
    thr = _pnp_thr
    n_feat = cfg.orb.n_features

    def norm_xy(xy):
        return jnp.stack(
            [(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy], axis=1
        )

    def detect_k(img):
        kp, desc = orb.detect_and_compute(
            img.astype(jnp.float32), config=cfg.orb
        )
        return {"xy": norm_xy(kp.xy), "desc": desc, "kvalid": kp.valid}

    def pnp_map_k(xy, desc, valid, lm_pos, lm_desc, lm_valid, key):
        m = matching.knn_match(
            desc, lm_desc, query_valid=valid, train_valid=lm_valid,
            config=cfg.match,
        )
        obj = lm_pos[m.train_idx]
        res = pnp.solve_pnp_ransac(
            key, obj, xy, valid=m.valid, adaptive=False, cfg=pnp_cfg
        )
        return {
            "ti": m.train_idx, "mv": m.valid,
            "n_matches": jnp.sum(m.valid.astype(jnp.int32)),
            "rvec": res.rvec, "tvec": res.tvec, "ok": res.ok,
            "n_inl": res.n_inliers, "inl": res.inliers,
        }

    def track_k(img, lm_pos, lm_desc, lm_valid, key):
        det = detect_k(img)
        out = pnp_map_k(
            det["xy"], det["desc"], det["kvalid"],
            lm_pos, lm_desc, lm_valid, key,
        )
        return {**det, **out}

    def chunk_k(imgs, lm_pos, lm_desc, lm_valid, keys):
        # imgs uint8 [K,H,W] — staged at 1/4 the f32 transfer cost;
        # lax.map (not vmap): same compute, small sticky program
        return jax.lax.map(
            lambda p: track_k(
                p[0].astype(jnp.float32), lm_pos, lm_desc, lm_valid, p[1]
            ),
            (imgs, keys),
        )

    def boot_k(xy0, desc0, v0, xy1, desc1, v1, key):
        """Fused two-view bootstrap: match + E-RANSAC + H-RANSAC +
        recoverPose + triangulation + per-H-candidate cheirality, all
        on device; the host reads ONE bundle and only decides."""
        m = matching.knn_match(
            desc0, desc1, query_valid=v0, train_valid=v1, config=cfg.match
        )
        xq = xy0[m.query_idx]
        xt = xy1[m.train_idx]
        disp = jnp.linalg.norm(xq - xt, axis=1)
        med_disp = _masked_median(disp, m.valid)
        k1, k2 = jax.random.split(key)
        eres = epipolar.find_essential_ransac(
            k1, xq, xt, valid=m.valid, adaptive=False, cfg=e_cfg
        )
        hres = hom_mod.find_homography_ransac(
            k2, xq, xt, valid=m.valid, cfg=e_cfg
        )
        rec = epipolar.recover_pose(eres.model, xq, xt, eres.inliers)
        ones = jnp.ones((xq.shape[0], 1), jnp.float32)
        h0 = jnp.concatenate([xq, ones], axis=1)

        def rotflow_med(R, good):
            hr = h0 @ R.T
            xr = hr[:, :2] / jnp.maximum(hr[:, 2:3], 1e-9)
            return _masked_median(jnp.linalg.norm(xt - xr, axis=1), good)

        # E path: unit-|t| triangulation + z gates (mono convention)
        t_e = rec.t / jnp.maximum(jnp.linalg.norm(rec.t), 1e-12)
        X_e = epipolar.triangulate_normalized(rec.R, t_e, xq, xt)
        good_e = rec.mask & (X_e[:, 2] > 0.1) & (X_e[:, 2] < depth_cap)

        # H path: 4 decompositions, parallax-aware cheirality support
        dec = decompose.decompose_homography(
            hres.model, jnp.eye(3, dtype=jnp.float32)
        )

        def hcand(R, t, dvalid):
            tn = jnp.linalg.norm(t)
            tc = t / jnp.maximum(tn, 1e-12)
            Xh = epipolar.triangulate_normalized(R, tc, xq, xt)
            z1 = Xh[:, 2]
            z2 = (Xh @ R.T + tc)[:, 2]
            C1 = -R.T @ tc
            r0 = Xh / jnp.maximum(
                jnp.linalg.norm(Xh, axis=1, keepdims=True), 1e-12
            )
            d1 = Xh - C1
            r1 = d1 / jnp.maximum(
                jnp.linalg.norm(d1, axis=1, keepdims=True), 1e-12
            )
            par_ok = jnp.sum(r0 * r1, axis=1) < jnp.cos(jnp.deg2rad(1.0))
            usable = dvalid & (tn > 1e-9)
            cheir = (z1 > 0) & (z2 > 0) & hres.inliers & par_ok & usable
            goodz = cheir & (z1 > 0.1) & (z1 < depth_cap)
            return {
                "count": jnp.sum(cheir.astype(jnp.int32)),
                "good": goodz,
                "n_good": jnp.sum(goodz.astype(jnp.int32)),
                "rotmed": rotflow_med(R, goodz),
                "R": R, "t": tc, "X": Xh,
            }

        hc = jax.vmap(hcand)(dec.R, dec.t, dec.valid)
        return {
            "qi": m.query_idx, "ti": m.train_idx, "mv": m.valid,
            "n_matches": jnp.sum(m.valid.astype(jnp.int32)),
            "med_disp": med_disp,
            "e_ok": eres.ok, "e_ninl": eres.n_inliers,
            "rec_R": rec.R, "rec_t": t_e, "rec_n_good": rec.n_good,
            "good_e": good_e,
            "n_good_e": jnp.sum(good_e.astype(jnp.int32)),
            "rotmed_e": rotflow_med(rec.R, good_e),
            "X_e": X_e,
            "h_ok": hres.ok, "h_ninl": hres.n_inliers,
            "h_count": hc["count"], "h_good": hc["good"],
            "h_n_good": hc["n_good"], "h_rotmed": hc["rotmed"],
            "h_R": hc["R"], "h_t": hc["t"], "h_X": hc["X"],
        }

    def tri_k(desc0, v0, xy0, has0, desc1, v1, xy1, has1, R_rel, t_rel):
        """New-landmark triangulation between two keyframes."""
        m = matching.knn_match(
            desc0, desc1, query_valid=v0, train_valid=v1, config=cfg.match
        )
        fresh = m.valid & ~has0[m.query_idx] & ~has1[m.train_idx]
        x0 = xy0[m.query_idx]
        x1 = xy1[m.train_idx]
        X0 = epipolar.triangulate_normalized(R_rel, t_rel, x0, x1)
        z0 = X0[:, 2]
        X1 = X0 @ R_rel.T + t_rel
        z1 = X1[:, 2]
        r0 = X0[:, :2] / jnp.maximum(z0[:, None], 1e-9) - x0
        r1 = X1[:, :2] / jnp.maximum(z1[:, None], 1e-9) - x1
        good = (
            fresh & (z0 > 0.1) & (z1 > 0.1) & (z0 < depth_cap)
            & (jnp.sum(r0 * r0, axis=1) < thr * thr)
            & (jnp.sum(r1 * r1, axis=1) < thr * thr)
        )
        return {
            "qi": m.query_idx, "ti": m.train_idx, "good": good, "X0": X0,
            "n_fresh": jnp.sum(fresh.astype(jnp.int32)),
        }

    def klt_k(prev, cur, px, pvalid, lm_idx, lm_pos, key):
        new_px, status, _ = lk_mod.calc_optical_flow_pyr_lk(
            prev, cur, px, pvalid, cfg=cfg.lk
        )
        st = status & pvalid
        obj = lm_pos[lm_idx]
        imgp = norm_xy(new_px)
        res = pnp.solve_pnp_ransac(
            key, obj, imgp, valid=st, adaptive=False, cfg=pnp_cfg
        )
        return {
            "new_px": new_px, "st": st,
            "n_tracked": jnp.sum(st.astype(jnp.int32)),
            "rvec": res.rvec, "tvec": res.tvec, "ok": res.ok,
            "n_inl": res.n_inliers, "inl": res.inliers,
        }

    def verify_k(qxy, qdesc, qvalid, cpos, cdesc, cvalid, thr_v, key):
        """Loop-closure / relocalization verification: match + PnP."""
        m = matching.knn_match(
            qdesc, cdesc, query_valid=qvalid, train_valid=cvalid,
            config=MatchConfig(cross_check=False),
        )
        obj = cpos[m.train_idx]
        res = pnp.solve_pnp_ransac(
            key, obj, qxy, valid=m.valid, adaptive=False,
            cfg=RansacConfig(n_hypotheses=1024, threshold=thr_v),
        )
        return {
            "n_matches": jnp.sum(m.valid.astype(jnp.int32)),
            "rvec": res.rvec, "tvec": res.tvec, "ok": res.ok,
            "n_inl": res.n_inliers,
        }

    def retrieve_k(qdesc, qvalid, db_desc, db_valid, k_live):
        """Vote keyframes [0, k_live) by ratio-tested matches over the
        flattened DB (one Hamming matmul)."""
        kcap = db_desc.shape[0]
        live = jnp.arange(kcap) < k_live
        flat_desc = db_desc.reshape(-1, 8)
        flat_valid = (db_valid & live[:, None]).reshape(-1)
        m = matching.knn_match_auto(
            qdesc, flat_desc, query_valid=qvalid, train_valid=flat_valid,
            config=MatchConfig(ratio=0.8, cross_check=False),
        )
        owner = m.train_idx // n_feat
        votes = jnp.zeros((kcap,), jnp.int32).at[owner].add(
            m.valid.astype(jnp.int32)
        )
        return votes

    return {
        "detect": jax.jit(detect_k),
        "pnp_map": jax.jit(pnp_map_k),
        "track": jax.jit(track_k),
        "chunk": jax.jit(chunk_k),
        "boot": jax.jit(boot_k),
        "tri": jax.jit(tri_k),
        "klt": jax.jit(klt_k),
        "verify": jax.jit(verify_k),
        "retrieve": jax.jit(retrieve_k),
        "ba": jax.jit(functools.partial(
            ba.bundle_adjust, iters=cfg.ba_iters, huber_delta=_huber
        )),
    }


class VisualOdometry:
    """Monocular VO engine. Feed grayscale frames via `process` (or a
    whole clip via `process_sequence`); read `trajectory()` for per-frame
    camera centers (world frame)."""

    def __init__(self, K: np.ndarray, config: VOConfig = VOConfig(), seed: int = 0):
        self.K = np.asarray(K, np.float32)
        self.cfg = config
        # pixel-domain thresholds -> normalized coords
        f = float(self.K[0, 0] + self.K[1, 1]) / 2.0
        self._e_thr = config.essential_threshold_px / f
        self._pnp_thr = config.pnp_threshold_px / f
        self._boot_parallax = config.bootstrap_parallax_px / f
        self._tri_parallax = config.triangulation_parallax_px / f
        self._huber = 3.0 / f
        # resolve the RANSAC mode (see VOConfig.ransac_adaptive)
        self._adaptive = (
            config.ransac_adaptive
            if config.ransac_adaptive is not None
            else jax.default_backend() != "cpu"
        )
        self.key = jax.random.PRNGKey(seed)
        self.state = "init"  # init -> bootstrapping -> tracking
        self.frames = 0
        self.poses: list[tuple[np.ndarray, np.ndarray]] = []  # (rvec, tvec) per frame
        self.keyframes: list[Keyframe] = []
        # landmark store (host mirror): positions + descriptor + validity
        m = config.max_landmarks
        self.lm_pos = np.zeros((m, 3), np.float32)
        self.lm_desc = np.zeros((m, 8), np.uint32)
        self.lm_valid = np.zeros((m,), bool)
        # anchoring keyframe (list index) per landmark: on a loop-closure
        # pose-graph correction the landmark moves rigidly with its anchor
        self.lm_anchor = np.full((m,), -1, np.int64)
        self._last_loop_kf = -(10 ** 9)
        self._kf_ref_inl = 0  # best inlier count since the last keyframe
        # retrieval-vote history per keyframe insertion, for the
        # continuous-covisibility loop gate (see _try_loop_closure)
        self._vote_log: list[tuple[int, np.ndarray]] = []
        self.loop_closures = 0  # accepted closures (observability counter)
        self.relocalizations = 0
        # device-resident map cache (re-uploaded only when host mirror
        # changes) + keyframe-descriptor DB for retrieval (grown in
        # buckets of 8 so the retrieval program shape is sticky)
        self._map_dev = None
        self._map_dirty = True
        self._map_version = 0  # bumped on every map mutation
        self._db_desc_dev = None  # [Kcap, N, 8] u32
        self._db_valid_dev = None  # [Kcap, N] bool
        self._db_count = 0
        # detections buffered during bootstrapping, retro-localized
        # against the fresh map once initialization succeeds
        self._preinit: list = []
        # KLT tracker state (cfg.tracker == "klt")
        self._prev_img: Optional[np.ndarray] = None
        self._prev_img_dev = None
        self._klt_px = np.zeros((config.orb.n_features, 2), np.float32)
        self._klt_lm = np.full(config.orb.n_features, -1, np.int64)
        self._klt_valid = np.zeros(config.orb.n_features, bool)
        self._build_kernels()

    # ---------- per-instance binding of the shared kernels ----------

    def _build_kernels(self):
        ks = _compiled_kernels(
            self.cfg,
            (
                float(self.K[0, 0]), float(self.K[1, 1]),
                float(self.K[0, 2]), float(self.K[1, 2]),
            ),
        )
        self._j_detect = ks["detect"]
        self._j_pnp_map = ks["pnp_map"]
        self._j_track = ks["track"]
        self._j_chunk = ks["chunk"]
        self._j_boot = ks["boot"]
        self._j_tri = ks["tri"]
        self._j_klt = ks["klt"]
        self._j_verify = ks["verify"]
        self._j_retrieve = ks["retrieve"]
        self._j_ba = ks["ba"]

    # ---------- device state caches ----------

    def _device_map(self):
        """Device copy of (lm_pos, lm_desc, lm_valid); re-uploaded only
        after a host-side map mutation (~360 KB per upload)."""
        if self._map_dev is None or self._map_dirty:
            self._map_dev = (
                jnp.asarray(self.lm_pos),
                jnp.asarray(self.lm_desc),
                jnp.asarray(self.lm_valid),
            )
            self._map_dirty = False
        return self._map_dev

    def _db_append(self, kf: Keyframe):
        """Append a keyframe's descriptors to the device retrieval DB.
        Capacity starts at 64 keyframes and grows in buckets of 64 — each
        bucket is a distinct retrieval program shape, and compiling or
        loading a program costs tens of seconds on a remote TPU client,
        so buckets are sized to make a second one rare."""
        n = self.cfg.orb.n_features
        if self._db_desc_dev is None or self._db_count >= self._db_desc_dev.shape[0]:
            grow = 64
            pad_d = jnp.zeros((grow, n, 8), jnp.uint32)
            pad_v = jnp.zeros((grow, n), bool)
            if self._db_desc_dev is None:
                self._db_desc_dev, self._db_valid_dev = pad_d, pad_v
            else:
                self._db_desc_dev = jnp.concatenate([self._db_desc_dev, pad_d])
                self._db_valid_dev = jnp.concatenate([self._db_valid_dev, pad_v])
        i = self._db_count
        self._db_desc_dev = self._db_desc_dev.at[i].set(jnp.asarray(kf.desc))
        self._db_valid_dev = self._db_valid_dev.at[i].set(
            jnp.asarray(kf.kp_valid)
        )
        self._db_count += 1

    # ---------- small helpers ----------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _normalize(self, xy: np.ndarray) -> np.ndarray:
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        return np.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy], axis=1)

    def _denormalize(self, xy: np.ndarray) -> np.ndarray:
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        return np.stack([xy[:, 0] * fx + cx, xy[:, 1] * fy + cy], axis=1)

    def _alloc_landmarks(self, n: int) -> np.ndarray:
        free = np.flatnonzero(~self.lm_valid)
        return free[:n]

    # ---------- pipeline stages ----------

    def _detect_frame(self, img):
        det = jax.device_get(self._j_detect(jnp.asarray(img, jnp.float32)))
        return det["xy"], det["desc"], det["kvalid"]

    def _match(self, d0, v0, d1, v1):
        m = matching.knn_match(
            jnp.asarray(d0), jnp.asarray(d1),
            query_valid=jnp.asarray(v0), train_valid=jnp.asarray(v1),
            config=self.cfg.match,
        )
        got = jax.device_get((m.query_idx, m.train_idx, m.valid))
        return got[0], got[1], got[2]

    def _bootstrap(self, kf0: Keyframe, xy1, desc1, valid1, frame_id):
        """Two-view initialization from keyframe 0 to the current frame.
        One fused device call (match + E + H + recoverPose + cheirality,
        see boot_k); host reads the bundle and only decides."""
        cfg = self.cfg
        b = jax.device_get(
            self._j_boot(
                jnp.asarray(kf0.kp_xy), jnp.asarray(kf0.desc),
                jnp.asarray(kf0.kp_valid),
                jnp.asarray(xy1), jnp.asarray(desc1), jnp.asarray(valid1),
                self._next_key(),
            )
        )
        if int(b["n_matches"]) < 50:
            return None
        # parallax gate: median match displacement must be large enough
        # for a well-conditioned essential matrix (ORB-SLAM-style check)
        if float(b["med_disp"]) < self._boot_parallax:
            return None
        if not bool(b["e_ok"]) or int(b["e_ninl"]) < 50:
            return None
        # H/E model selection (the ORB-SLAM recipe): a dominant plane
        # makes E degenerate; if a homography explains clearly more
        # matches, initialize from its decomposition instead. Degeneracy
        # gate: a healthy E puts nearly ALL inliers in front of both
        # cameras after recoverPose.
        e_decisive = int(b["rec_n_good"]) >= 0.9 * int(b["e_ninl"])
        use_h = (not e_decisive) or (
            bool(b["h_ok"]) and int(b["h_ninl"]) > 1.2 * int(b["e_ninl"])
        )
        out = None  # (R, t, good mask, X, rotmed)
        if use_h:
            counts = np.asarray(b["h_count"])
            order = np.argsort(-counts)
            best, second = int(counts[order[0]]), int(counts[order[1]])
            n_inl = int(b["h_ninl"])
            # the winning decomposition must be DECISIVE (ORB-SLAM
            # initializer thresholds): near-unanimous absolute support
            # and a clear margin over the runner-up
            if best >= 50 and best >= 0.9 * n_inl and second <= 0.75 * best:
                c = int(order[0])
                out = (
                    b["h_R"][c], b["h_t"][c], b["h_good"][c],
                    b["h_X"][c], float(b["h_rotmed"][c]),
                    int(b["h_n_good"][c]),
                )
        if out is None and e_decisive and int(b["rec_n_good"]) >= 40:
            out = (
                b["rec_R"], b["rec_t"], b["good_e"], b["X_e"],
                float(b["rotmed_e"]), int(b["n_good_e"]),
            )
        if out is None:
            return None
        R, t, good, X, rotmed, n_new = out
        if n_new < 30:
            return None
        # rotation-compensated parallax: subtract the R-induced flow from
        # the measured displacement; what remains is translation-induced
        # and must be large enough for a stable triangulation.
        if rotmed < self._tri_parallax:
            return None
        qi, ti = b["qi"], b["ti"]
        slots = self._alloc_landmarks(n_new)
        sel = np.flatnonzero(good)[: len(slots)]
        self.lm_pos[slots] = X[sel]
        self.lm_desc[slots] = desc1[ti[sel]]
        self.lm_valid[slots] = True
        self.lm_anchor[slots] = 0  # world frame == kf0 camera frame
        self._map_dirty = True
        self._map_version += 1
        kf0.landmark_idx[qi[sel]] = slots
        rvec1 = _np_rodrigues_inv(R)
        kf1 = Keyframe(
            frame_id, rvec1, np.asarray(t, np.float32), xy1, desc1, valid1,
            np.full(xy1.shape[0], -1, np.int64),
        )
        kf1.landmark_idx[ti[sel]] = slots
        self.keyframes.append(kf1)
        self._db_append(kf1)
        return rvec1, np.asarray(t, np.float32)

    def _reseed_klt(self, kp_xy_norm, kp_valid, lm_idx):
        """Reset the KLT track set to the landmark-associated keypoints."""
        n = self._klt_px.shape[0]
        sel = np.flatnonzero((lm_idx >= 0) & kp_valid)[:n]
        self._klt_px[:] = 0.0
        self._klt_lm[:] = -1
        self._klt_valid[:] = False
        px = self._denormalize(kp_xy_norm[sel])
        self._klt_px[: sel.size] = px
        self._klt_lm[: sel.size] = lm_idx[sel]
        self._klt_valid[: sel.size] = True

    def _track_klt(self, img, img_dev=None):
        """LK-track the current landmark set and PnP the new positions.
        Returns (rvec, tvec, n_inliers) or None (track too thin)."""
        if self._prev_img is None or self._klt_valid.sum() < self.cfg.klt_min_tracked:
            return None
        prev_dev = (
            self._prev_img_dev
            if self._prev_img_dev is not None
            else jnp.asarray(self._prev_img, jnp.float32)
        )
        if img_dev is None:
            img_dev = jnp.asarray(img, jnp.float32)
        has_lm = self._klt_lm >= 0
        out = jax.device_get(
            self._j_klt(
                prev_dev, img_dev,
                jnp.asarray(self._klt_px),
                jnp.asarray(self._klt_valid & has_lm),
                jnp.asarray(np.maximum(self._klt_lm, 0).astype(np.int32)),
                self._device_map()[0],
                self._next_key(),
            )
        )
        status = out["st"]
        if int(status.sum()) < self.cfg.klt_min_tracked:
            return None
        n_inl = int(out["n_inl"])
        if not bool(out["ok"]) or n_inl < self.cfg.min_track_inliers:
            return None
        # keep tracking inlier points only (outlier tracks have drifted)
        self._klt_px[:] = out["new_px"]
        self._klt_valid[:] = status & out["inl"]
        return out["rvec"], out["tvec"], n_inl

    def _track(self, xy, desc, valid):
        """Frame-to-map PnP from host-side detections (used for
        retro-localization). Returns (rvec, tvec, n_inliers, lm_idx)."""
        out = jax.device_get(
            self._j_pnp_map(
                jnp.asarray(xy), jnp.asarray(desc), jnp.asarray(valid),
                *self._device_map(), self._next_key(),
            )
        )
        return self._track_decide(out, xy.shape[0])

    def _track_decide(self, out, n_kp):
        """Shared host-side gate on a pnp_map_k/track_k bundle."""
        if int(out["n_matches"]) < self.cfg.min_track_inliers:
            return None
        n_inl = int(out["n_inl"])
        if not bool(out["ok"]) or n_inl < self.cfg.min_track_inliers:
            return None
        lm_idx = np.full(n_kp, -1, np.int64)
        inl = np.asarray(out["inl"])
        lm_idx[inl] = np.asarray(out["ti"])[inl]
        return out["rvec"], out["tvec"], n_inl, lm_idx

    def _need_keyframe(self, rvec, tvec, n_inl) -> bool:
        self._kf_ref_inl = max(self._kf_ref_inl, n_inl)
        kf_last = self.keyframes[-1]
        baseline = np.linalg.norm(
            self._camera_center(rvec, tvec)
            - self._camera_center(kf_last.rvec, kf_last.tvec)
        )
        scene_depth = np.median(
            self.lm_pos[self.lm_valid][:, 2]
        ) if self.lm_valid.any() else 1.0
        return (
            n_inl < self.cfg.keyframe_min_inliers
            or n_inl < self.cfg.keyframe_decay_ratio * self._kf_ref_inl
            or baseline > self.cfg.keyframe_min_baseline * max(scene_depth, 1e-6)
        )

    def _maybe_keyframe(
        self, frame_id, rvec, tvec, xy, desc, valid, lm_idx, n_inl, force=False
    ):
        if not (force or self._need_keyframe(rvec, tvec, n_inl)):
            return
        kf_last = self.keyframes[-1]
        kf = Keyframe(frame_id, rvec.copy(), tvec.copy(), xy, desc, valid, lm_idx.copy())
        self._triangulate_new(kf_last, kf)
        self.keyframes.append(kf)
        self._db_append(kf)
        self._kf_ref_inl = 0  # re-captured from post-KF tracking
        self._window_ba()
        if self.cfg.enable_loop_closure:
            self._try_loop_closure(len(self.keyframes) - 1)

    def _triangulate_new(self, kf0: Keyframe, kf1: Keyframe):
        """Create landmarks from unassociated matches between two KFs."""
        R0 = _np_rodrigues(kf0.rvec)
        R1 = _np_rodrigues(kf1.rvec)
        R_rel = R1 @ R0.T
        t_rel = kf1.tvec - R_rel @ kf0.tvec
        out = jax.device_get(
            self._j_tri(
                jnp.asarray(kf0.desc), jnp.asarray(kf0.kp_valid),
                jnp.asarray(kf0.kp_xy), jnp.asarray(kf0.landmark_idx >= 0),
                jnp.asarray(kf1.desc), jnp.asarray(kf1.kp_valid),
                jnp.asarray(kf1.kp_xy), jnp.asarray(kf1.landmark_idx >= 0),
                jnp.asarray(R_rel), jnp.asarray(t_rel),
            )
        )
        sel = np.flatnonzero(out["good"])
        if sel.size == 0:
            return
        qi, ti, X_c0 = out["qi"], out["ti"], out["X0"]
        # world coords
        X_w = (X_c0[sel] - kf0.tvec) @ R0  # R0^T (X - t0)
        slots = self._alloc_landmarks(sel.size)
        n = len(slots)
        self.lm_pos[slots] = X_w[:n]
        self.lm_desc[slots] = kf1.desc[ti[sel[:n]]]
        self.lm_valid[slots] = True
        # kf1 is about to be appended: its list index is len(keyframes)
        self.lm_anchor[slots] = len(self.keyframes)
        self._map_dirty = True
        self._map_version += 1
        kf0.landmark_idx[qi[sel[:n]]] = slots
        kf1.landmark_idx[ti[sel[:n]]] = slots

    def _window_ba(self):
        """Sliding-window BA over the last `window_size` keyframes.

        The camera dimension is PADDED to window_size with dummy fixed
        cameras so every window solves the same program shape — one
        compiled executable instead of one per fill level (program loads
        cost ~10 s each on a remote TPU client)."""
        win = self.keyframes[-self.cfg.window_size:]
        C = len(win)
        if C < 3:
            return
        # compact landmarks seen in window
        seen = np.unique(
            np.concatenate([kf.landmark_idx[kf.landmark_idx >= 0] for kf in win])
        )
        seen = seen[self.lm_valid[seen]][: self.cfg.window_landmark_cap]
        if seen.size < 20:
            return
        remap = -np.ones(self.cfg.max_landmarks, np.int64)
        remap[seen] = np.arange(seen.size)
        P = self.cfg.window_landmark_cap
        W = self.cfg.window_size  # padded camera count (sticky shape)
        O = W * self.cfg.orb.n_features
        obs_cam = np.zeros(O, np.int32)
        obs_pt = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_valid = np.zeros(O, bool)
        o = 0
        for ci, kf in enumerate(win):
            idx = np.flatnonzero(kf.landmark_idx >= 0)
            li = remap[kf.landmark_idx[idx]]
            keep = li >= 0
            idx, li = idx[keep], li[keep]
            n = idx.size
            obs_cam[o : o + n] = ci
            obs_pt[o : o + n] = li
            obs_uv[o : o + n] = kf.kp_xy[idx]
            obs_valid[o : o + n] = True
            o += n
        pts = np.zeros((P, 3), np.float32)
        pts[: seen.size] = self.lm_pos[seen]
        fixed = np.ones(W, bool)  # padding cameras stay fixed (no obs)
        fixed[:C] = False
        fixed[0] = True
        if C > 1:
            fixed[1] = True  # freeze gauge + scale
        cam_rv = np.zeros((W, 3), np.float32)
        cam_tv = np.zeros((W, 3), np.float32)
        cam_rv[:C] = np.stack([kf.rvec for kf in win])
        cam_tv[:C] = np.stack([kf.tvec for kf in win])
        prob = ba.BAProblem(
            cam_rvec=jnp.asarray(cam_rv),
            cam_tvec=jnp.asarray(cam_tv),
            points=jnp.asarray(pts),
            obs_cam=jnp.asarray(obs_cam),
            obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv),
            obs_valid=jnp.asarray(obs_valid),
            fixed_cams=jnp.asarray(fixed),
        )
        opt, _ = self._j_ba(prob)
        new_rv, new_tv, new_pts = jax.device_get(
            (opt.cam_rvec, opt.cam_tvec, opt.points)
        )
        for ci, kf in enumerate(win):
            kf.rvec = new_rv[ci]
            kf.tvec = new_tv[ci]
        self.lm_pos[seen] = new_pts[: seen.size]
        self._map_dirty = True
        self._map_version += 1

    # ---------- loop closure & relocalization ----------

    def _candidate_landmarks(self, i, pad_to=2048):
        """Landmarks observed by keyframe i and its neighbours, padded to
        a fixed capacity (bounds jit recompilation of the verifier)."""
        lo, hi = max(0, i - 1), min(len(self.keyframes), i + 2)
        lm = np.unique(
            np.concatenate([self.keyframes[a].landmark_idx for a in range(lo, hi)])
        )
        lm = lm[lm >= 0]
        lm = lm[self.lm_valid[lm]][:pad_to]
        n = lm.size
        pos = np.zeros((pad_to, 3), np.float32)
        desc = np.zeros((pad_to, 8), np.uint32)
        val = np.zeros(pad_to, bool)
        pos[:n] = self.lm_pos[lm]
        desc[:n] = self.lm_desc[lm]
        val[:n] = True
        return pos, desc, val, n, lm

    def _retrieve(self, desc, valid, exclude_recent, return_votes=False):
        """Vote old keyframes by descriptor matches against the
        device-resident DB (one jitted Hamming matmul + one fetch)."""
        k = len(self.keyframes) - exclude_recent
        if k < 1 or self._db_desc_dev is None:
            return ([], None) if return_votes else []
        votes = np.asarray(
            self._j_retrieve(
                jnp.asarray(desc), jnp.asarray(valid),
                self._db_desc_dev, self._db_valid_dev,
                jnp.int32(min(k, self._db_count)),
            )
        )
        order = np.argsort(-votes)
        out = []
        for kf in order[:3]:
            if kf < k and votes[kf] >= self.cfg.loop_min_votes:
                out.append(
                    loop_closure.LoopCandidate(int(kf), int(votes[kf]))
                )
        return (out, votes) if return_votes else out

    def _verify(self, xy, desc, valid, pos, cdesc, cval, min_inliers, thr):
        """Jitted match+PnP verification against candidate landmarks."""
        out = jax.device_get(
            self._j_verify(
                jnp.asarray(xy), jnp.asarray(desc), jnp.asarray(valid),
                jnp.asarray(pos), jnp.asarray(cdesc), jnp.asarray(cval),
                jnp.float32(thr), self._next_key(),
            )
        )
        if int(out["n_matches"]) < min_inliers:
            return None
        if not bool(out["ok"]) or int(out["n_inl"]) < min_inliers:
            return None
        return out["rvec"], out["tvec"], int(out["n_inl"])

    def _try_loop_closure(self, j):
        """On keyframe j's insertion: detect a revisit, verify it with PnP
        against the candidate's (old, less-drifted) local map, and relax
        the keyframe pose graph; propagate to landmarks and past poses."""
        cfg = self.cfg
        if j - self._last_loop_kf <= cfg.loop_cooldown:
            return
        if len(self.keyframes) <= cfg.loop_exclude_recent + 1:
            return
        kf = self.keyframes[j]
        cands, votes = self._retrieve(
            kf.desc, kf.kp_valid, cfg.loop_exclude_recent, return_votes=True
        )
        if votes is not None:
            self._vote_log.append((j, votes))
        cur_lm = set(kf.landmark_idx[kf.landmark_idx >= 0].tolist())
        for cand in cands:
            i = cand.kf_index
            pos, desc, val, n, lm_ids = self._candidate_landmarks(i)
            if n < cfg.loop_min_inliers:
                continue
            # covisibility exclusion (the ORB-SLAM candidate gate): a
            # keyframe whose local landmarks the query STILL tracks is
            # not a revisit, it is the same place continuously observed
            # — closing against it is at best a no-op edge (the
            # forward-dolly false positive: every KF shares the two
            # planes' content, so retrieval + PnP both pass). Require
            # the candidate's local map to be mostly disjoint from the
            # query's current associations.
            if cur_lm:
                overlap = len(cur_lm.intersection(lm_ids.tolist())) / len(cur_lm)
                if overlap > 0.2:
                    continue
            # continuous-covisibility gate: a TRUE revisit has a vote
            # GAP — the candidate region left view and came back. If
            # every intermediate retrieval since the candidate's
            # insertion kept voting for it, the "loop" is just the
            # same place observed continuously (the forward-dolly false
            # positive: gap-9 closures with persistently high votes,
            # vs the orbit's genuine gap-38 closure whose candidate
            # polled ~zero votes mid-sequence).
            hist = [
                v[i] for (jj, v) in self._vote_log[:-1]
                # only retrievals where candidate i was LIVE (inside the
                # voting window) count — masked-out entries are zero by
                # construction, not evidence the region left view
                if jj >= i + cfg.loop_exclude_recent and i < len(v)
            ]
            recent = hist[-6:]
            if len(recent) < 2 or min(recent) >= 0.5 * cfg.loop_min_votes:
                # either no gap evidence yet (a closure needs at least
                # two intermediate retrievals to demonstrate the region
                # LEFT view) or the votes never dropped — skip
                continue
            out = self._verify(
                kf.kp_xy, kf.desc, kf.kp_valid, pos, desc, val,
                cfg.loop_min_inliers, self._pnp_thr,
            )
            if out is None:
                continue
            rvec_q, tvec_q, _ = out
            # loop edge: pose of j measured in the candidate's (trusted)
            # frame, expressed relative to keyframe i
            loop_rel = loop_closure.relative_from_world_poses(
                self.keyframes[i].rvec, self.keyframes[i].tvec, rvec_q, tvec_q
            )
            old_rv = np.stack([k.rvec for k in self.keyframes])
            old_tv = np.stack([k.tvec for k in self.keyframes])
            new_rv, new_tv = loop_closure.correct_poses(
                old_rv, old_tv, i, j, loop_rel
            )
            self._apply_pose_correction(old_rv, old_tv, new_rv, new_tv)
            self._last_loop_kf = j
            self.loop_closures += 1
            return

    def _apply_pose_correction(self, old_rv, old_tv, new_rv, new_tv):
        """Move keyframes to corrected poses; carry each landmark rigidly
        with its anchor keyframe and remap the per-frame pose history
        relative to the keyframe that was current at that frame."""
        R_old = np.stack([_np_rodrigues(r) for r in old_rv])
        R_new = np.stack([_np_rodrigues(r) for r in new_rv])
        for ci, kf in enumerate(self.keyframes):
            kf.rvec = new_rv[ci]
            kf.tvec = new_tv[ci]
        # landmarks: X' = R_new^T (R_old X + t_old - t_new) per anchor
        live = np.flatnonzero(self.lm_valid & (self.lm_anchor >= 0))
        if live.size:
            a = self.lm_anchor[live]
            Xc = np.einsum("nij,nj->ni", R_old[a], self.lm_pos[live]) + old_tv[a]
            self.lm_pos[live] = np.einsum(
                "nji,nj->ni", R_new[a], Xc - new_tv[a]
            )
            self._map_dirty = True
            self._map_version += 1
        # pose history: T_f' = (T_f T_a_old^-1) T_a_new, a = last KF <= f
        kf_fids = np.array([k.frame_id for k in self.keyframes])
        for f in range(len(self.poses)):
            a = int(np.searchsorted(kf_fids, f, side="right")) - 1
            if a < 0:
                continue
            rv_f, tv_f = self.poses[f]
            Rf = _np_rodrigues(rv_f)
            Rrel = Rf @ R_old[a].T
            trel = tv_f - Rrel @ old_tv[a]
            Rp = Rrel @ R_new[a]
            tp = Rrel @ new_tv[a] + trel
            self.poses[f] = (_np_rodrigues_inv(Rp), tp.astype(np.float32))

    def _relocalize(self, xy, desc, valid):
        """Tracking lost: retrieval over ALL keyframes + PnP verification
        against each candidate's local landmarks."""
        cands = self._retrieve(desc, valid, 0)
        for cand in cands:
            pos, cdesc, val, n, _ = self._candidate_landmarks(cand.kf_index)
            if n < self.cfg.min_track_inliers:
                continue
            out = self._verify(
                xy, desc, valid, pos, cdesc, val,
                self.cfg.min_track_inliers, 2.0 * self._pnp_thr,
            )
            if out is not None:
                self.relocalizations += 1
                return out[0], out[1]
        return None

    # ---------- public API ----------

    @staticmethod
    def _camera_center(rvec, tvec):
        return -_np_rodrigues(rvec).T @ tvec

    def _extrapolate_pose(self):
        """Constant-velocity pose prediction from the last two frames —
        the reference TBD tracker's motion-model idea (tbd.cpp:288)
        applied to the camera during tracking loss. On rotation-dominant
        motion a frozen hold parks the trajectory while the true camera
        keeps turning; propagating the last relative transform keeps the
        error linear in the outage length instead."""
        if len(self.poses) < 2:
            return self.poses[-1]
        (rv1, tv1), (rv2, tv2) = self.poses[-2], self.poses[-1]
        R1 = _np_rodrigues(rv1)
        R2 = _np_rodrigues(rv2)
        R_rel = R2 @ R1.T
        t_rel = tv2 - R_rel @ tv1
        Rp = R_rel @ R2
        tp = R_rel @ tv2 + t_rel
        return _np_rodrigues_inv(Rp), tp.astype(np.float32)

    def process(self, img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Process one grayscale frame; returns (rvec, tvec) world->cam."""
        img = np.asarray(img, np.float32)
        frame_id = self.frames
        self.frames += 1
        klt = self.cfg.tracker == "klt"

        if self.state == "init":
            xy, desc, valid = self._detect_frame(img)
            if int(valid.sum()) < self.cfg.min_init_features:
                # near-featureless frame (black lead-in, fade): stay in
                # init rather than locking a useless KF0
                self.poses.append((np.zeros(3, np.float32), np.zeros(3, np.float32)))
                self._prev_img = img
                self._prev_img_dev = None
                return self.poses[-1]
            kf = Keyframe(
                frame_id,
                np.zeros(3, np.float32), np.zeros(3, np.float32),
                xy, desc, valid, np.full(xy.shape[0], -1, np.int64),
            )
            self.keyframes.append(kf)
            self._db_append(kf)
            self.poses.append((kf.rvec, kf.tvec))
            self.state = "bootstrapping"
            self._prev_img = img
            self._prev_img_dev = None
            return kf.rvec, kf.tvec

        if self.state == "bootstrapping":
            xy, desc, valid = self._detect_frame(img)
            out = self._bootstrap(self.keyframes[0], xy, desc, valid, frame_id)
            self._prev_img = img
            self._prev_img_dev = None
            if out is None:
                stale = frame_id - self.keyframes[0].frame_id
                if (stale > self.cfg.bootstrap_max_frames
                        and int(valid.sum()) >= self.cfg.min_init_features):
                    # bootstrap stalled (static shot / scene cut): re-seed
                    # KF0 from the current frame rather than waiting on a
                    # stale one forever
                    self.keyframes[0] = Keyframe(
                        frame_id,
                        np.zeros(3, np.float32), np.zeros(3, np.float32),
                        xy, desc, valid,
                        np.full(xy.shape[0], -1, np.int64),
                    )
                    if self._db_count > 0:
                        self._db_count = 0
                        self._db_append(self.keyframes[0])
                    self._preinit.clear()
                    self.poses.append(self.poses[-1])
                    return self.poses[-1]
                # not enough parallax yet: buffer the detection and report
                # the previous pose; the frame is retro-localized against
                # the map the moment bootstrap succeeds
                self._preinit.append((frame_id, xy, desc, valid))
                self.poses.append(self.poses[-1])
                return self.poses[-1]
            self.state = "tracking"
            self.poses.append(out)
            # retro-localize the buffered pre-init frames with PnP against
            # the fresh map (real estimation — poses for every frame, not
            # frozen-at-origin placeholders)
            for fid, bxy, bdesc, bvalid in self._preinit:
                t2 = self._track(bxy, bdesc, bvalid)
                if t2 is not None:
                    self.poses[fid] = (t2[0], t2[1])
            self._preinit.clear()
            if klt:
                kf1 = self.keyframes[-1]
                self._reseed_klt(kf1.kp_xy, kf1.kp_valid, kf1.landmark_idx)
            return out

        # ---- tracking ----
        img_dev = jnp.asarray(img, jnp.float32)
        if klt:
            out = self._track_klt(img, img_dev)
            if out is not None:
                rvec, tvec, n_inl = out
                self.poses.append((rvec, tvec))
                if self._need_keyframe(rvec, tvec, n_inl):
                    # descriptor work happens only at keyframes: detect,
                    # re-match to the map for landmark associations, then
                    # keyframe + reseed the track set
                    xy, desc, valid = self._detect_frame(img)
                    t2 = self._track(xy, desc, valid)
                    if t2 is not None:
                        rvec, tvec, n_inl2, lm_idx = t2
                        self.poses[-1] = (rvec, tvec)
                        self._maybe_keyframe(
                            frame_id, rvec, tvec, xy, desc, valid, lm_idx,
                            n_inl2, force=True,
                        )
                        kf = self.keyframes[-1]
                        self._reseed_klt(kf.kp_xy, kf.kp_valid, kf.landmark_idx)
                self._prev_img = img
                self._prev_img_dev = img_dev
                return self.poses[-1]
            # KLT thinned out: fall through to the ORB matcher

        # fused detect+match+PnP: one program, one small fetch; the
        # per-keypoint payload is fetched only if this frame becomes a
        # keyframe or needs relocalization
        dev_out = self._j_track(img_dev, *self._device_map(), self._next_key())
        small = jax.device_get({k: dev_out[k] for k in _SMALL_KEYS})
        self._prev_img = img
        self._prev_img_dev = img_dev
        out = self._track_decide(small, self.cfg.orb.n_features)
        if out is None:
            big = jax.device_get({k: dev_out[k] for k in _BIG_KEYS})
            xy, desc, valid = big["xy"], big["desc"], big["kvalid"]
            # tracking lost: try retrieval-based relocalization before
            # falling back to holding the last pose
            rel = self._relocalize(xy, desc, valid) if self.cfg.relocalize else None
            if rel is None:
                self.poses.append(self._extrapolate_pose())
                return self.poses[-1]
            self.poses.append(rel)
            return rel
        rvec, tvec, n_inl, lm_idx = out
        self.poses.append((rvec, tvec))
        if self._need_keyframe(rvec, tvec, n_inl):
            big = jax.device_get({k: dev_out[k] for k in _BIG_KEYS})
            self._maybe_keyframe(
                frame_id, rvec, tvec, big["xy"], big["desc"], big["kvalid"],
                lm_idx, n_inl, force=True,
            )
        if klt:
            src = self.keyframes[-1]
            self._reseed_klt(src.kp_xy, src.kp_valid, src.landmark_idx)
        return rvec, tvec

    def _seq_ingest(self, xy, desc, valid) -> bool:
        """init/bootstrap handling for one frame whose detections came
        from the chunk program. Mirrors process()'s init/bootstrapping
        branches (minus the preinit buffering — in sequence mode the
        frames stay staged on device and are retro-localized by
        _seq_retro). Returns True when bootstrap just succeeded."""
        frame_id = self.frames
        self.frames += 1
        if self.state == "init":
            if int(valid.sum()) < self.cfg.min_init_features:
                self.poses.append(
                    (np.zeros(3, np.float32), np.zeros(3, np.float32))
                )
                return False
            kf = Keyframe(
                frame_id,
                np.zeros(3, np.float32), np.zeros(3, np.float32),
                xy, desc, valid, np.full(xy.shape[0], -1, np.int64),
            )
            self.keyframes.append(kf)
            self._db_append(kf)
            self.poses.append((kf.rvec, kf.tvec))
            self.state = "bootstrapping"
            return False
        out = self._bootstrap(self.keyframes[0], xy, desc, valid, frame_id)
        if out is None:
            stale = frame_id - self.keyframes[0].frame_id
            if (stale > self.cfg.bootstrap_max_frames
                    and int(valid.sum()) >= self.cfg.min_init_features):
                self.keyframes[0] = Keyframe(
                    frame_id,
                    np.zeros(3, np.float32), np.zeros(3, np.float32),
                    xy, desc, valid,
                    np.full(xy.shape[0], -1, np.int64),
                )
                self._db_count = 0
                self._db_append(self.keyframes[0])
            self.poses.append(self.poses[-1])
            return False
        self.state = "tracking"
        self.poses.append(out)
        return True

    def _seq_retro(self, dispatch, start: int, end: int):
        """PnP frames [start, end) against the fresh post-bootstrap map
        (the sequence-mode analog of process()'s _preinit replay)."""
        s = start
        while s < end:
            base, dev_out = dispatch(s)
            small = jax.device_get({k: dev_out[k] for k in _SMALL_KEYS})
            for f in range(s - base, min(end - base, small["ok"].shape[0])):
                # (chunk window is [base, base+chunk); clamp to end)
                row = {k: small[k][f] for k in _SMALL_KEYS}
                r = self._track_decide(row, self.cfg.orb.n_features)
                if r is not None:
                    self.poses[base + f] = (r[0], r[1])
                s = base + f + 1

    def process_sequence(
        self, frames: np.ndarray, chunk: int = 8
    ) -> np.ndarray:
        """Process a whole clip with chunked device dispatch: K frames per
        jitted call, ONE small fetch per chunk (the per-frame API costs a
        ~20 ms round trip per frame on a remote TPU; chunking amortizes
        it K-fold). Keyframe/BA/loop-closure updates land at chunk
        granularity — frames later in a chunk track against the map as it
        stood at the chunk start, the standard tracking-vs-mapping
        staleness of threaded SLAM systems (and of the reference's own
        `--history_distribution` stale-detection experiments,
        samples/gpu/tbd.cpp:629-706). Returns trajectory() for the clip."""
        if self.cfg.tracker == "klt":
            for f in frames:
                self.process(f)
            return self.trajectory()
        frames = np.asarray(frames)
        F = frames.shape[0]
        clip = np.clip(frames, 0, 255).astype(np.uint8)
        pad = (-F) % chunk
        if pad:
            clip = np.concatenate([clip, np.repeat(clip[-1:], pad, axis=0)])
        # stage the whole clip in HBM once (async upload, u8 = 1/4 the
        # bytes of f32; frames are cast on device per chunk)
        dev_clip = jax.device_put(clip)

        def dispatch(at):
            """Chunk-track frames [base, base+chunk) (base clamped so the
            window stays in range; the caller offsets into the result)."""
            base = min(at, clip.shape[0] - chunk)
            imgs = jax.lax.dynamic_slice_in_dim(dev_clip, base, chunk, axis=0)
            keys = jax.random.split(self._next_key(), chunk)
            return base, self._j_chunk(imgs, *self._device_map(), keys)

        i = 0
        while i < F:
            base, dev_out = dispatch(i)
            off = i - base
            if self.state != "tracking":
                # init/bootstrap consume one frame per dispatch: the
                # detections come from the SAME chunk program (no extra
                # single-frame executables to compile/load), the map
                # match in it is ignored
                big = jax.device_get({k: dev_out[k][off] for k in _BIG_KEYS})
                became_tracking = self._seq_ingest(
                    big["xy"], big["desc"], big["kvalid"]
                )
                i += 1
                if became_tracking and i < F:
                    # retro-localize the pre-init frames against the
                    # fresh map with the same chunk program
                    self._seq_retro(dispatch, self.keyframes[0].frame_id + 1, i - 1)
                continue
            small = jax.device_get({k: dev_out[k] for k in _SMALL_KEYS})
            for f in range(off, chunk):
                if i >= F:
                    break
                frame_id = self.frames
                self.frames += 1
                row = {k: small[k][f] for k in _SMALL_KEYS}
                out = self._track_decide(row, self.cfg.orb.n_features)
                if out is None:
                    big = jax.device_get(
                        {k: dev_out[k][f] for k in _BIG_KEYS}
                    )
                    rel = (
                        self._relocalize(big["xy"], big["desc"], big["kvalid"])
                        if self.cfg.relocalize
                        else None
                    )
                    self.poses.append(
                        rel if rel is not None else self._extrapolate_pose()
                    )
                    i += 1
                    continue
                rvec, tvec, n_inl, lm_idx = out
                self.poses.append((rvec, tvec))
                if self._need_keyframe(rvec, tvec, n_inl):
                    big = jax.device_get(
                        {k: dev_out[k][f] for k in _BIG_KEYS}
                    )
                    self._maybe_keyframe(
                        frame_id, rvec, tvec,
                        big["xy"], big["desc"], big["kvalid"],
                        lm_idx, n_inl, force=True,
                    )
                    i += 1
                    if n_inl < self.cfg.keyframe_min_inliers:
                        # inlier-triggered keyframe: tracking quality is
                        # degrading (rotation turning landmarks out of
                        # view) and the frames behind it in this chunk
                        # NEED the just-triangulated landmarks. Restart
                        # the chunk on the fresh map. Baseline-triggered
                        # keyframes keep the stale-accept fast path (the
                        # old map still tracks fine there).
                        break
                    continue
                i += 1
            self._prev_img = frames[min(i, F) - 1]
            self._prev_img_dev = None
        return self.trajectory()

    def trajectory(self) -> np.ndarray:
        """[F,3] camera centers in world frame."""
        return np.stack(
            [self._camera_center(rv, tv) for (rv, tv) in self.poses]
        )
