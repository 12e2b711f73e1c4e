"""Monocular visual odometry: the end-to-end engine the reference enables.

Pipeline (SURVEY.md §7.7): ORB front-end → descriptor matching →
two-view bootstrap (E-RANSAC + recoverPose + triangulation) → per-frame
frame-to-map PnP-RANSAC odometry → keyframing + new-landmark
triangulation → sliding-window bundle adjustment.

Architecture split (SURVEY.md §7 hard part (f)): *control* (keyframe
decisions, map bookkeeping, window compaction) runs in host Python on
NumPy; every *batch-numeric* stage (detection, matching, RANSAC, BA) is a
jitted JAX function with static capacities. The host/device seam is the
SoA keypoint/match records.
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


class VisualOdometry:
    """Monocular VO engine. Feed grayscale frames via `process`; read
    `trajectory()` for per-frame camera centers (world frame)."""

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
        # landmark store (host): positions + descriptor + validity
        m = config.max_landmarks
        self.lm_pos = np.zeros((m, 3), np.float32)
        self.lm_desc = np.zeros((m, 8), np.uint32)
        self.lm_valid = np.zeros((m,), bool)
        # anchoring keyframe (list index) per landmark: on a loop-closure
        # pose-graph correction the landmark moves rigidly with its anchor
        self.lm_anchor = np.full((m,), -1, np.int64)
        self._last_loop_kf = -(10 ** 9)
        self.loop_closures = 0  # accepted closures (observability counter)
        self.relocalizations = 0
        self._detect = jax.jit(
            functools.partial(orb.detect_and_compute, config=config.orb)
        )
        # detections buffered during bootstrapping, retro-localized
        # against the fresh map once initialization succeeds
        self._preinit: list = []
        # KLT tracker state (cfg.tracker == "klt")
        self._prev_img: Optional[np.ndarray] = None
        self._klt_px = np.zeros((config.orb.n_features, 2), np.float32)
        self._klt_lm = np.full(config.orb.n_features, -1, np.int64)
        self._klt_valid = np.zeros(config.orb.n_features, bool)
        self._lk_track = jax.jit(
            functools.partial(lk_mod.calc_optical_flow_pyr_lk, cfg=config.lk)
        )

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
        kp, desc = self._detect(jnp.asarray(img, jnp.float32))
        kp_xy = np.asarray(kp.xy)
        valid = np.asarray(kp.valid)
        return self._normalize(kp_xy), np.asarray(desc), valid

    def _match(self, d0, v0, d1, v1):
        m = matching.knn_match(
            jnp.asarray(d0), jnp.asarray(d1),
            query_valid=jnp.asarray(v0), train_valid=jnp.asarray(v1),
            config=self.cfg.match,
        )
        return np.asarray(m.query_idx), np.asarray(m.train_idx), np.asarray(m.valid)

    def _bootstrap(self, kf0: Keyframe, xy1, desc1, valid1, frame_id):
        """Two-view initialization from keyframe 0 to the current frame."""
        qi, ti, mv = self._match(kf0.desc, kf0.kp_valid, desc1, valid1)
        if mv.sum() < 50:
            return None
        # parallax gate: median match displacement must be large enough for
        # a well-conditioned essential matrix (ORB-SLAM-style init check)
        disp = np.linalg.norm(kf0.kp_xy[qi] - xy1[ti], axis=1)
        if np.median(disp[mv]) < self._boot_parallax:
            return None
        x0 = jnp.asarray(kf0.kp_xy)
        x1full = jnp.asarray(xy1)
        xq = x0[jnp.asarray(qi)]
        xt = x1full[jnp.asarray(ti)]
        # adaptive=False: the engine keeps the fixed-batch RANSAC program
        # — the adaptive while_loop variant intermittently segfaults
        # XLA:CPU *compilation* when many engine programs build in one
        # process (tests/CI); direct API callers and bench.py use the
        # adaptive path, which is stable in isolation
        res = epipolar.find_essential_ransac(
            self._next_key(), xq, xt,
            valid=jnp.asarray(mv), adaptive=False,
            cfg=RansacConfig(
                n_hypotheses=self.cfg.n_hypotheses,
                threshold=self._e_thr,
            ),
        )
        if not bool(res.ok) or int(res.n_inliers) < 50:
            return None
        # H/E model selection (the ORB-SLAM recipe): a dominant plane
        # makes E degenerate; if a homography explains clearly more
        # matches, initialize from its decomposition instead
        hres = hom_mod.find_homography_ransac(
            self._next_key(), xq, xt,
            valid=jnp.asarray(mv),
            cfg=RansacConfig(
                n_hypotheses=self.cfg.n_hypotheses,
                threshold=self._e_thr,
            ),
        )
        rec = epipolar.recover_pose(res.model, xq, xt, res.inliers)
        # Degeneracy gate: a healthy essential matrix puts nearly ALL its
        # inliers in front of both cameras after recoverPose; a planar /
        # low-parallax degenerate solution splits them across the four
        # (R, t) candidates. An indecisive split is a stronger degeneracy
        # signal than the H-vs-E inlier-count ratio alone (a dominant
        # plane can still leave E with the higher raw count).
        e_decisive = int(rec.n_good) >= 0.9 * int(res.n_inliers)
        use_h = (not e_decisive) or (
            bool(hres.ok) and int(hres.n_inliers) > 1.2 * int(res.n_inliers)
        )
        out = None
        if use_h:
            out = self._pose_from_homography(hres, xq, xt)
        if out is None and e_decisive and int(rec.n_good) >= 40:
            out = (np.asarray(rec.R), np.asarray(rec.t), rec.mask)
        if out is None:
            return None
        R, t, cheir_mask = out
        rec_mask = cheir_mask
        t = t / max(np.linalg.norm(t), 1e-12)  # mono scale convention |t|=1
        # triangulate inliers (world = kf0 camera frame)
        X = np.asarray(
            epipolar.triangulate_normalized(
                jnp.asarray(R), jnp.asarray(t),
                x0[jnp.asarray(qi)], x1full[jnp.asarray(ti)],
            )
        )
        good = np.asarray(rec_mask) & (X[:, 2] > 0.1) & (
            X[:, 2] < self.cfg.min_parallax_depth
        )
        n_new = int(good.sum())
        if n_new < 30:
            return None
        # rotation-compensated parallax: subtract the R-induced flow from
        # the measured displacement; what remains is translation-induced
        # and must be large enough for a stable triangulation. (The raw
        # displacement pregate above can be pure rotation, and a ray-angle
        # check on the triangulation is self-fulfilling — the rays meet at
        # X by construction whatever the pose.)
        h0 = np.concatenate(
            [kf0.kp_xy[qi], np.ones((qi.size, 1), np.float32)], axis=1
        )
        hr = h0 @ R.T
        xr = hr[:, :2] / np.maximum(hr[:, 2:3], 1e-9)
        rotflow = np.linalg.norm(xy1[ti] - xr, axis=1)
        if np.median(rotflow[good]) < self._tri_parallax:
            return None
        slots = self._alloc_landmarks(n_new)
        sel = np.flatnonzero(good)[: len(slots)]
        self.lm_pos[slots] = X[sel]
        self.lm_desc[slots] = desc1[ti[sel]]
        self.lm_valid[slots] = True
        self.lm_anchor[slots] = 0  # world frame == kf0 camera frame
        kf0.landmark_idx[qi[sel]] = slots
        rvec1 = np.asarray(rodrigues_inv(jnp.asarray(R, jnp.float32)))
        kf1 = Keyframe(
            frame_id, rvec1, t.astype(np.float32), xy1, desc1, valid1,
            np.full(xy1.shape[0], -1, np.int64),
        )
        kf1.landmark_idx[ti[sel]] = slots
        self.keyframes.append(kf1)
        return rvec1, t.astype(np.float32)

    def _pose_from_homography(self, hres, xq, xt):
        """Bootstrap pose from a dominant-plane homography: decompose
        into 4 (R, t, n) candidates (geometry/decompose.py) and pick the
        one with the strongest positive-depth (cheirality) support."""
        dec = decompose.decompose_homography(
            hres.model, jnp.eye(3, dtype=jnp.float32)
        )
        cands = []
        for i in range(4):
            if not bool(dec.valid[i]):
                continue
            R = np.asarray(dec.R[i])
            t = np.asarray(dec.t[i])
            if np.linalg.norm(t) < 1e-9:
                continue
            X = np.asarray(
                epipolar.triangulate_normalized(
                    jnp.asarray(R), jnp.asarray(t), xq, xt
                )
            )
            z1 = X[:, 2]
            z2 = (X @ R.T + t)[:, 2]
            # parallax-aware support (the ORB-SLAM initializer check):
            # cheirality of a near-zero-parallax triangulation is noise,
            # and it is exactly what props up the wrong twin candidate
            C1 = -R.T @ t
            r0 = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            d1 = X - C1
            r1 = d1 / np.maximum(np.linalg.norm(d1, axis=1, keepdims=True), 1e-12)
            parallax_ok = (r0 * r1).sum(1) < np.cos(np.deg2rad(1.0))
            good = (z1 > 0) & (z2 > 0) & np.asarray(hres.inliers) & parallax_ok
            cands.append((R, t, good, int(good.sum())))
        if not cands:
            return None
        cands.sort(key=lambda c: -c[3])
        best = cands[0]
        n_inl = int(hres.n_inliers)
        second = cands[1][3] if len(cands) > 1 else 0
        # the winning decomposition must be DECISIVE (the ORB-SLAM
        # initializer thresholds): near-unanimous absolute support and a
        # clear margin over the runner-up, else wait for more parallax
        if best[3] < 50 or best[3] < 0.9 * n_inl or second > 0.75 * best[3]:
            return None
        return best[0], best[1], jnp.asarray(best[2])

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

    def _track_klt(self, img):
        """LK-track the current landmark set and PnP the new positions.
        Returns (rvec, tvec, n_inliers) or None (track too thin)."""
        if self._prev_img is None or self._klt_valid.sum() < self.cfg.klt_min_tracked:
            return None
        new_px, status, _ = self._lk_track(
            jnp.asarray(self._prev_img, jnp.float32),
            jnp.asarray(img, jnp.float32),
            jnp.asarray(self._klt_px),
            jnp.asarray(self._klt_valid),
        )
        new_px = np.asarray(new_px)
        status = np.asarray(status) & self._klt_valid & (self._klt_lm >= 0)
        if status.sum() < self.cfg.klt_min_tracked:
            return None
        obj = jnp.asarray(self.lm_pos)[jnp.asarray(np.maximum(self._klt_lm, 0))]
        img_pts = jnp.asarray(self._normalize(new_px))
        res = pnp.solve_pnp_ransac(
            self._next_key(), obj, img_pts,
            valid=jnp.asarray(status), adaptive=False,
            cfg=RansacConfig(
                n_hypotheses=self.cfg.n_hypotheses, threshold=self._pnp_thr
            ),
        )
        n_inl = int(res.n_inliers)
        if not bool(res.ok) or n_inl < self.cfg.min_track_inliers:
            return None
        # keep tracking inlier points only (outlier tracks have drifted)
        self._klt_px[:] = new_px
        self._klt_valid[:] = status & np.asarray(res.inliers)
        return np.asarray(res.rvec), np.asarray(res.tvec), n_inl

    def _track(self, xy, desc, valid):
        """Frame-to-map PnP. Returns (rvec, tvec, n_inliers, lm_idx_per_kp)."""
        qi, ti, mv = self._match(desc, valid, self.lm_desc, self.lm_valid)
        n_matches = int(mv.sum())
        if n_matches < self.cfg.min_track_inliers:
            return None
        obj = jnp.asarray(self.lm_pos)[jnp.asarray(ti)]
        img_pts = jnp.asarray(xy)
        res = pnp.solve_pnp_ransac(
            self._next_key(), obj, img_pts,
            valid=jnp.asarray(mv), adaptive=False,
            cfg=RansacConfig(
                n_hypotheses=self.cfg.n_hypotheses,
                threshold=self._pnp_thr,
            ),
        )
        n_inl = int(res.n_inliers)
        if not bool(res.ok) or n_inl < self.cfg.min_track_inliers:
            return None
        lm_idx = np.full(xy.shape[0], -1, np.int64)
        inl = np.asarray(res.inliers)
        lm_idx[inl] = ti[inl]
        return (
            np.asarray(res.rvec), np.asarray(res.tvec), n_inl, lm_idx,
        )

    def _need_keyframe(self, rvec, tvec, n_inl) -> bool:
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
        self._window_ba()
        if self.cfg.enable_loop_closure:
            self._try_loop_closure(len(self.keyframes) - 1)

    def _triangulate_new(self, kf0: Keyframe, kf1: Keyframe):
        """Create landmarks from unassociated matches between two KFs."""
        qi, ti, mv = self._match(kf0.desc, kf0.kp_valid, kf1.desc, kf1.kp_valid)
        fresh = mv & (kf0.landmark_idx[qi] < 0) & (kf1.landmark_idx[ti] < 0)
        if fresh.sum() < 1:
            return
        sel = np.flatnonzero(fresh)
        R0 = np.asarray(rodrigues(jnp.asarray(kf0.rvec)))
        R1 = np.asarray(rodrigues(jnp.asarray(kf1.rvec)))
        R_rel = R1 @ R0.T
        t_rel = kf1.tvec - R_rel @ kf0.tvec
        X_c0 = np.asarray(
            epipolar.triangulate_normalized(
                jnp.asarray(R_rel), jnp.asarray(t_rel),
                jnp.asarray(kf0.kp_xy[qi[sel]]), jnp.asarray(kf1.kp_xy[ti[sel]]),
            )
        )
        # filter by cheirality + reprojection in both views
        z0 = X_c0[:, 2]
        X_c1 = X_c0 @ R_rel.T + t_rel
        z1 = X_c1[:, 2]
        r0 = X_c0[:, :2] / np.maximum(z0[:, None], 1e-9) - kf0.kp_xy[qi[sel]]
        r1 = X_c1[:, :2] / np.maximum(z1[:, None], 1e-9) - kf1.kp_xy[ti[sel]]
        thr = self._pnp_thr
        good = (
            (z0 > 0.1) & (z1 > 0.1) & (z0 < self.cfg.min_parallax_depth)
            & ((r0 ** 2).sum(1) < thr * thr) & ((r1 ** 2).sum(1) < thr * thr)
        )
        sel = sel[good]
        if sel.size == 0:
            return
        # world coords
        X_w = (X_c0[good] - kf0.tvec) @ R0  # R0^T (X - t0)
        slots = self._alloc_landmarks(sel.size)
        n = len(slots)
        self.lm_pos[slots] = X_w[:n]
        self.lm_desc[slots] = kf1.desc[ti[sel[:n]]]
        self.lm_valid[slots] = True
        # kf1 is about to be appended: its list index is len(keyframes)
        self.lm_anchor[slots] = len(self.keyframes)
        kf0.landmark_idx[qi[sel[:n]]] = slots
        kf1.landmark_idx[ti[sel[:n]]] = slots

    def _window_ba(self):
        """Sliding-window BA over the last `window_size` keyframes."""
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
        O = C * self.cfg.orb.n_features
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
        fixed = np.zeros(C, bool)
        fixed[0] = True
        if C > 1:
            fixed[1] = True  # freeze gauge + scale
        prob = ba.BAProblem(
            cam_rvec=jnp.asarray(np.stack([kf.rvec for kf in win])),
            cam_tvec=jnp.asarray(np.stack([kf.tvec for kf in win])),
            points=jnp.asarray(pts),
            obs_cam=jnp.asarray(obs_cam),
            obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv),
            obs_valid=jnp.asarray(obs_valid),
            fixed_cams=jnp.asarray(fixed),
        )
        opt, _ = ba.bundle_adjust(prob, iters=self.cfg.ba_iters, huber_delta=self._huber)
        new_rv = np.asarray(opt.cam_rvec)
        new_tv = np.asarray(opt.cam_tvec)
        for ci, kf in enumerate(win):
            kf.rvec = new_rv[ci]
            kf.tvec = new_tv[ci]
        self.lm_pos[seen] = np.asarray(opt.points)[: seen.size]

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
        return pos, desc, val, n

    def _retrieve(self, desc, valid, exclude_recent):
        """Vote old keyframes by descriptor matches (DB padded to a
        multiple of 8 keyframes so the matmul shape is sticky)."""
        k = len(self.keyframes) - exclude_recent
        if k < 1:
            return []
        db_desc = np.stack([kf.desc for kf in self.keyframes[:k]])
        db_valid = np.stack([kf.kp_valid for kf in self.keyframes[:k]])
        pad = (-k) % 8
        if pad:
            db_desc = np.concatenate([db_desc, np.zeros((pad,) + db_desc.shape[1:], db_desc.dtype)])
            db_valid = np.concatenate([db_valid, np.zeros((pad,) + db_valid.shape[1:], bool)])
        cands = loop_closure.retrieve_candidates(
            desc, valid, db_desc, db_valid,
            exclude_recent=0, min_votes=self.cfg.loop_min_votes,
        )
        return [c for c in cands if c.kf_index < k]

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
        cands = self._retrieve(kf.desc, kf.kp_valid, cfg.loop_exclude_recent)
        for cand in cands:
            i = cand.kf_index
            pos, desc, val, n = self._candidate_landmarks(i)
            if n < cfg.loop_min_inliers:
                continue
            out = loop_closure.verify_candidate(
                self._next_key(), kf.kp_xy, kf.desc, kf.kp_valid,
                pos, desc, val,
                min_inliers=cfg.loop_min_inliers, threshold=self._pnp_thr,
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
        R_old = np.asarray(_rodrigues_batch(jnp.asarray(old_rv)))
        R_new = np.asarray(_rodrigues_batch(jnp.asarray(new_rv)))
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
        # pose history: T_f' = (T_f T_a_old^-1) T_a_new, a = last KF <= f
        kf_fids = np.array([k.frame_id for k in self.keyframes])
        for f in range(len(self.poses)):
            a = int(np.searchsorted(kf_fids, f, side="right")) - 1
            if a < 0:
                continue
            rv_f, tv_f = self.poses[f]
            Rf = np.asarray(rodrigues(jnp.asarray(rv_f, jnp.float32)))
            Rrel = Rf @ R_old[a].T
            trel = tv_f - Rrel @ old_tv[a]
            Rp = Rrel @ R_new[a]
            tp = Rrel @ new_tv[a] + trel
            self.poses[f] = (
                np.asarray(rodrigues_inv(jnp.asarray(Rp, jnp.float32))),
                tp.astype(np.float32),
            )

    def _relocalize(self, xy, desc, valid):
        """Tracking lost: retrieval over ALL keyframes + PnP verification
        against each candidate's local landmarks."""
        cands = self._retrieve(desc, valid, 0)
        for cand in cands:
            pos, cdesc, val, n = self._candidate_landmarks(cand.kf_index)
            if n < self.cfg.min_track_inliers:
                continue
            out = loop_closure.verify_candidate(
                self._next_key(), xy, desc, valid, pos, cdesc, val,
                min_inliers=self.cfg.min_track_inliers,
                threshold=2.0 * self._pnp_thr,
            )
            if out is not None:
                self.relocalizations += 1
                return out[0], out[1]
        return None

    # ---------- public API ----------

    @staticmethod
    def _camera_center(rvec, tvec):
        R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
        return -R.T @ tvec

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
                return self.poses[-1]
            kf = Keyframe(
                frame_id,
                np.zeros(3, np.float32), np.zeros(3, np.float32),
                xy, desc, valid, np.full(xy.shape[0], -1, np.int64),
            )
            self.keyframes.append(kf)
            self.poses.append((kf.rvec, kf.tvec))
            self.state = "bootstrapping"
            self._prev_img = img
            return kf.rvec, kf.tvec

        if self.state == "bootstrapping":
            xy, desc, valid = self._detect_frame(img)
            out = self._bootstrap(self.keyframes[0], xy, desc, valid, frame_id)
            self._prev_img = img
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
        if klt:
            out = self._track_klt(img)
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
                return self.poses[-1]
            # KLT thinned out: fall through to the ORB matcher

        xy, desc, valid = self._detect_frame(img)
        out = self._track(xy, desc, valid)
        self._prev_img = img
        if out is None:
            # tracking lost: try retrieval-based relocalization before
            # falling back to holding the last pose
            rel = self._relocalize(xy, desc, valid) if self.cfg.relocalize else None
            if rel is None:
                self.poses.append(self.poses[-1])
                return self.poses[-1]
            self.poses.append(rel)
            return rel
        rvec, tvec, n_inl, lm_idx = out
        self.poses.append((rvec, tvec))
        self._maybe_keyframe(frame_id, rvec, tvec, xy, desc, valid, lm_idx, n_inl)
        if klt:
            src = self.keyframes[-1]
            self._reseed_klt(src.kp_xy, src.kp_valid, src.landmark_idx)
        return rvec, tvec

    def trajectory(self) -> np.ndarray:
        """[F,3] camera centers in world frame."""
        return np.stack(
            [self._camera_center(rv, tv) for (rv, tv) in self.poses]
        )
