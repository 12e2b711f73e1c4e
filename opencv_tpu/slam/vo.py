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

from opencv_tpu.core.config import MatchConfig, ORBConfig, RansacConfig
from opencv_tpu.geometry import decompose, epipolar, homography as hom_mod, pnp
from opencv_tpu.geometry.rotation import rodrigues, rodrigues_inv
from opencv_tpu.ops import matching, orb
from opencv_tpu.optim import ba


@dataclasses.dataclass(frozen=True)
class VOConfig:
    orb: ORBConfig = ORBConfig(n_features=1000)
    match: MatchConfig = MatchConfig(ratio=0.8, cross_check=True)
    # RANSAC thresholds in normalized coords (px / focal ~ 1.5px @ f=700)
    essential_threshold: float = 2e-3
    pnp_threshold: float = 3e-3
    n_hypotheses: int = 1024
    min_track_inliers: int = 30
    keyframe_min_inliers: int = 60  # below this tracked count -> new KF
    keyframe_min_baseline: float = 0.12  # relative translation trigger
    min_bootstrap_parallax: float = 0.015  # normalized units (~10px @ f=700)
    max_landmarks: int = 8192
    window_size: int = 6
    window_landmark_cap: int = 2048
    ba_iters: int = 12
    min_parallax_depth: float = 120.0  # reject triangulations beyond this


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
        self._detect = jax.jit(
            functools.partial(orb.detect_and_compute, config=config.orb)
        )

    # ---------- small helpers ----------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _normalize(self, xy: np.ndarray) -> np.ndarray:
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        return np.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy], axis=1)

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
        if np.median(disp[mv]) < self.cfg.min_bootstrap_parallax:
            return None
        x0 = jnp.asarray(kf0.kp_xy)
        x1full = jnp.asarray(xy1)
        xq = x0[jnp.asarray(qi)]
        xt = x1full[jnp.asarray(ti)]
        res = epipolar.find_essential_ransac(
            self._next_key(), xq, xt,
            valid=jnp.asarray(mv),
            cfg=RansacConfig(
                n_hypotheses=self.cfg.n_hypotheses,
                threshold=self.cfg.essential_threshold,
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
                threshold=self.cfg.essential_threshold,
            ),
        )
        use_h = bool(hres.ok) and int(hres.n_inliers) > 1.2 * int(res.n_inliers)
        if use_h:
            out = self._pose_from_homography(hres, xq, xt)
        else:
            rec = epipolar.recover_pose(res.model, xq, xt, res.inliers)
            out = (
                (np.asarray(rec.R), np.asarray(rec.t), rec.mask)
                if int(rec.n_good) >= 40
                else None
            )
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
        slots = self._alloc_landmarks(n_new)
        sel = np.flatnonzero(good)[: len(slots)]
        self.lm_pos[slots] = X[sel]
        self.lm_desc[slots] = desc1[ti[sel]]
        self.lm_valid[slots] = True
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
        best = None
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
            good = (z1 > 0) & (z2 > 0) & np.asarray(hres.inliers)
            n_good = int(good.sum())
            if best is None or n_good > best[3]:
                best = (R, t, good, n_good)
        if best is None or best[3] < 40:
            return None
        return best[0], best[1], jnp.asarray(best[2])

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
            valid=jnp.asarray(mv),
            cfg=RansacConfig(
                n_hypotheses=self.cfg.n_hypotheses,
                threshold=self.cfg.pnp_threshold,
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

    def _maybe_keyframe(self, frame_id, rvec, tvec, xy, desc, valid, lm_idx, n_inl):
        kf_last = self.keyframes[-1]
        baseline = np.linalg.norm(
            self._camera_center(rvec, tvec)
            - self._camera_center(kf_last.rvec, kf_last.tvec)
        )
        scene_depth = np.median(
            self.lm_pos[self.lm_valid][:, 2]
        ) if self.lm_valid.any() else 1.0
        need = (
            n_inl < self.cfg.keyframe_min_inliers
            or baseline > self.cfg.keyframe_min_baseline * max(scene_depth, 1e-6)
        )
        if not need:
            return
        kf = Keyframe(frame_id, rvec.copy(), tvec.copy(), xy, desc, valid, lm_idx.copy())
        self._triangulate_new(kf_last, kf)
        self.keyframes.append(kf)
        self._window_ba()

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
        thr = self.cfg.pnp_threshold
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
        opt, _ = ba.bundle_adjust(prob, iters=self.cfg.ba_iters, huber_delta=5e-3)
        new_rv = np.asarray(opt.cam_rvec)
        new_tv = np.asarray(opt.cam_tvec)
        for ci, kf in enumerate(win):
            kf.rvec = new_rv[ci]
            kf.tvec = new_tv[ci]
        self.lm_pos[seen] = np.asarray(opt.points)[: seen.size]

    # ---------- public API ----------

    @staticmethod
    def _camera_center(rvec, tvec):
        R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
        return -R.T @ tvec

    def process(self, img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Process one grayscale frame; returns (rvec, tvec) world->cam."""
        xy, desc, valid = self._detect_frame(img)
        frame_id = self.frames
        self.frames += 1

        if self.state == "init":
            kf = Keyframe(
                frame_id,
                np.zeros(3, np.float32), np.zeros(3, np.float32),
                xy, desc, valid, np.full(xy.shape[0], -1, np.int64),
            )
            self.keyframes.append(kf)
            self.poses.append((kf.rvec, kf.tvec))
            self.state = "bootstrapping"
            return kf.rvec, kf.tvec

        if self.state == "bootstrapping":
            out = self._bootstrap(self.keyframes[0], xy, desc, valid, frame_id)
            if out is None:
                # not enough parallax yet: report previous pose
                self.poses.append(self.poses[-1])
                return self.poses[-1]
            self.state = "tracking"
            self.poses.append(out)
            return out

        out = self._track(xy, desc, valid)
        if out is None:
            # tracking lost: hold pose (re-localization is a later round)
            self.poses.append(self.poses[-1])
            return self.poses[-1]
        rvec, tvec, n_inl, lm_idx = out
        self.poses.append((rvec, tvec))
        self._maybe_keyframe(frame_id, rvec, tvec, xy, desc, valid, lm_idx, n_inl)
        return rvec, tvec

    def trajectory(self) -> np.ndarray:
        """[F,3] camera centers in world frame."""
        return np.stack(
            [self._camera_center(rv, tv) for (rv, tv) in self.poses]
        )
