"""Loop-closure detection and pose-graph correction.

No reference analog exists (the fork is a library; SURVEY.md §7.8 makes
this a required new component for the SLAM engine). Pipeline:

1. retrieval: match the query keyframe's descriptors against the whole
   keyframe database in ONE batched Hamming matmul ([Nq] x [K*N]); vote
   per keyframe by match count (a brute-force bag-of-features — exact,
   and at TPU matmul speed cheaper than a vocabulary tree for thousands
   of keyframes; the map-sharded variant in parallel/dist_match.py
   scales it across chips);
2. verification: 3D-2D PnP-RANSAC of the query's observations against
   the candidate's landmarks — metric relative pose, no mono-scale
   ambiguity inside an established map;
3. correction: insert the loop edge into a pose graph over keyframes
   (odometry edges from current estimates) and relax
   (optim/pose_graph.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.core.config import MatchConfig, RansacConfig
from opencv_tpu.geometry import pnp
from opencv_tpu.geometry.rotation import rodrigues, rodrigues_inv
from opencv_tpu.ops import matching
from opencv_tpu.optim import pose_graph


class LoopCandidate(NamedTuple):
    kf_index: int
    n_votes: int


@functools.partial(jax.jit, static_argnums=1)
def _optimize_jit(g, iters):
    return pose_graph.optimize(g, iters=iters)


def retrieve_candidates(
    query_desc: np.ndarray,
    query_valid: np.ndarray,
    db_desc: np.ndarray,  # [K, N, 8]
    db_valid: np.ndarray,  # [K, N]
    exclude_recent: int = 5,
    min_votes: int = 30,
    max_candidates: int = 3,
    ratio: float = 0.8,
) -> list[LoopCandidate]:
    """Vote keyframes by ratio-tested descriptor matches."""
    k, n, _ = db_desc.shape
    if k <= exclude_recent:
        return []
    flat_desc = db_desc[: k - exclude_recent].reshape(-1, 8)
    flat_valid = db_valid[: k - exclude_recent].reshape(-1)
    m = matching.knn_match_auto(
        jnp.asarray(query_desc), jnp.asarray(flat_desc),
        query_valid=jnp.asarray(query_valid), train_valid=jnp.asarray(flat_valid),
        config=MatchConfig(ratio=ratio, cross_check=False),
    )
    v = np.asarray(m.valid)
    owner = np.asarray(m.train_idx)[v] // n  # keyframe index per match
    votes = np.bincount(owner, minlength=k - exclude_recent)
    order = np.argsort(-votes)
    out = []
    for kf in order[:max_candidates]:
        if votes[kf] >= min_votes:
            out.append(LoopCandidate(int(kf), int(votes[kf])))
    return out


def verify_candidate(
    key: jax.Array,
    query_xy: np.ndarray,  # [N, 2] normalized coords of query keyframe
    query_desc: np.ndarray,
    query_valid: np.ndarray,
    cand_landmark_pos: np.ndarray,  # [M, 3] world positions
    cand_landmark_desc: np.ndarray,  # [M, 8]
    cand_landmark_valid: np.ndarray,
    min_inliers: int = 25,
    threshold: float = 3e-3,
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """PnP of query 2D points against candidate's 3D landmarks.
    Returns (rvec, tvec, n_inliers) of the query pose in WORLD frame, or
    None if verification fails."""
    m = matching.knn_match(
        jnp.asarray(query_desc), jnp.asarray(cand_landmark_desc),
        query_valid=jnp.asarray(query_valid),
        train_valid=jnp.asarray(cand_landmark_valid),
        config=MatchConfig(cross_check=False),
    )
    mv = np.asarray(m.valid)
    if mv.sum() < min_inliers:
        return None
    obj = jnp.asarray(cand_landmark_pos)[jnp.asarray(m.train_idx)]
    res = pnp.solve_pnp_ransac(
        key, obj, jnp.asarray(query_xy),
        valid=jnp.asarray(mv),
        cfg=RansacConfig(n_hypotheses=1024, threshold=threshold),
    )
    n_inl = int(res.n_inliers)
    if not bool(res.ok) or n_inl < min_inliers:
        return None
    return np.asarray(res.rvec), np.asarray(res.tvec), n_inl


def correct_poses(
    kf_rvecs: np.ndarray,  # [K, 3] current (drifted) estimates
    kf_tvecs: np.ndarray,  # [K, 3]
    loop_i: int,
    loop_j: int,
    loop_rel: tuple[np.ndarray, np.ndarray],  # measured T_i * T_j^-1
    loop_weight: float = 10.0,
    iters: int = 20,
) -> tuple[np.ndarray, np.ndarray]:
    """Build the pose graph (consecutive odometry edges from current
    estimates + one trusted loop edge) and relax it."""
    k = kf_rvecs.shape[0]
    # consecutive odometry edges in ONE vmapped call (the per-edge eager
    # loop costs a device round trip per edge on a remote TPU client)
    rv = jnp.asarray(kf_rvecs, jnp.float32)
    tv = jnp.asarray(kf_tvecs, jnp.float32)
    rr, tt = jax.vmap(pose_graph.relative_pose)(
        rv[:-1], tv[:-1], rv[1:], tv[1:]
    )
    odo_meas = np.concatenate(
        [np.asarray(rr), np.asarray(tt)], axis=1
    ).astype(np.float32)
    ei = np.concatenate([np.arange(k - 1), [loop_i]]).astype(np.int32)
    ej = np.concatenate([np.arange(1, k), [loop_j]]).astype(np.int32)
    meas = np.concatenate(
        [
            odo_meas,
            np.concatenate(
                [np.asarray(loop_rel[0]), np.asarray(loop_rel[1])]
            ).astype(np.float32)[None],
        ]
    )
    wts = np.concatenate([np.ones(k - 1), [loop_weight]]).astype(np.float32)
    fixed = np.zeros(k, bool)
    fixed[0] = True
    # pad nodes/edges to buckets of 16 so the solver program shape is
    # sticky across closures (every distinct shape is another ~10 s
    # compile-or-load on a remote TPU client). Padding nodes are fixed
    # and padding edges carry weight 0 — they contribute nothing.
    kp = ((k + 15) // 16) * 16
    if kp != k:
        pad_n = kp - k
        rv = jnp.concatenate([rv, jnp.zeros((pad_n, 3), jnp.float32)])
        tv = jnp.concatenate([tv, jnp.zeros((pad_n, 3), jnp.float32)])
        fixed = np.concatenate([fixed, np.ones(pad_n, bool)])
    ep = ((len(ei) + 15) // 16) * 16
    if ep != len(ei):
        pad_e = ep - len(ei)
        ei = np.concatenate([ei, np.zeros(pad_e, np.int32)])
        ej = np.concatenate([ej, np.zeros(pad_e, np.int32)])
        zero_meas = np.zeros((pad_e, 6), np.float32)
        meas = np.concatenate([meas, zero_meas])
        wts = np.concatenate([wts, np.zeros(pad_e, np.float32)])
    g = pose_graph.PoseGraph(
        rvec=rv,
        tvec=tv,
        edge_i=jnp.asarray(ei.astype(np.int32)),
        edge_j=jnp.asarray(ej.astype(np.int32)),
        edge_meas=jnp.asarray(meas.astype(np.float32)),
        edge_weight=jnp.asarray(wts.astype(np.float32)),
        fixed=jnp.asarray(fixed),
    )
    opt, _ = _optimize_jit(g, iters)
    out_rv, out_tv = jax.device_get((opt.rvec, opt.tvec))
    return out_rv[:k], out_tv[:k]


def relative_from_world_poses(
    rvec_i: np.ndarray, tvec_i: np.ndarray, rvec_j: np.ndarray, tvec_j: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    rr, tt = pose_graph.relative_pose(
        jnp.asarray(rvec_i), jnp.asarray(tvec_i),
        jnp.asarray(rvec_j), jnp.asarray(tvec_j),
    )
    return np.asarray(rr), np.asarray(tt)
