"""Global (multi-image) panorama estimation: focal autocalibration,
max-spanning-tree rotation propagation, ray bundle adjustment, DP seam
finding, N-image composition.

Reference: stitching/src/autocalib.cpp (`focalsFromHomography`,
`estimateFocal`), motion_estimators.cpp (`HomographyBasedEstimator`,
`findMaxSpanningTree` :1096, `BundleAdjusterRay::estimate` :221-310 with
forward-difference Jacobians over CvLevMarq), seam_finders.cpp (DP seam),
stitcher.cpp (the pipeline driver).

TPU-native split: the pose graph work (MST, BFS propagation, pair
bookkeeping) is tiny host logic in numpy — exactly the control-plane the
reference runs on one thread — while everything batch-numeric (pairwise
ORB matching, homography RANSAC, the ray-BA residual stack over all
edges at once with autodiff Jacobians, warps, seams, blending) is jitted
JAX. The BA improves on the reference: analytic-AD Jacobians and one
dense LM over [3N+1] params instead of numeric differencing.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import MatchConfig, ORBConfig, RansacConfig
from opencv_tpu.geometry import homography as hom
from opencv_tpu.geometry.rotation import project_to_rotation, rodrigues
from opencv_tpu.ops import matching, orb
from opencv_tpu.optim.levmarq import levmarq
from opencv_tpu.stitching.blend import multiband_blend


# ------------------------------------------------------------ autocalib ---

def focals_from_homography(H: np.ndarray) -> tuple[float | None, float | None]:
    """(f0, f1) estimates from a rotation-only homography H: x1 ~ H x0
    (autocalib.cpp focalsFromHomography). Returns None where the
    discriminant goes negative (non-rotational H)."""
    h = np.asarray(H, np.float64).reshape(-1)

    d1 = h[6] * h[7]
    d2 = (h[7] - h[6]) * (h[7] + h[6])
    v1 = -(h[0] * h[1] + h[3] * h[4]) / d1 if abs(d1) > 1e-12 else -1.0
    v2 = (
        (h[0] * h[0] + h[3] * h[3] - h[1] * h[1] - h[4] * h[4]) / d2
        if abs(d2) > 1e-12
        else -1.0
    )
    f1 = None
    if v1 < v2:
        v1, v2 = v2, v1
        d1, d2 = d2, d1
    if v1 > 0 and v2 > 0:
        f1 = math.sqrt(v1 if abs(d1) > abs(d2) else v2)
    elif v1 > 0:
        f1 = math.sqrt(v1)

    d1 = h[0] * h[3] + h[1] * h[4]
    d2 = h[0] * h[0] + h[1] * h[1] - h[3] * h[3] - h[4] * h[4]
    v1 = -h[2] * h[5] / d1 if abs(d1) > 1e-12 else -1.0
    v2 = (h[5] * h[5] - h[2] * h[2]) / d2 if abs(d2) > 1e-12 else -1.0
    f0 = None
    if v1 < v2:
        v1, v2 = v2, v1
        d1, d2 = d2, d1
    if v1 > 0 and v2 > 0:
        f0 = math.sqrt(v1 if abs(d1) > abs(d2) else v2)
    elif v1 > 0:
        f0 = math.sqrt(v1)
    return f0, f1


def estimate_focal(
    homographies: dict[tuple[int, int], np.ndarray], shapes: list[tuple[int, int]]
) -> float:
    """Median focal over all pairwise estimates (autocalib.cpp
    estimateFocal); falls back to the reference's sqrt(w*h)-style guess
    when no pair yields one. Homographies must be CENTERED (principal
    point at the image center) — callers conjugate by the centering
    translation first."""
    ests = []
    for (_, _), H in homographies.items():
        f0, f1 = focals_from_homography(H)
        if f0 is not None and f1 is not None:
            ests.append(math.sqrt(f0 * f1))
    if ests:
        return float(np.median(ests))
    h, w = shapes[0]
    return float(w + h)


# ---------------------------------------------- rotation initialization ---

def max_spanning_tree(
    n: int, edges: list[tuple[int, int]], conf: list[float]
) -> list[tuple[int, int]]:
    """Prim max-spanning-tree; returns (parent, child) edges in BFS order
    from the highest-degree node (findMaxSpanningTree analog)."""
    adj: dict[int, list[tuple[float, int]]] = {i: [] for i in range(n)}
    for (i, j), c in zip(edges, conf):
        adj[i].append((c, j))
        adj[j].append((c, i))
    root = max(range(n), key=lambda i: len(adj[i]))
    in_tree = {root}
    out: list[tuple[int, int]] = []
    while len(in_tree) < n:
        best = None
        for i in in_tree:
            for c, j in adj[i]:
                if j not in in_tree and (best is None or c > best[0]):
                    best = (c, i, j)
        if best is None:
            raise ValueError("match graph is disconnected")
        _, i, j = best
        in_tree.add(j)
        out.append((i, j))
    return out


def propagate_rotations(
    n: int,
    homographies: dict[tuple[int, int], np.ndarray],
    tree: list[tuple[int, int]],
    f: float,
) -> np.ndarray:
    """R_i per image from centered pairwise homographies H_ij (x_j ~ H x_i)
    over the spanning tree: R_j = R_i @ proj_SO3(K^-1 H_ij K) with the
    root at identity (HomographyBasedEstimator / CalcRotation,
    motion_estimators.cpp:60)."""
    K = np.diag([f, f, 1.0])
    Kinv = np.diag([1.0 / f, 1.0 / f, 1.0])
    R = [np.eye(3) for _ in range(n)]
    for i, j in tree:
        if (i, j) in homographies:
            H = homographies[(i, j)]
            rel = Kinv @ H @ K  # camera-i ray -> camera-j ray
        else:
            H = homographies[(j, i)]
            rel = np.linalg.inv(Kinv @ H @ K)
        rel = np.asarray(project_to_rotation(jnp.asarray(rel, jnp.float32)))
        R[j] = rel @ R[i]
    return np.stack(R)


# ------------------------------------------------------------- ray BA ---

def refine_rotations_ba(
    R0: np.ndarray,
    f0: float,
    pair_pts: list[tuple[int, int, np.ndarray, np.ndarray, np.ndarray]],
    iters: int = 20,
) -> tuple[np.ndarray, float]:
    """Bundle-adjust rotations + shared focal on ray agreement
    (BundleAdjusterRay semantics: 3 residuals per match — the unit-sphere
    ray difference). pair_pts: (i, j, xy_i [M,2] centered px, xy_j [M,2],
    w [M] 0/1 mask). Returns (R [N,3,3], f)."""
    n = R0.shape[0]
    i_idx = np.array([p[0] for p in pair_pts])
    j_idx = np.array([p[1] for p in pair_pts])
    xi = jnp.asarray(np.stack([p[2] for p in pair_pts]), jnp.float32)  # [E,M,2]
    xj = jnp.asarray(np.stack([p[3] for p in pair_pts]), jnp.float32)
    wm = jnp.asarray(np.stack([p[4] for p in pair_pts]), jnp.float32)  # [E,M]

    # params: [N*3 rotation increments (about R0)] + [log f]
    x0 = jnp.zeros((n * 3 + 1,), jnp.float32).at[-1].set(jnp.log(jnp.float32(f0)))
    R0j = jnp.asarray(R0, jnp.float32)

    def rays(xy, R, f):
        p = jnp.concatenate(
            [xy / f, jnp.ones_like(xy[..., :1])], axis=-1
        )  # K^-1 x
        r = p @ R  # R^T applied to rows: camera ray -> world ray
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True)

    def residual(params):
        f = jnp.exp(params[-1])
        dr = params[:-1].reshape(n, 3)
        Rs = jax.vmap(lambda d, r0: rodrigues(d) @ r0)(dr, R0j)  # [N,3,3]
        ri = rays(xi, Rs[i_idx], f)  # [E,M,3]
        rj = rays(xj, Rs[j_idx], f)
        # scale by f: unit-ray differences vanish as f grows (every ray
        # collapses onto the axis), so the raw difference has a bogus
        # optimum at f=inf; f * diff ~ arc length in PIXELS — the same
        # `mult` the reference applies (motion_estimators.cpp Ray error)
        return (f * (ri - rj) * wm[..., None]).reshape(-1)

    res = levmarq(residual, x0, iters=iters)
    params = res.params
    f = float(jnp.exp(params[-1]))
    dr = np.asarray(params[:-1]).reshape(n, 3)
    R = np.stack(
        [np.asarray(rodrigues(jnp.asarray(dr[k]))) @ R0[k] for k in range(n)]
    )
    return R, f


# ------------------------------------------------------------- DP seam ---

def dp_seam(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimal vertical seam through a cost image [H, W] (DpSeamFinder
    analog, seam_finders.cpp): returns the per-row seam column i32 [H].
    Forward lax.scan accumulates the DP table; a reverse scan backtracks."""
    h, w = cost.shape
    big = jnp.float32(1e9)

    def fwd(carry, row):
        prev = carry
        left = jnp.concatenate([jnp.full((1,), big), prev[:-1]])
        right = jnp.concatenate([prev[1:], jnp.full((1,), big)])
        stacked = jnp.stack([left, prev, right])  # [3, W]
        choice = jnp.argmin(stacked, axis=0)  # 0=left,1=mid,2=right
        cur = row + jnp.min(stacked, axis=0)
        return cur, choice

    dp_last, choices = lax.scan(fwd, cost[0], cost[1:])  # choices [H-1, W]
    end = jnp.argmin(dp_last)

    def back(carry, choice):
        x = carry  # column at row k+1
        x_prev = x + choice[x] - 1  # choice 0/1/2 -> dx -1/0/+1
        return x_prev, x

    x_row0, xs = lax.scan(back, end, choices, reverse=True)  # xs[k]=col(k+1)
    return jnp.concatenate([x_row0[None], xs]).astype(jnp.int32)


def seam_masks(
    img0: jnp.ndarray, m0: jnp.ndarray, img1: jnp.ndarray, m1: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split an overlap with a DP seam: pixels left of the seam keep
    img0, right of it img1 (non-overlap regions keep their owner)."""
    overlap = m0 & m1
    diff = jnp.abs(img0 - img1)
    cost = jnp.where(overlap, diff, 1e4)
    seam = dp_seam(cost)  # [H]
    xx = lax.broadcasted_iota(jnp.int32, img0.shape, 1)
    left_of = xx < seam[:, None]
    new0 = m0 & (~overlap | left_of)
    new1 = m1 & (~overlap | ~left_of)
    return new0, new1


# ------------------------------------------------------------ pipeline ---

def _spherical_warp_rot(
    img: jnp.ndarray, f: float, R: np.ndarray, canvas: tuple[int, int],
    scale: float, theta0: float, phi0: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp one image onto the shared equirectangular canvas given its
    rotation (world ray -> camera ray = R @ s). Returns (warped, mask)."""
    h, w = img.shape
    out_h, out_w = canvas
    cx, cy = w / 2.0, h / 2.0
    theta = theta0 + jnp.arange(out_w, dtype=jnp.float32)[None, :] / scale
    phi = phi0 + jnp.arange(out_h, dtype=jnp.float32)[:, None] / scale
    s = jnp.stack(
        [
            jnp.broadcast_to(jnp.sin(theta) * jnp.cos(phi), canvas),
            jnp.broadcast_to(jnp.sin(phi) * jnp.ones_like(theta), canvas),
            jnp.broadcast_to(jnp.cos(theta) * jnp.cos(phi), canvas),
        ],
        axis=-1,
    )  # [H, W, 3] world rays
    Rj = jnp.asarray(R, jnp.float32)
    cam = s @ Rj.T  # camera rays
    z = cam[..., 2]
    x = f * cam[..., 0] / jnp.maximum(z, 1e-6) + cx
    y = f * cam[..., 1] / jnp.maximum(z, 1e-6) + cy
    xy = jnp.stack([x, y], axis=-1)
    valid = (
        (z > 1e-6)
        & (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    )
    return jnp.where(valid, imgproc.bilinear_sample(img, xy), 0.0), valid


def estimate_panorama(
    images: list[np.ndarray],
    n_features: int = 800,
    conf_threshold: float = 1.0,
    seed: int = 0,
    ba_iters: int = 20,
    match_cap: int = 256,
):
    """Feature-match all pairs, autocalibrate focal, propagate rotations
    over the max-spanning-tree, bundle-adjust (estimateTransform analog,
    stitcher.cpp:122-148). Returns (R [N,3,3], f, pair diagnostics)."""
    n = len(images)
    cfg = ORBConfig(n_features=n_features, n_levels=4)
    kps, descs = [], []
    for im in images:
        kp, d = orb.detect_and_compute(jnp.asarray(im, jnp.float32), cfg)
        kps.append(kp)
        descs.append(d)

    homographies: dict[tuple[int, int], np.ndarray] = {}
    edges, confs, pair_pts = [], [], []
    key = jax.random.PRNGKey(seed)
    for i in range(n):
        for j in range(i + 1, n):
            m = matching.knn_match(
                descs[i], descs[j],
                query_valid=kps[i].valid, train_valid=kps[j].valid,
                config=MatchConfig(),
            )
            n_matches = int(np.sum(np.asarray(m.valid)))
            if n_matches < 8:
                continue
            key, sub = jax.random.split(key)
            res = hom.find_homography_ransac(
                sub,
                kps[i].xy[m.query_idx], kps[j].xy[m.train_idx],  # x_j ~ H x_i
                valid=m.valid,
                cfg=RansacConfig(n_hypotheses=512, threshold=3.0),
            )
            n_inl = int(np.asarray(res.n_inliers))
            conf = n_inl / (8.0 + 0.3 * n_matches)  # matchers.cpp formula
            if conf < conf_threshold or not bool(res.ok):
                continue
            # center the homography (principal point at the image center)
            hi, wi = images[i].shape
            hj, wj = images[j].shape
            Ti = np.array([[1, 0, -wi / 2.0], [0, 1, -hi / 2.0], [0, 0, 1]])
            Tj = np.array([[1, 0, -wj / 2.0], [0, 1, -hj / 2.0], [0, 0, 1]])
            Hc = Tj @ np.asarray(res.model, np.float64) @ np.linalg.inv(Ti)
            homographies[(i, j)] = Hc / Hc[2, 2]
            edges.append((i, j))
            confs.append(conf)
            # centered match points for BA (fixed cap, mask-padded)
            inl = np.asarray(res.inliers) & np.asarray(m.valid)
            qi = np.asarray(kps[i].xy[m.query_idx])[:, :2] - [wi / 2.0, hi / 2.0]
            tj = np.asarray(kps[j].xy[m.train_idx])[:, :2] - [wj / 2.0, hj / 2.0]
            sel = np.where(inl)[0][:match_cap]
            pi = np.zeros((match_cap, 2), np.float32)
            pj = np.zeros((match_cap, 2), np.float32)
            wmask = np.zeros((match_cap,), np.float32)
            pi[: len(sel)] = qi[sel]
            pj[: len(sel)] = tj[sel]
            wmask[: len(sel)] = 1.0
            pair_pts.append((i, j, pi, pj, wmask))

    if not edges:
        raise ValueError("no confident image pairs")
    shapes = [im.shape for im in images]
    f = estimate_focal(homographies, shapes)
    tree = max_spanning_tree(n, edges, confs)
    R0 = propagate_rotations(n, homographies, tree, f)
    R, f = refine_rotations_ba(R0, f, pair_pts, iters=ba_iters)
    return R, f, {"edges": edges, "conf": confs, "tree": tree}


def stitch_panorama(
    images: list[np.ndarray],
    n_features: int = 800,
    seed: int = 0,
    use_seams: bool = True,
    blend_bands: int = 3,
    exposure_comp: str | None = "gain",
) -> np.ndarray:
    """Full N-image pipeline (Stitcher::stitch analog): estimate, warp
    onto a spherical canvas, exposure compensation ("gain" | "blocks" |
    None, stitching/src/exposure_compensate.cpp), DP seams, multiband
    blend."""
    R, f, _ = estimate_panorama(images, n_features=n_features, seed=seed)
    n = len(images)

    # canvas bounds: map every image's corner rays to (theta, phi)
    thetas, phis = [], []
    for k, im in enumerate(images):
        h, w = im.shape
        corners = np.array(
            [[-w / 2, -h / 2, 1], [w / 2, -h / 2, 1],
             [-w / 2, h / 2, 1], [w / 2, h / 2, 1],
             [0, 0, 1]],
            np.float64,
        )
        rays = (np.diag([1 / f, 1 / f, 1.0]) @ corners.T).T
        rays /= np.linalg.norm(rays, axis=1, keepdims=True)
        world = rays @ R[k]  # R^T ray
        thetas += list(np.arctan2(world[:, 0], world[:, 2]))
        phis += list(np.arcsin(np.clip(world[:, 1], -1, 1)))
    scale = f  # px per radian
    margin = 8.0 / scale
    theta0, theta1 = min(thetas) - margin, max(thetas) + margin
    phi0, phi1 = min(phis) - margin, max(phis) + margin
    out_w = int(np.ceil((theta1 - theta0) * scale))
    out_h = int(np.ceil((phi1 - phi0) * scale))
    canvas = (out_h, out_w)

    warped, masks = [], []
    for k, im in enumerate(images):
        wimg, m = _spherical_warp_rot(
            jnp.asarray(im, jnp.float32), f, R[k], canvas, scale, theta0, phi0
        )
        warped.append(wimg)
        masks.append(m)

    if exposure_comp == "gain":
        from opencv_tpu.stitching import exposure

        warped, _ = exposure.gain_compensate(warped, masks)
    elif exposure_comp == "blocks":
        from opencv_tpu.stitching import exposure

        warped, _ = exposure.block_gain_compensate(warped, masks)

    if use_seams:
        for a in range(n):
            for b in range(a + 1, n):
                if bool(jnp.any(masks[a] & masks[b])):
                    masks[a], masks[b] = seam_masks(
                        warped[a], masks[a], warped[b], masks[b]
                    )
    out = multiband_blend(warped, masks, n_bands=blend_bands)
    any_mask = masks[0]
    for m in masks[1:]:
        any_mask = any_mask | m
    return np.asarray(jnp.where(any_mask, out, 0.0))
