"""Two-view epipolar geometry: essential/fundamental estimation, pose
recovery, triangulation-based cheirality.

Reference: calib3d/src/five-point.cpp (`findEssentialMat` :405,
`decomposeEssentialMat` :643, `recoverPose` :461), fundam.cpp
(`run8Point` :604 normalized DLT).

TPU-native numerics: every nullspace is the smallest eigenvector of a
small symmetric Gram matrix (jnp.linalg.eigh — batched, f32-stable after
Hartley normalization) instead of a general SVD of a rectangular system;
rank-2 enforcement and E decomposition use 3x3 SVDs which XLA handles
batched. The RANSAC kernel is the 8-point algorithm: with thousands of
hypotheses scored at once (geometry/ransac.py) the larger minimal sample
costs hypotheses, not wall-clock — the classic 5-point polynomial solver
(five-point.cpp:40) trades terribly against f32 TPU arithmetic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core.config import RansacConfig
from opencv_tpu.geometry import ransac as ransac_mod

_P32 = lax.Precision.HIGHEST


def normalize_pixels(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords [...,2] -> normalized camera coords via K^-1
    (five-point.cpp:427-441 does the same (x-c)/f folding)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack(
        [(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1
    )


def _hartley_normalize(
    pts: jnp.ndarray, w: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Center + isotropic-scale points to mean distance sqrt(2).
    Returns (normalized [N,2], T [3,3]) with x_norm = T @ x_homo.
    Optional weights w [N] (0/1 masks) for inlier-restricted statistics."""
    if w is None:
        mean = jnp.mean(pts, axis=0)
        d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
        md = jnp.mean(d)
    else:
        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        mean = jnp.sum(pts * w[:, None], axis=0) / wsum
        d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
        md = jnp.sum(d * w) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(md, 1e-12)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype
    )
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    return (pts - mean) * scale, T


def _smallest_eigvec(gram: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a symmetric matrix."""
    _, vecs = jnp.linalg.eigh(gram)
    return vecs[..., 0]


def _nullspace(A: jnp.ndarray) -> jnp.ndarray:
    """Right singular vector of the smallest singular value of [..., M, K].

    Minimal samples (M < K, the RANSAC hypothesis shape) have an EXACT
    nullspace: the trailing columns of a complete QR of A^T span it, and
    batched Householder QR is ~20x faster than batched SVD on TPU
    (measured 0.66ms vs 13.7ms at [1024,8,9]) with the same numerics —
    no Gram squaring, no iteration. Overdetermined fits (the all-inlier
    polish) keep the direct SVD: there the nullspace is a least-squares
    direction, and SVD of the design (not eigh of A^T A, which squares
    the condition number — ~3 f32 digits) is the stable route, matching
    the reference's f64 run8Point (fundam.cpp:604).
    """
    m, k = A.shape[-2], A.shape[-1]
    if m < k:
        q, _ = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="complete")
        return q[..., :, k - 1]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[..., -1, :]


def _svd3_top2(A: jnp.ndarray, sweeps: int = 6):
    """Leading two singular triplets of [..., 3, 3] by one-sided (Hestenes)
    Jacobi — a fixed-trip elementwise loop in place of jnp.linalg.svd's
    multi-millisecond batched TPU path (4.5ms at [1024,3,3]; this is
    ~50us). Returns (u0, u1, s0, s1, v0, v1) with s0 >= s1.

    Only the top-2 triplets are produced because every caller builds a
    rank-2 reconstruction (essential / fundamental projection zeroes the
    third singular value), which sidesteps the rank-deficient-U column
    problem entirely."""
    B = A
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    cols = lambda M: (M[..., :, 0], M[..., :, 1], M[..., :, 2])
    b = list(cols(B))
    v = list(cols(V))
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            bp, bq = b[p], b[q]
            app = jnp.sum(bp * bp, -1)
            aqq = jnp.sum(bq * bq, -1)
            apq = jnp.sum(bp * bq, -1)
            # symSchur2 small-angle rotation (|t| <= 1): the atan2 form
            # picks ±pi/2 swaps when app > aqq, which stalls convergence
            d = aqq - app
            sgn = jnp.where(d >= 0.0, 1.0, -1.0)
            t = (
                sgn * 2.0 * apq
                / (jnp.abs(d) + jnp.sqrt(d * d + 4.0 * apq * apq) + 1e-30)
            )
            c = (1.0 / jnp.sqrt(1.0 + t * t))[..., None]
            s = (t * c[..., 0])[..., None]
            b[p], b[q] = c * bp - s * bq, s * bp + c * bq
            vp, vq = v[p], v[q]
            v[p], v[q] = c * vp - s * vq, s * vp + c * vq
    norms = [jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1), 0.0)) for x in b]

    # descending sort of 3 (value, U-col, V-col) triplets: static
    # compare-swap network
    def cswap(i, j):
        swap = (norms[j] > norms[i])[..., None]
        b[i], b[j] = (
            jnp.where(swap, b[j], b[i]),
            jnp.where(swap, b[i], b[j]),
        )
        v[i], v[j] = (
            jnp.where(swap, v[j], v[i]),
            jnp.where(swap, v[i], v[j]),
        )
        sw = swap[..., 0]
        norms[i], norms[j] = (
            jnp.where(sw, norms[j], norms[i]),
            jnp.where(sw, norms[i], norms[j]),
        )

    cswap(0, 1)
    cswap(0, 2)
    cswap(1, 2)
    u0 = b[0] / jnp.maximum(norms[0], 1e-20)[..., None]
    u1 = b[1] / jnp.maximum(norms[1], 1e-20)[..., None]
    return u0, u1, norms[0], norms[1], v[0], v[1]


def _epipolar_design(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Rows of the DLT system for x2^T E x1 = 0. [N, 9]."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )


def enforce_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold: singular values -> (s,s,0).
    Rank-2 reconstruction from the top-2 Jacobi triplets (the zeroed third
    singular value means U's null column never enters the product)."""
    u0, u1, s0, s1, v0, v1 = _svd3_top2(E)
    m = (s0 + s1) * 0.5
    return m[..., None, None] * (
        u0[..., :, None] * v0[..., None, :] + u1[..., :, None] * v1[..., None, :]
    )


def enforce_rank2(F: jnp.ndarray) -> jnp.ndarray:
    """Rank-2 projection keeping singular values (run8Point, fundam.cpp:604)."""
    u0, u1, s0, s1, v0, v1 = _svd3_top2(F)
    return (
        s0[..., None, None] * u0[..., :, None] * v0[..., None, :]
        + s1[..., None, None] * u1[..., :, None] * v1[..., None, :]
    )


def eight_point(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    essential: bool = True,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized 8-point algorithm on [N>=8, 2] correspondences.

    Returns (E_or_F [3,3], ok). Hartley-normalizes, solves the design
    nullspace, projects to the essential/rank-2 manifold, denormalizes.
    `weights` (0/1) restricts the fit to inliers — used by the RANSAC
    polish step.
    """
    x1n, T1 = _hartley_normalize(x1, weights)
    x2n, T2 = _hartley_normalize(x2, weights)
    A = _epipolar_design(x1n, x2n)
    if weights is not None:
        A = A * weights[:, None]
    e = _nullspace(A)
    En = e.reshape(3, 3)
    if essential:
        # IMPORTANT: denormalize FIRST. The Hartley transforms are affine,
        # so the true matrix is only *essential* (equal singular values) in
        # the original camera frame — projecting in the normalized frame
        # injects genuine model error.
        E = T2.T @ En @ T1
        E = enforce_essential(E)
    else:
        # rank-2ness survives the (full-rank) denormalization, so project
        # in the normalized frame like run8Point (fundam.cpp:604).
        E = T2.T @ enforce_rank2(En) @ T1
    nrm = jnp.linalg.norm(E)
    ok = (nrm > 1e-12) & jnp.all(jnp.isfinite(E))
    E = E / jnp.maximum(nrm, 1e-12)
    return E, ok


def sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance, squared
    (five-point.cpp:373 computeError). x1, x2: [N,2]."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)  # [N,3]
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = p1 @ E.T  # [N,3]
    Etx2 = p2 @ E
    num = jnp.sum(p2 * Ex1, axis=-1) ** 2
    den = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def triangulate_normalized(
    R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """Linear (DLT) triangulation for P1=[I|0], P2=[R|t], normalized image
    points [N,2] -> world points [N,3] (cam-1 frame).

    Analog of cv::triangulatePoints (calib3d/src/triangulate.cpp:346) with
    the SVD replaced by a batched 4x4 symmetric eigensolve.
    """
    P1 = jnp.concatenate([jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], axis=1)
    P2 = jnp.concatenate([R, t.reshape(3, 1)], axis=1)

    def rows(P, x):
        # x * P[2] - P[0],  y * P[2] - P[1]
        return jnp.stack(
            [x[..., 0, None] * P[2] - P[0], x[..., 1, None] * P[2] - P[1]], axis=-2
        )  # [N,2,4]

    A = jnp.concatenate([rows(P1, x1), rows(P2, x2)], axis=-2)  # [N,4,4]
    # inhomogeneous linear LS (w=1 gauge): solve B X = -a with B=A[:, :3],
    # a=A[:, 3] via the closed-form 3x3 normal equations. Equivalent to
    # the homogeneous DLT away from infinity, and ~50x faster than the
    # batched 4x4 eigensolve on TPU (no QR-iteration loops, pure VPU math).
    from opencv_tpu.geometry.rotation import solve3

    B = A[..., :3]
    a = A[..., 3]
    BtB = jnp.einsum("...ki,...kj->...ij", B, B)
    Bta = jnp.einsum("...ki,...k->...i", B, a)
    eye = jnp.eye(3, dtype=A.dtype)
    tr = BtB[..., 0, 0] + BtB[..., 1, 1] + BtB[..., 2, 2]
    return solve3(BtB + (1e-8 * tr)[..., None, None] * eye, -Bta)


def correct_matches(
    F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
    n_grid: int = 64, newton_iters: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Optimal two-view triangulation correction (HZ algorithm 12.1;
    cv::correctMatches, calib3d/src/triangulate.cpp:371): move each
    correspondence the minimum total squared distance onto the epipolar
    constraint x2' F x1 = 0. x1, x2: [N,2] (any projective frame F lives
    in). Returns corrected (x1, x2).

    TPU-native root finding: the reference solves the 6th-degree
    polynomial g(t) per match; polynomial companion solves are f64
    territory and branch on root realness. The cost s(t) is smooth with
    <=3 minima, so a dense tan-space grid (n_grid samples over all of R,
    including the t=inf branch) + fixed Newton polish finds the global
    minimum branch-free and vmaps over every match at once.
    """

    def one(p1, p2):
        # translate points to origin
        T1 = jnp.array([[1.0, 0, p1[0]], [0, 1, p1[1]], [0, 0, 1]], F.dtype)
        T2 = jnp.array([[1.0, 0, p2[0]], [0, 1, p2[1]], [0, 0, 1]], F.dtype)
        Fp = T2.T @ F @ T1
        # epipoles: right/left null vectors, normalized so e1^2+e2^2=1
        _, _, vt = jnp.linalg.svd(Fp)
        e1 = vt[-1]
        u, _, _ = jnp.linalg.svd(Fp)
        e2 = u[:, -1]
        e1 = e1 / jnp.maximum(jnp.sqrt(e1[0] ** 2 + e1[1] ** 2), 1e-12)
        e2 = e2 / jnp.maximum(jnp.sqrt(e2[0] ** 2 + e2[1] ** 2), 1e-12)
        R1 = jnp.array(
            [[e1[0], e1[1], 0], [-e1[1], e1[0], 0], [0, 0, 1.0]], F.dtype
        )
        R2 = jnp.array(
            [[e2[0], e2[1], 0], [-e2[1], e2[0], 0], [0, 0, 1.0]], F.dtype
        )
        Fr = R2 @ Fp @ R1.T  # [[f f' d, -f' c, -f' d], [-f d, a, b], ...]
        f1, f2 = e1[2], e2[2]
        a, b, c, d = Fr[1, 1], Fr[1, 2], Fr[2, 1], Fr[2, 2]

        def cost(t):
            num1 = t * t / (1.0 + f1 * f1 * t * t)
            den2 = (a * t + b) ** 2 + f2 * f2 * (c * t + d) ** 2
            num2 = (c * t + d) ** 2 / jnp.maximum(den2, 1e-20)
            return num1 + num2

        theta = jnp.linspace(-jnp.pi / 2 * 0.999, jnp.pi / 2 * 0.999, n_grid)
        ts = jnp.tan(theta)
        cs = cost(ts)
        t0 = ts[jnp.argmin(cs)]
        dc = jax.grad(cost)
        d2c = jax.grad(dc)

        def newton(_, t):
            g = dc(t)
            h = d2c(t)
            step = g / jnp.where(jnp.abs(h) < 1e-12, 1e-12, h)
            step = jnp.clip(step, -1e3, 1e3)
            tn = t - step
            return jnp.where(cost(tn) < cost(t), tn, t)

        t = jax.lax.fori_loop(0, newton_iters, newton, t0)
        # t = inf candidate (cost = 1/f1^2 + c^2/(a^2 + f2^2 c^2))
        cinf = 1.0 / jnp.maximum(f1 * f1, 1e-20) + c * c / jnp.maximum(
            a * a + f2 * f2 * c * c, 1e-20
        )
        use_inf = cinf < cost(t)
        # closest points on the epipolar lines: l1(t) = (t f1, 1, -t);
        # (0, t, 1) lies on l1(t), so l2(t) = Fr (0, t, 1) (HZ 12.1 vii)
        l1 = jnp.where(
            use_inf,
            jnp.array([f1, 0.0, -1.0], F.dtype),
            jnp.stack([t * f1, jnp.ones_like(t), -t]),
        )
        x_h = jnp.where(
            use_inf,
            jnp.array([0.0, 1.0, 0.0], F.dtype),
            jnp.stack([jnp.zeros_like(t), t, jnp.ones_like(t)]),
        )
        l2 = Fr @ x_h

        def closest_to_origin(l):
            s = l[0] ** 2 + l[1] ** 2
            s = jnp.maximum(s, 1e-20)
            return jnp.array(
                [-l[0] * l[2] / s, -l[1] * l[2] / s, 1.0], F.dtype
            )

        q1 = T1 @ R1.T @ closest_to_origin(l1)
        q2 = T2 @ R2.T @ closest_to_origin(l2)
        return q1[:2] / q1[2], q2[:2] / q2[2]

    return jax.vmap(one)(x1, x2)


def decompose_essential(E: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """E -> (R1, R2, t) candidates (five-point.cpp:643
    decomposeEssentialMat): R1 = U W Vt, R2 = U Wt Vt, t = u3."""
    # Jacobi top-2 triplets + cross-product completion: [u0 u1 u0xu1] is
    # right-handed by construction (det +1), so no sign fix is needed —
    # and it skips jnp.linalg.svd's QR-iteration while_loop (~0.4ms for
    # even a single 3x3 on TPU)
    u0, u1, _, _, v0, v1 = _svd3_top2(E)
    u = jnp.stack([u0, u1, jnp.cross(u0, u1)], axis=-1)
    vt = jnp.stack([v0, v1, jnp.cross(v0, v1)], axis=-2)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    return R1, R2, t


class RecoveredPose(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    mask: jnp.ndarray  # [N] bool: inliers passing cheirality
    n_good: jnp.ndarray


def recover_pose(
    E: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    distance_thresh: float = 50.0,
) -> RecoveredPose:
    """Choose the (R, t) with maximal cheirality support among the four
    decompositions of E, testing by triangulation (five-point.cpp:461-641).
    x1, x2 normalized coords [N,2]; mask restricts the vote to inliers.
    """
    n = x1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    R1, R2, t = decompose_essential(E)
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    def score(Rc, tc):
        X = triangulate_normalized(Rc, tc, x1, x2)
        z1 = X[..., 2]
        z2 = (X @ Rc.T + tc)[..., 2]
        good = (z1 > 0) & (z2 > 0) & (z1 < distance_thresh) & (z2 < distance_thresh)
        good &= mask
        return good, jnp.sum(good)

    goods, counts = zip(*[score(Rc, tc) for (Rc, tc) in cands])
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    masks = jnp.stack(goods)
    return RecoveredPose(
        R=Rs[best], t=ts[best], mask=masks[best], n_good=counts[best]
    )


def find_essential_ransac_5pt(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    cfg: RansacConfig = RansacConfig(threshold=1e-3),
) -> ransac_mod.RansacResult:
    """findEssentialMat with the true 5-point minimal kernel
    (geometry/five_point.py; reference five-point.cpp:40). Each sampled
    subset yields up to 10 candidate E; ALL candidates of ALL subsets are
    Sampson-scored in one batch (the minimal sample beats 8-point when
    inlier ratios are low: eps^5 vs eps^8 hypotheses survive)."""
    from opencv_tpu.geometry.five_point import five_point

    n = x1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    thr2 = cfg.threshold * cfg.threshold
    subsets = ransac_mod._sample_subsets(key, n, valid, cfg.n_hypotheses, 5)
    res = jax.vmap(lambda idx: five_point(x1[idx], x2[idx]))(subsets)
    Es = res.E.reshape(-1, 3, 3)  # [H*10, 3, 3]
    cand_ok = res.valid.reshape(-1)
    errs = jax.vmap(lambda E: sampson_error(E, x1, x2))(Es)
    inlier_mat = (errs < thr2) & valid[None, :]
    scores = jnp.where(cand_ok, jnp.sum(inlier_mat, axis=1), -1)
    best = jnp.argmax(scores)
    E = Es[best]
    inliers = inlier_mat[best]
    ok = scores[best] >= 5
    # polish: all-inlier 8-point refit (same as the 8-point path)
    for _ in range(2):
        w = inliers.astype(x1.dtype)
        E_ref, ok_ref = eight_point(x1, x2, essential=True, weights=w)
        err = sampson_error(E_ref, x1, x2)
        new_inliers = (err < thr2) & valid
        better = ok_ref & (jnp.sum(new_inliers) >= jnp.sum(inliers))
        E = jnp.where(better, E_ref, E)
        inliers = jnp.where(better, new_inliers, inliers)
    return ransac_mod.RansacResult(
        model=E, inliers=inliers, n_inliers=jnp.sum(inliers), ok=ok
    )


def _sampson_gn_refine(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray,
    thr2: float | jnp.ndarray = 1.0,
    iters: int = 4,
) -> jnp.ndarray:
    """Gauss-Newton on the SIGNED Sampson residual over vec(E), with a
    projection back onto the essential manifold each step — the
    geometric-optimum polish the weighted 8-point (algebraic) refit
    cannot reach. Mirrors the reference pipelines that follow RANSAC
    with an LM refine (findHomography's HomographyRefineCallback shape,
    fundam.cpp:214, applied here to E)."""

    def residuals(e):
        Em = e.reshape(3, 3)
        ones = jnp.ones_like(x1[..., :1])
        p1 = jnp.concatenate([x1, ones], -1)
        p2 = jnp.concatenate([x2, ones], -1)
        Ex1 = p1 @ Em.T
        Etx2 = p2 @ Em
        num = jnp.sum(p2 * Ex1, -1)
        den = (
            Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
            + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
        )
        return w * num / jnp.sqrt(jnp.maximum(den, 1e-12))

    e = E.reshape(-1)
    for _ in range(iters):
        # Tukey-style IRLS at the inlier threshold: borderline "inliers"
        # (gross outliers that sneak under thr) get ~zero influence —
        # 2 contaminated points out of 140 otherwise cost degrees of
        # translation direction in an unweighted LS fit
        r_cur = residuals(e)
        rw = jnp.clip(1.0 - (r_cur * r_cur) / jnp.maximum(thr2, 1e-12), 0.0, 1.0)
        rw = rw * rw

        def wres(ev, rw=rw):
            return residuals(ev) * rw

        r = wres(e)
        J = jax.jacfwd(wres)(e)  # [N, 9]
        H = J.T @ J + 1e-8 * jnp.eye(9)
        g = J.T @ r
        e_new = e - jnp.linalg.solve(H, g)
        e_new = e_new / jnp.maximum(jnp.linalg.norm(e_new), 1e-12)
        e = jnp.where(jnp.all(jnp.isfinite(e_new)), e_new, e)
    return enforce_essential(e.reshape(3, 3))


def find_essential_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    cfg: RansacConfig = RansacConfig(threshold=1e-3),
    adaptive: bool = True,
) -> ransac_mod.RansacResult:
    """findEssentialMat analog (five-point.cpp:405) on *normalized* coords.

    cfg.threshold is the LINEAR Sampson distance bound in normalized units
    (pixel_threshold / focal — the same folding as five-point.cpp:441);
    it is squared internally to compare against the squared Sampson error.
    adaptive=True uses the reference's early-exit iteration rule in
    128-hypothesis chunks (ransac_adaptive); False scores the full fixed
    batch.
    """
    n = x1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    thr2 = cfg.threshold * cfg.threshold
    cfg2 = RansacConfig(
        n_hypotheses=cfg.n_hypotheses, threshold=thr2, confidence=cfg.confidence,
        seed=cfg.seed,
    )

    def model_fn(idx):
        return eight_point(x1[idx], x2[idx], essential=True)

    def error_fn(E):
        return sampson_error(E, x1, x2)

    driver = ransac_mod.ransac_adaptive if adaptive else ransac_mod.ransac
    res = driver(key, n, valid, 8, model_fn, error_fn, cfg2)

    # polish: refit on ALL inliers (the reference's final all-inlier
    # re-solve, ptsetreg.cpp:253 / solvepnp.cpp:312-314 — essential to
    # average away feature-localization noise). The last rounds weight
    # inliers by inverse Sampson residual (IRLS flavor) so the estimate
    # converges to the same optimum whichever RANSAC sample seeded it —
    # this is what makes the adaptive early-exit path match the
    # exhaustive batch to well under a degree of pose.
    inliers = res.inliers
    E = res.model
    for _ in range(2):
        w = inliers.astype(x1.dtype)
        E_ref, ok_ref = eight_point(x1, x2, essential=True, weights=w)
        err = sampson_error(E_ref, x1, x2)
        new_inliers = (err < thr2) & valid
        better = ok_ref & (jnp.sum(new_inliers) >= jnp.sum(inliers))
        E = jnp.where(better, E_ref, E)
        inliers = jnp.where(better, new_inliers, inliers)
    # geometric polish: robust Gauss-Newton on Sampson error. Accepted
    # unless it collapses the support (NOT by raw inlier count — the
    # robust fit legitimately sheds borderline outliers that an
    # inlier-maximizing rule would cling to)
    E_gn = _sampson_gn_refine(E, x1, x2, inliers.astype(x1.dtype), thr2=thr2)
    err_gn = sampson_error(E_gn, x1, x2)
    inl_gn = (err_gn < thr2) & valid
    keep_gn = jnp.all(jnp.isfinite(E_gn)) & (
        jnp.sum(inl_gn) >= jnp.maximum(8, (jnp.sum(inliers) * 4) // 5)
    )
    E = jnp.where(keep_gn, E_gn, E)
    inliers = jnp.where(keep_gn, inl_gn, inliers)
    return ransac_mod.RansacResult(
        model=E, inliers=inliers, n_inliers=jnp.sum(inliers), ok=res.ok
    )
