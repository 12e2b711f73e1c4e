"""Matrix decompositions: homography -> motion candidates, projection
matrix -> K/R/t, and Bouguet stereo rectification.

Reference: calib3d/src/homography_decomp.cpp (Malis-Vargas),
decomposeProjectionMatrix (calibration.cpp), stereoRectify
(calibration.cpp).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from opencv_tpu.geometry.rotation import project_to_rotation


class HomographyDecomposition(NamedTuple):
    R: jnp.ndarray  # [4, 3, 3]
    t: jnp.ndarray  # [4, 3] (up to scale)
    n: jnp.ndarray  # [4, 3] plane normals
    valid: jnp.ndarray  # [4]


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray) -> HomographyDecomposition:
    """Euclidean homography decomposition (Malis-Vargas / Faugeras SVD
    method; analog of cv::decomposeHomographyMat). Returns the four
    (R, t, n) candidates; cheirality disambiguation is the caller's
    (visible-point) test, as in the reference."""
    Kinv = jnp.linalg.inv(K)
    Hn = Kinv @ H @ K
    # normalize by the middle singular value
    _, s, _ = jnp.linalg.svd(Hn)
    Hn = Hn / s[1]
    S = Hn.T @ Hn - jnp.eye(3)

    # Faugeras: work in the eigenbasis of H^T H (Ma-Soatto Thm 5.19)
    w, V = jnp.linalg.eigh(Hn.T @ Hn)  # ascending: l1 <= l2(=1) <= l3
    l1, l3 = w[0], w[2]
    v_small, v_mid, v_large = V[:, 0], V[:, 1], V[:, 2]
    safe = jnp.maximum(l3 - l1, 1e-12)
    a = jnp.sqrt(jnp.maximum(1.0 - l1, 0.0))
    b = jnp.sqrt(jnp.maximum(l3 - 1.0, 0.0))
    uu1 = (a * v_large + b * v_small) / jnp.sqrt(safe)
    uu2 = (a * v_large - b * v_small) / jnp.sqrt(safe)
    # the candidate plane normals are v2 x u (NOT u itself)
    u1 = jnp.cross(v_mid, uu1)
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-12)
    u2 = jnp.cross(v_mid, uu2)
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2), 1e-12)

    def candidate(u, sign):
        n = u * sign
        # R maps via H restricted off the plane: solve R from
        # H = R (I + t n^T): use that H x = R x for x ⊥ n within scale.
        # Construct R by aligning the frames (standard construction):
        e1 = n
        ref = jnp.where(jnp.abs(n[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        e2 = jnp.cross(n, ref)
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
        e3 = jnp.cross(n, e2)
        # R maps e2,e3 (in-plane dirs) through H (normalized), e1 via det
        h2 = Hn @ e2
        h3 = Hn @ e3
        h2 = h2 / jnp.maximum(jnp.linalg.norm(h2), 1e-12)
        h3 = h3 / jnp.maximum(jnp.linalg.norm(h3), 1e-12)
        R = project_to_rotation(
            jnp.stack([h2, h3, jnp.cross(h2, h3)], axis=1)
            @ jnp.stack([e2, e3, jnp.cross(e2, e3)], axis=1).T
        )
        t = (Hn - R) @ n
        return R, t, n

    cands = [candidate(u1, 1.0), candidate(u1, -1.0),
             candidate(u2, 1.0), candidate(u2, -1.0)]
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    ns = jnp.stack([c[2] for c in cands])
    ok = jnp.all(jnp.isfinite(Rs), axis=(1, 2))
    return HomographyDecomposition(R=Rs, t=ts, n=ns, valid=ok)


def decompose_projection_matrix(P: jnp.ndarray):
    """P [3,4] -> (K [3,3], R [3,3], C [3] camera center)
    (cv::decomposeProjectionMatrix via RQ decomposition)."""
    M = P[:, :3]
    # RQ via flipped QR: M = K R with K upper triangular
    rev = jnp.asarray(np.flip(np.eye(3), 0).astype(np.float32))
    q, r = jnp.linalg.qr((rev @ M).T)
    K = rev @ r.T @ rev
    R = rev @ q.T
    # positive diagonal convention
    d = jnp.sign(jnp.diag(K))
    d = jnp.where(d == 0, 1.0, d)
    K = K * d[None, :]
    R = R * d[:, None]
    K = K / K[2, 2]
    C = -jnp.linalg.inv(M) @ P[:, 3]
    return K, R, C


class StereoRectification(NamedTuple):
    R1: jnp.ndarray
    R2: jnp.ndarray
    P1: jnp.ndarray
    P2: jnp.ndarray
    Q: jnp.ndarray


def stereo_rectify(
    K1: jnp.ndarray, K2: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
    image_size: tuple[int, int],
) -> StereoRectification:
    """Bouguet rectification (cv::stereoRectify analog): split the
    relative rotation, align epipolar lines with image rows."""
    h, w = image_size
    # split rotation: each camera rotates by half of R
    from opencv_tpu.geometry.rotation import rodrigues, rodrigues_inv

    rvec = rodrigues_inv(R)
    r_half = rodrigues(-0.5 * rvec)
    t_rect = r_half @ t
    # new x-axis along the baseline
    e1 = t_rect / jnp.maximum(jnp.linalg.norm(t_rect), 1e-12)
    e1 = e1 * jnp.sign(jnp.where(jnp.abs(t_rect[0]) > 1e-9, t_rect[0], 1.0))
    e2 = jnp.cross(jnp.array([0.0, 0.0, 1.0]), e1)
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
    e3 = jnp.cross(e1, e2)
    Rrect = jnp.stack([e1, e2, e3])
    R1 = Rrect @ r_half
    # camera 2 rotates by the opposite half of the relative rotation
    R2 = Rrect @ rodrigues(0.5 * rvec).T
    f = 0.5 * (K1[0, 0] + K2[1, 1])
    cx, cy = w / 2.0, h / 2.0
    P1 = jnp.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]], jnp.float32)
    baseline = jnp.linalg.norm(t)
    P2 = P1.at[0, 3].set(-f * baseline)
    Q = jnp.array(
        [
            [1, 0, 0, -cx],
            [0, 1, 0, -cy],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
        ],
        jnp.float32,
    )
    Q = Q.at[2, 3].set(f).at[3, 2].set(1.0 / jnp.maximum(baseline, 1e-12))
    return StereoRectification(R1=R1, R2=R2, P1=P1, P2=P2, Q=Q)
