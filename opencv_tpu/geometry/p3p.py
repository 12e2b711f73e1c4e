"""P3P minimal pose solver (3 points + disambiguation point), batched.

Reference capability: calib3d/src/p3p.cpp (Gao's complete solution
classification) and ap3p.cpp, used as the solvePnPRansac minimal kernel
(solvepnp.cpp:233). A minimal 3-point kernel matters because the DLT
needs >= 6 points AND is degenerate on coplanar samples — on plane-rich
scenes the 6-point DLT RANSAC produces junk hypotheses exactly where
odometry needs them most.

TPU-native derivation (no hand-expanded coefficient tables): Grunert's
distance system

    s1^2 + s2^2 - 2 s1 s2 cos(gamma) = c^2     (and cyclic)

reduces, with u = s2/s1 and v = s3/s1, to two quadratics in u whose
coefficients are polynomials in v. A common root exists iff their
resultant — a QUARTIC in v — vanishes. Instead of expanding the quartic
symbolically, we evaluate the resultant at 5 fixed v values and recover
the coefficients through a constant inverse-Vandermonde matmul (exact
for a degree-4 polynomial), then root it with the same Durand-Kerner
iteration the 5-point solver uses (five_point.py). Everything is
closed-form batched arithmetic — vmap over RANSAC samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

_P32 = lax.Precision.HIGHEST

# resultant evaluation nodes and the inverse Vandermonde (degree 4)
_V_NODES = np.array([-2.0, -1.0, 0.0, 1.0, 2.0], np.float32)
_VANDER_INV = np.linalg.inv(np.vander(_V_NODES, 5, increasing=True)).astype(
    np.float32
)  # coeffs c0..c4 = VINV @ evals


def _durand_kerner(coeffs: jnp.ndarray, iters: int = 40) -> jnp.ndarray:
    """All 4 complex roots of c0 + c1 v + ... + c4 v^4 as (re [4], im [4]).

    Same hardening as the 10th-degree solver in five_point.py:166 —
    Cauchy-bound variable scaling (DK diverges when roots leave the unit
    circle) and step clamping (a NaN root poisons every sibling through
    the denominator product). Complex arithmetic is spelled out on f32
    (re, im) pairs: complex64 lowering is UNIMPLEMENTED on the TPU
    backend in several vmap/loop contexts, and pure-f32 VPU math is
    faster anyway."""
    lead = coeffs[4]
    safe = jnp.where(jnp.abs(lead) < 1e-20, 1e-20, lead)
    monic = coeffs / safe
    ks = jnp.arange(4)
    mags = jnp.abs(monic[:4]) ** (1.0 / (4.0 - ks))
    s = jnp.clip(jnp.max(mags), 1e-3, 1e6)
    scaled = monic * s ** (jnp.arange(5) - 4.0)  # real f32 coeffs

    def horner(re, im):
        ar = jnp.full_like(re, scaled[4])
        ai = jnp.zeros_like(im)
        for k in range(3, -1, -1):
            ar, ai = ar * re - ai * im + scaled[k], ar * im + ai * re
        return ar, ai

    r0 = 1.3 * (0.4 + 0.9j) ** np.arange(1, 5)  # static numpy constants
    re0 = jnp.asarray(np.real(r0), coeffs.dtype)
    im0 = jnp.asarray(np.imag(r0), coeffs.dtype)

    def body(_, carry):
        re, im = carry
        pr, pi = horner(re, im)
        # denom_i = prod_{j != i} (r_i - r_j): static 4-way unrolled
        dr = re[:, None] - re[None, :] + jnp.eye(4, dtype=re.dtype)
        di = im[:, None] - im[None, :]
        nr, ni = dr[:, 0], di[:, 0]
        for j in range(1, 4):
            nr, ni = nr * dr[:, j] - ni * di[:, j], nr * di[:, j] + ni * dr[:, j]
        d2 = nr * nr + ni * ni
        d2 = jnp.where(d2 < 1e-40, 1e-40, d2)
        # step = p / denom  (complex division)
        sr = (pr * nr + pi * ni) / d2
        si = (pi * nr - pr * ni) / d2
        mag = jnp.sqrt(sr * sr + si * si)
        clip = jnp.where(mag > 10.0, 10.0 / mag, 1.0)
        return re - sr * clip, im - si * clip

    re, im = lax.fori_loop(0, iters, body, (re0, im0))
    return re * s, im * s


def _kabsch3(Y: jnp.ndarray, X: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid transform with Y_i ~= R @ X_i + t for 3 correspondences."""
    from opencv_tpu.geometry.rotation import project_to_rotation

    muY = Y.mean(axis=0)
    muX = X.mean(axis=0)
    H = jnp.einsum("ni,nj->ij", Y - muY, X - muX, precision=_P32)
    # nearest rotation via the SVD-free polar iteration (this runs once
    # per RANSAC hypothesis x4 roots — batched 3x3 SVD is the bottleneck)
    R = project_to_rotation(H)
    t = muY - R @ muX
    return R, t


def p3p_solutions(
    obj: jnp.ndarray, bearings: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All P3P pose candidates.

    obj [3,3] world points; bearings [3,3] unit camera-frame rays.
    Returns (R [4,3,3], t [4,3], valid [4]) with x_cam = R x_world + t.
    """
    a2 = jnp.sum((obj[1] - obj[2]) ** 2)  # |X2-X3|^2
    b2 = jnp.sum((obj[0] - obj[2]) ** 2)  # |X1-X3|^2
    c2 = jnp.sum((obj[0] - obj[1]) ** 2)  # |X1-X2|^2
    ca = jnp.dot(bearings[1], bearings[2])  # cos(alpha)
    cb = jnp.dot(bearings[0], bearings[2])  # cos(beta)
    cg = jnp.dot(bearings[0], bearings[1])  # cos(gamma)
    rb = a2 / jnp.where(b2 < 1e-12, 1e-12, b2)  # a^2/b^2
    rc = c2 / jnp.where(b2 < 1e-12, 1e-12, b2)  # c^2/b^2

    # quadratic pair in u with v-dependent coefficients:
    #   Q1: u^2 + b1 u + c1(v) = 0,  b1 = -2 cg,
    #       c1 = 1 - rc (1 + v^2 - 2 v cb)
    #   Q2: u^2 + b2(v) u + c2(v) = 0,  b2 = -2 ca v,
    #       c2 = v^2 - rb (1 + v^2 - 2 v cb)
    def resultant(v):
        c1 = 1.0 - rc * (1.0 + v * v - 2.0 * v * cb)
        c2_ = v * v - rb * (1.0 + v * v - 2.0 * v * cb)
        b1 = -2.0 * cg
        b2_ = -2.0 * ca * v
        dc = c1 - c2_
        db = b1 - b2_
        return dc * dc - b1 * dc * db + c1 * db * db

    evals = jax.vmap(resultant)(jnp.asarray(_V_NODES))
    coeffs = jnp.asarray(_VANDER_INV) @ evals  # quartic c0..c4
    lead_ok = jnp.abs(coeffs[4]) > 1e-10 * (jnp.max(jnp.abs(coeffs)) + 1e-20)
    roots_re, roots_im = _durand_kerner(coeffs)

    def one_root(v, v_im):
        is_real = jnp.abs(v_im) < 1e-3 * (1.0 + jnp.abs(v))
        c1 = 1.0 - rc * (1.0 + v * v - 2.0 * v * cb)
        c2_ = v * v - rb * (1.0 + v * v - 2.0 * v * cb)
        b1 = -2.0 * cg
        b2_ = -2.0 * ca * v
        db = b1 - b2_
        u = jnp.where(jnp.abs(db) > 1e-9, -(c1 - c2_) / jnp.where(jnp.abs(db) < 1e-9, 1.0, db), 0.0)
        d1 = 1.0 + u * u - 2.0 * u * cg
        s1 = jnp.sqrt(c2 / jnp.where(d1 < 1e-12, 1e-12, d1))
        s2 = u * s1
        s3 = v * s1
        ok = is_real & (v > 1e-6) & (u > 1e-6) & (d1 > 1e-12)
        Y = jnp.stack([s1 * bearings[0], s2 * bearings[1], s3 * bearings[2]])
        R, t = _kabsch3(Y, obj)
        ok &= jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
        return R, t, ok & lead_ok

    R, t, valid = jax.vmap(one_root)(roots_re, roots_im)
    return R, t, valid


def p3p_kernel(
    obj: jnp.ndarray, img: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RANSAC minimal kernel: P3P on points 0-2, disambiguated by point 3.

    obj [4,3] world points, img [4,2] normalized image points.
    Returns (model [6] = rvec|tvec, ok). Planar-safe (P3P never needs
    non-coplanar samples, unlike the 6-point DLT)."""
    from opencv_tpu.geometry.rotation import rodrigues_inv

    rays = jnp.concatenate([img[:3], jnp.ones((3, 1), img.dtype)], axis=1)
    rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
    R, t, valid = p3p_solutions(obj[:3], rays)

    def reproj4(Ri, ti):
        pc = Ri @ obj[3] + ti
        z = jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
        good_z = pc[2] > 1e-6
        e = jnp.sum((pc[:2] / z - img[3]) ** 2)
        return jnp.where(good_z, e, jnp.inf)

    errs = jax.vmap(reproj4)(R, t)
    errs = jnp.where(valid, errs, jnp.inf)
    best = jnp.argmin(errs)
    ok = jnp.isfinite(errs[best])
    Rb = R[best]
    tb = t[best]
    rvec = rodrigues_inv(Rb)
    # short Gauss-Newton polish on all 4 sample points: the f32 quartic
    # leaves ~1e-3 residual on ill-conditioned (near-planar) samples;
    # three GN steps restore it to fitting-noise level
    from opencv_tpu.geometry.pnp import gn_refine_pose

    rvec, tvec = gn_refine_pose(
        rvec, tb, obj, img, jnp.ones(4, obj.dtype), iters=3
    )
    model = jnp.concatenate([rvec, tvec])
    ok &= jnp.all(jnp.isfinite(model))
    return jnp.where(ok, model, jnp.zeros(6, obj.dtype)), ok
