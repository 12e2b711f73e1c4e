"""AP3P: the reference's second, algebraic P3P solver slot.

Reference: calib3d/src/ap3p.cpp (Ke & Roumeliotis, "An Efficient
Algebraic Solution to the Perspective-Three-Point Problem", CVPR 2017),
dispatched from solvepnp.cpp:771 (SOLVEPNP_AP3P). Its selling point over
the classic quartic-distance P3P (p3p.cpp) is algebraic directness: no
per-root polynomial polishing, better conditioning.

TPU-native choice: this slot is filled with the Lambda-Twist formulation
(Persson & Nordberg, ECCV 2018) — the successor to AP3P with the same
algebraic character and better numerics. It maps onto TPU-friendly
primitives: one closed-form cubic root, one 3x3 symmetric eigh, and two
quadratics — no Durand-Kerner iteration, no quartic at all. Everything
is fixed-shape and branch-free, so the kernel vmaps cleanly across
RANSAC hypotheses.

Derivation (clean-room, from the pairwise depth constraints):
with unit bearings y_i and depths l_i, camera points l_i y_i must
preserve the world distances: l_i^2 + l_j^2 - 2 b_ij l_i l_j = a_ij
(b_ij = y_i . y_j, a_ij = |x_i - x_j|^2), i.e. three quadratic forms
l^T M_ij l = a_ij. Pairwise elimination gives two HOMOGENEOUS quadrics
D1, D2; some combination D1 + g D2 is rank-deficient (det cubic in g)
and factors into two planes; each plane intersects D1 in up to two
directions; the inhomogeneous a_12 fixes the scale. Up to 4 depth
triples, each lifted to (R, t) by the 3-point Kabsch alignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.geometry.p3p import _kabsch3

_P32 = lax.Precision.HIGHEST


def _cubic_real_root(c3, c2, c1, c0):
    """One real root of c3 g^3 + c2 g^2 + c1 g + c0 (branch-free).

    Cardano with the trigonometric branch for the casus irreducibilis,
    blended by jnp.where; a quadratic fallback when c3 ~ 0; three Newton
    polish steps at the end (they also absorb f32 noise in the blend).
    """
    tiny = 1e-12
    lead = jnp.abs(c3) > tiny * (jnp.abs(c2) + jnp.abs(c1) + jnp.abs(c0) + tiny)
    c3s = jnp.where(lead, c3, 1.0)
    p = c2 / c3s
    q = c1 / c3s
    r = c0 / c3s
    # depressed: x^3 + a x + b, g = x - p/3
    a = q - p * p / 3.0
    b = 2.0 * p**3 / 27.0 - p * q / 3.0 + r
    disc = (b / 2.0) ** 2 + (a / 3.0) ** 3

    # disc >= 0: one real root via cbrt
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-b / 2.0 + sq)
    v = jnp.cbrt(-b / 2.0 - sq)
    x_singl = u + v

    # disc < 0: three real roots; take k=0 of the trig form
    am = jnp.minimum(a, -tiny)  # a < 0 in this branch
    rho = 2.0 * jnp.sqrt(-am / 3.0)
    arg = jnp.clip(3.0 * b / (am * rho), -1.0, 1.0)
    x_trig = rho * jnp.cos(jnp.arccos(arg) / 3.0)

    x = jnp.where(disc >= 0.0, x_singl, x_trig)
    g = x - p / 3.0

    # quadratic fallback (c3 ~ 0): c2 g^2 + c1 g + c0 = 0
    c2s = jnp.where(jnp.abs(c2) > tiny, c2, 1.0)
    qd = jnp.sqrt(jnp.maximum(c1 * c1 - 4.0 * c2 * c0, 0.0))
    g_quad = jnp.where(
        jnp.abs(c2) > tiny, (-c1 + qd) / (2.0 * c2s),
        -c0 / jnp.where(jnp.abs(c1) > tiny, c1, 1.0),
    )
    g = jnp.where(lead, g, g_quad)

    def newton(_, gg):
        f = ((c3 * gg + c2) * gg + c1) * gg + c0
        df = (3.0 * c3 * gg + 2.0 * c2) * gg + c1
        df = jnp.where(jnp.abs(df) < tiny, tiny, df)
        return gg - f / df

    return lax.fori_loop(0, 3, newton, g)


def _plane_basis(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two orthonormal vectors spanning {l : w . l = 0} (branch-free)."""
    wn = w / jnp.maximum(jnp.linalg.norm(w), 1e-12)
    # seed axis least aligned with w
    k = jnp.argmin(jnp.abs(wn))
    e = jnp.zeros(3).at[k].set(1.0)
    v1 = jnp.cross(wn, e)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1), 1e-12)
    v2 = jnp.cross(wn, v1)
    return v1, v2


def ap3p_solutions(
    obj: jnp.ndarray, bearings: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All algebraic-P3P pose candidates.

    obj [3,3] world points; bearings [3,3] unit camera-frame rays.
    Returns (R [4,3,3], t [4,3], valid [4]) with x_cam = R x_world + t.
    """
    b12 = jnp.dot(bearings[0], bearings[1])
    b13 = jnp.dot(bearings[0], bearings[2])
    b23 = jnp.dot(bearings[1], bearings[2])
    a12 = jnp.sum((obj[0] - obj[1]) ** 2)
    a13 = jnp.sum((obj[0] - obj[2]) ** 2)
    a23 = jnp.sum((obj[1] - obj[2]) ** 2)

    M12 = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]]
    ).at[0, 1].set(-b12).at[1, 0].set(-b12)
    M13 = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    ).at[0, 2].set(-b13).at[2, 0].set(-b13)
    M23 = jnp.array(
        [[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    ).at[1, 2].set(-b23).at[2, 1].set(-b23)

    # homogeneous eliminations: l^T D l = 0 on true solutions
    D1 = a23 * M12 - a12 * M23
    D2 = a23 * M13 - a13 * M23

    # det(D1 + g D2) cubic coefficients by 4-node interpolation
    # (exact for a cubic; avoids hand-expanding the determinant)
    nodes = jnp.array([0.0, 1.0, -1.0, 2.0])
    dets = jax.vmap(lambda g: jnp.linalg.det(D1 + g * D2))(nodes)
    # Vandermonde inverse for nodes {0,1,-1,2}, rows = coeffs c0..c3
    Vinv = jnp.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [-1.0 / 2.0, 1.0, -1.0 / 3.0, -1.0 / 6.0],
            [-1.0, 1.0 / 2.0, 1.0 / 2.0, 0.0],
            [1.0 / 2.0, -1.0 / 2.0, -1.0 / 6.0, 1.0 / 6.0],
        ]
    )
    c0, c1, c2, c3 = Vinv @ dets
    g = _cubic_real_root(c3, c2, c1, c0)

    D0 = D1 + g * D2  # symmetric, (numerically) rank 2
    evals, evecs = jnp.linalg.eigh(D0)  # ascending
    s_neg, s_pos = evals[0], evals[2]
    u_neg, u_pos = evecs[:, 0], evecs[:, 2]
    # factorization exists iff signature is (+, -): l^T D0 l =
    # (sqrt(s+) u+ . l)^2 - (sqrt(-s-) u- . l)^2 = (p.l)(q.l)
    fact_ok = (s_pos > 0.0) & (s_neg < 0.0)
    sp = jnp.sqrt(jnp.maximum(s_pos, 0.0))
    sn = jnp.sqrt(jnp.maximum(-s_neg, 0.0))
    p_pl = sp * u_pos + sn * u_neg
    q_pl = sp * u_pos - sn * u_neg

    def plane_dirs(w):
        """Up to two projective directions in plane w intersecting D1."""
        v1, v2 = _plane_basis(w)
        A = v1 @ D1 @ v1
        B = v1 @ D1 @ v2
        C = v2 @ D1 @ v2
        # A r^2 + 2 B r + C = 0, l ~ r v1 + v2 (plus the v1-only root)
        disc = B * B - A * C
        real = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        As = jnp.where(jnp.abs(A) > 1e-12, A, 1.0)
        lin = jnp.abs(A) <= 1e-12
        # root pair (stable form: r = (-B -+ sq)/A with the co-root trick)
        r1 = jnp.where(lin, -C / jnp.where(jnp.abs(B) > 1e-12, 2.0 * B, 1.0),
                       (-B + sq) / As)
        r2 = jnp.where(lin, 0.0, (-B - sq) / As)
        d1 = r1 * v1 + v2
        # when A ~ 0, v1 itself is the second projective root
        d2 = jnp.where(lin, v1, r2 * v1 + v2)
        ok1 = real | lin
        ok2 = real
        return jnp.stack([d1, d2]), jnp.stack([ok1, ok2])

    dirs_p, ok_p = plane_dirs(p_pl)
    dirs_q, ok_q = plane_dirs(q_pl)
    dirs = jnp.concatenate([dirs_p, dirs_q])  # [4,3]
    oks = jnp.concatenate([ok_p, ok_q]) & fact_ok

    def lam_newton(lam):
        """Gauss-Newton polish of the depth triple on the three pairwise
        distance equations (the Lambda-Twist refinement step) — recovers
        the f32 rounding lost through the cubic/eigh chain."""
        f = jnp.stack(
            [lam @ M12 @ lam - a12, lam @ M13 @ lam - a13,
             lam @ M23 @ lam - a23]
        )
        J = 2.0 * jnp.stack([M12 @ lam, M13 @ lam, M23 @ lam])
        J = J + 1e-12 * jnp.eye(3)
        step = jnp.linalg.solve(J, f)
        # guarded step: never leave the positive-depth octant
        return jnp.maximum(lam - step, 1e-9)

    def lift(d, ok):
        # orient so depths can be positive, then scale by a12
        d = d * jnp.where(jnp.sum(d) < 0.0, -1.0, 1.0)
        m = d @ M12 @ d
        s = jnp.sqrt(a12 / jnp.where(m > 1e-12, m, 1.0))
        lam = s * d
        ok &= (m > 1e-12) & jnp.all(lam > 1e-9)
        lam = lax.fori_loop(0, 4, lambda _, l: lam_newton(l), lam)
        Y = lam[:, None] * bearings
        R, t = _kabsch3(Y, obj)
        ok &= jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
        return R, t, ok

    R, t, valid = jax.vmap(lift)(dirs, oks)
    return R, t, valid


def ap3p_kernel(
    obj: jnp.ndarray, img: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RANSAC minimal kernel: AP3P on points 0-2, disambiguated by point 3.

    Same contract as p3p.p3p_kernel: obj [4,3], img [4,2] normalized;
    returns (model [6] = rvec|tvec, ok)."""
    from opencv_tpu.geometry.pnp import gn_refine_pose
    from opencv_tpu.geometry.rotation import rodrigues_inv

    rays = jnp.concatenate([img[:3], jnp.ones((3, 1), img.dtype)], axis=1)
    rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
    R, t, valid = ap3p_solutions(obj[:3], rays)

    def reproj4(Ri, ti):
        pc = Ri @ obj[3] + ti
        z = jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
        e = jnp.sum((pc[:2] / z - img[3]) ** 2)
        return jnp.where(pc[2] > 1e-6, e, jnp.inf)

    errs = jnp.where(valid, jax.vmap(reproj4)(R, t), jnp.inf)
    best = jnp.argmin(errs)
    ok = jnp.isfinite(errs[best])
    rvec = rodrigues_inv(R[best])
    rvec, tvec = gn_refine_pose(
        rvec, t[best], obj, img, jnp.ones(4, obj.dtype), iters=3
    )
    model = jnp.concatenate([rvec, tvec])
    ok &= jnp.all(jnp.isfinite(model))
    return jnp.where(ok, model, jnp.zeros(6, obj.dtype)), ok
