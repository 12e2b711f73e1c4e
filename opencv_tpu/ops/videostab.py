"""Video stabilization (reference `videostab` module analog:
stabilizer.cpp pipeline = global motion estimation (global_motion.cpp,
RANSAC over tracked features) -> trajectory smoothing
(motion_stabilizing.cpp Gaussian filter) -> compensating warps).

TPU-native: per-pair global motion = GFTT + pyramidal LK + affine
RANSAC (all existing batched ops); smoothing is one 1-D Gaussian conv
over the motion-parameter sequence.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.core import imgproc
from opencv_tpu.core.config import LKConfig, RansacConfig
from opencv_tpu.geometry import ransac as ransac_mod
from opencv_tpu.ops import gftt, lk


def _affine_from_pairs(p0: jnp.ndarray, p1: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares affine [2,3] mapping p0 -> p1 (>=3 points)."""
    n = p0.shape[0]
    A = jnp.concatenate([p0, jnp.ones((n, 1), p0.dtype)], axis=1)  # [n,3]
    sol, _, _, _ = jnp.linalg.lstsq(A, p1)
    ok = jnp.all(jnp.isfinite(sol))
    return sol.T, ok  # [2,3]


def estimate_global_motion(
    frame0: jnp.ndarray,
    frame1: jnp.ndarray,
    key: jax.Array,
    max_corners: int = 200,
    threshold_px: float = 2.0,
) -> np.ndarray:
    """Affine [2,3] mapping frame0 coords -> frame1 coords
    (videostab MotionEstimatorRansacL2 analog)."""
    kp = gftt.good_features_to_track(frame0, max_corners, 0.01, 12.0)
    pts = kp.xy
    new, status, _ = lk.calc_optical_flow_pyr_lk(
        frame0, frame1, pts, kp.valid, LKConfig(n_levels=3)
    )
    valid = status & kp.valid

    def model_fn(idx):
        return _affine_from_pairs(pts[idx], new[idx])

    def error_fn(m):
        proj = pts @ m[:, :2].T + m[:, 2]
        return jnp.sum((proj - new) ** 2, axis=-1)

    res = ransac_mod.ransac(
        key, pts.shape[0], valid, 3, model_fn, error_fn,
        RansacConfig(n_hypotheses=256, threshold=threshold_px ** 2),
    )
    # refit on inliers
    w = res.inliers
    A = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1))], axis=1)
    Aw = A * w[:, None]
    sol, _, _, _ = jnp.linalg.lstsq(Aw, new * w[:, None])
    return np.asarray(sol.T)


def smooth_trajectory(motions: np.ndarray, radius: int = 5) -> np.ndarray:
    """Gaussian-smooth a sequence of per-frame affine params [F, 2, 3]
    (GaussianMotionFilter analog)."""
    sigma = max(radius / 2.0, 1e-3)
    xs = np.arange(-radius, radius + 1)
    g = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    g /= g.sum()
    flat = motions.reshape(motions.shape[0], -1)
    padded = np.pad(flat, ((radius, radius), (0, 0)), mode="edge")
    out = np.stack(
        [np.convolve(padded[:, i], g, mode="valid") for i in range(flat.shape[1])],
        axis=1,
    )
    return out.reshape(motions.shape)


def stabilize(frames: list[np.ndarray], radius: int = 5, seed: int = 0) -> list[np.ndarray]:
    """Full pipeline: estimate inter-frame motions, smooth the cumulative
    trajectory, warp each frame by the compensating transform."""
    key = jax.random.PRNGKey(seed)
    f = len(frames)
    h, w = frames[0].shape
    eye = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    motions = [eye]
    for i in range(1, f):
        key, sub = jax.random.split(key)
        motions.append(
            estimate_global_motion(
                jnp.asarray(frames[i - 1]), jnp.asarray(frames[i]), sub
            )
        )
    motions = np.asarray(motions, np.float32)

    def compose(a, b):
        """affine composition: (a o b)(x) = a(b(x))"""
        m = np.eye(3, dtype=np.float32)
        m[:2] = a
        n = np.eye(3, dtype=np.float32)
        n[:2] = b
        return (m @ n)[:2]

    # cumulative trajectory
    traj = [eye]
    for i in range(1, f):
        traj.append(compose(motions[i], traj[i - 1]))
    traj = np.asarray(traj)
    smooth = smooth_trajectory(traj, radius)

    out = []
    for i in range(f):
        # warp frame so its trajectory matches the smoothed one:
        # correction = traj_i o smooth_i^-1; warp_affine wants output->input
        t3 = np.eye(3, dtype=np.float32)
        t3[:2] = traj[i]
        s3 = np.eye(3, dtype=np.float32)
        s3[:2] = smooth[i]
        corr = t3 @ np.linalg.inv(s3)
        out.append(
            np.asarray(
                imgproc.warp_affine(jnp.asarray(frames[i]), jnp.asarray(corr[:2]), h, w)
            )
        )
    return out


def deblur_weiner_gaussian(
    frame: jnp.ndarray, motion_px: float, angle: float = 0.0, snr: float = 40.0
) -> jnp.ndarray:
    """Motion deblurring for stabilized frames (videostab
    deblurring.cpp WeightingDeblurer capability slot): Wiener
    deconvolution with a linear motion PSF in the frequency domain —
    jnp.fft runs on the MXU; one forward + one inverse FFT per frame."""
    h, w = frame.shape
    frame = frame.astype(jnp.float32)
    # linear-motion PSF of length motion_px at `angle`
    L = max(int(round(motion_px)), 1)
    psf = np.zeros((h, w), np.float32)
    c, s = np.cos(angle), np.sin(angle)
    for i in range(L):
        t = i - (L - 1) / 2.0  # symmetric taps about the origin
        y = int(round(t * s)) % h
        x = int(round(t * c)) % w
        psf[y, x] += 1.0
    psf /= psf.sum()
    H = jnp.fft.rfft2(jnp.asarray(psf))
    F = jnp.fft.rfft2(frame)
    wiener = jnp.conj(H) / (jnp.abs(H) ** 2 + 1.0 / snr)
    out = jnp.fft.irfft2(F * wiener, s=(h, w))
    return jnp.clip(out, 0.0, 255.0)


def inpaint_borders(
    frames: list[np.ndarray], masks: list[np.ndarray]
) -> list[np.ndarray]:
    """Fill the empty borders warps leave behind using neighbouring
    frames (videostab inpainting.cpp ConsistentMosaicInpainter slot):
    each invalid pixel takes the median of the valid values the
    temporal neighbours provide."""
    out = []
    n = len(frames)
    for i, (f, m) in enumerate(zip(frames, masks)):
        f = np.asarray(f, np.float32).copy()
        m = np.asarray(m, bool)
        hole = ~m
        if hole.any():
            cand = []
            for j in range(max(0, i - 2), min(n, i + 3)):
                if j == i:
                    continue
                fj = np.asarray(frames[j], np.float32)
                mj = np.asarray(masks[j], bool)
                cand.append(np.where(mj, fj, np.nan))
            if cand:
                stack = np.stack(cand)
                med = np.nanmedian(stack, axis=0)
                fill = np.where(np.isnan(med), f, med)
                f[hole] = fill[hole]
        out.append(f)
    return out


def suppress_wobble(
    motions: np.ndarray, period: int = 2, strength: float = 1.0
) -> np.ndarray:
    """Wobble suppression (videostab wobble_suppression.cpp
    MoreAccurateMotionWobbleSuppressor slot): remove the near-periodic
    high-frequency component rolling-shutter capture leaves in the
    inter-frame motion parameters.

    motions: [T, 2, 3] per-frame affine params. The periodic wobble at
    `period` frames is isolated in the frequency domain (one rfft over
    time per parameter — MXU work) and subtracted, scaled by `strength`.
    Returns the corrected [T, 2, 3] sequence."""
    m = jnp.asarray(motions, jnp.float32).reshape(len(motions), -1)  # [T, 6]
    T = m.shape[0]
    # detrend before the FFT: a non-periodic ramp leaks into every bin
    # (Gibbs) and the notch would distort the legitimate slow motion
    t = jnp.arange(T, dtype=jnp.float32)
    tc = t - t.mean()
    slope = (tc @ m) / jnp.maximum(tc @ tc, 1e-9)  # [6]
    trend = m.mean(0)[None] + tc[:, None] * slope[None]
    m = m - trend
    F = jnp.fft.rfft(m, axis=0)
    freqs = jnp.fft.rfftfreq(T)  # cycles/frame
    target = 1.0 / (2.0 * period)
    # notch around the wobble frequency band [target, nyquist]
    notch = jnp.where(freqs[:, None] >= target, 1.0 - strength, 1.0)
    out = jnp.fft.irfft(F * notch, n=T, axis=0) + trend
    return np.asarray(out).reshape(len(motions), 2, 3)
