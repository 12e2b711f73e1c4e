"""Phase-correlation translation registration + Hanning window.

Reference: modules/imgproc/src/phasecorr.cpp:513 (phaseCorrelate),
:597 (createHanningWindow), :432 (weightedCentroid). Useful as a
videostab / ECC initializer: recovers sub-pixel global translation from
the normalized cross-power spectrum peak.

TPU notes: one fused program — two 2-D real FFTs, the normalized
cross-power spectrum, inverse FFT, argmax + masked 5x5 weighted
centroid (the reference's clamped centroid box is reproduced with a
mask, not dynamic shapes). No getOptimalDFTSize padding: XLA's FFT has
no radix cliff worth the semantics change (the reference pads to
composite sizes for IPP/FFTW speed, phasecorr.cpp:531-551).
"""

from __future__ import annotations

import jax.numpy as jnp


def create_hanning_window(h: int, w: int) -> jnp.ndarray:
    """Separable 2-D Hann weighting (phasecorr.cpp:597)."""
    wy = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(h) / (h - 1)))
    wx = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(w) / (w - 1)))
    # the reference sqrt's the separable product (phasecorr.cpp:639)
    return jnp.sqrt(wy[:, None] * wx[None, :]).astype(jnp.float32)


def phase_correlate(
    src1: jnp.ndarray,
    src2: jnp.ndarray,
    window: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sub-pixel translation of src2 relative to src1 (phasecorr.cpp:513).

    Returns ((dx, dy), response): src2(x) ~ src1(x - (dx, dy)); response
    is the normalized peak energy in [0, 1]-ish (1 = perfect periodic
    shift), the reference's *response out-param."""
    a = src1.astype(jnp.float32)
    b = src2.astype(jnp.float32)
    if window is not None:
        a = a * window
        b = b * window
    m, n = a.shape

    f1 = jnp.fft.fft2(a)
    f2 = jnp.fft.fft2(b)
    p = f1 * jnp.conj(f2)
    c = jnp.fft.ifft2(p / jnp.maximum(jnp.abs(p), 1e-20)).real
    c = jnp.fft.fftshift(c)

    peak = jnp.argmax(c)
    py = peak // n
    px = peak % n

    # 5x5 weighted centroid, clamped at the borders exactly like the
    # reference (rows/cols outside the image simply don't contribute)
    yy = jnp.arange(m)[:, None]
    xx = jnp.arange(n)[None, :]
    in_box = (jnp.abs(yy - py) <= 2) & (jnp.abs(xx - px) <= 2)
    wgt = jnp.where(in_box, c, 0.0)
    s = jnp.sum(wgt)
    # jnp.fft.ifft2 is 1/(MN)-normalized where the reference's idft is
    # not, so its final "/= M*N" (phasecorr.cpp:588) is already folded in
    response = s
    s = s + jnp.finfo(jnp.float32).eps
    tx = jnp.sum(wgt * xx) / s
    ty = jnp.sum(wgt * yy) / s

    center_x = n / 2.0
    center_y = m / 2.0
    return (center_x - tx, center_y - ty), response
