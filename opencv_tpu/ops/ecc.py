"""ECC image alignment (cv::findTransformECC analog, video/src/ecc.cpp).

Estimates a warp (translation / euclidean / affine) maximizing the
enhanced correlation coefficient between a template and an input image.
TPU-native: the forward-additive update is damped Gauss-Newton with
jax-autodiff Jacobians straight through the differentiable bilinear
warp — no hand-coded steepest-descent images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from opencv_tpu.core import imgproc

_P32 = lax.Precision.HIGHEST


def _warp_params_to_matrix(params: jnp.ndarray, motion: str) -> jnp.ndarray:
    if motion == "translation":
        tx, ty = params
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) + jnp.zeros((2, 3)).at[
            0, 2
        ].set(tx).at[1, 2].set(ty)
    if motion == "euclidean":
        th, tx, ty = params
        c, s = jnp.cos(th), jnp.sin(th)
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) * 0 + jnp.stack(
            [jnp.stack([c, -s, tx]), jnp.stack([s, c, ty])]
        )
    if motion == "affine":
        return params.reshape(2, 3) + jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], params.dtype
        )
    raise ValueError(f"unknown motion model {motion}")


def _n_params(motion: str) -> int:
    return {"translation": 2, "euclidean": 3, "affine": 6}[motion]


def find_transform_ecc(
    template: jnp.ndarray,
    image: jnp.ndarray,
    motion: str = "affine",
    iters: int = 50,
    init: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (warp [2,3] mapping template coords -> image coords,
    final correlation coefficient). Interior-cropped cost (10% margin)
    so warped-in border pixels don't bias the correlation."""
    template = template.astype(jnp.float32)
    image = image.astype(jnp.float32)
    h, w = template.shape
    my, mx = max(h // 10, 2), max(w // 10, 2)

    t_crop = template[my : h - my, mx : w - mx]
    t0 = t_crop - jnp.mean(t_crop)
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-9)

    def residual(params):
        m = _warp_params_to_matrix(params, motion)
        warped = imgproc.warp_affine(image, m, h, w)[my : h - my, mx : w - mx]
        wz = warped - jnp.mean(warped)
        wz = wz / jnp.maximum(jnp.linalg.norm(wz), 1e-9)
        return (wz - t0).reshape(-1)

    params = jnp.zeros((_n_params(motion),)) if init is None else init

    def body(_, carry):
        params, lam = carry
        r = residual(params)
        J = jax.jacfwd(residual)(params)
        H = jnp.einsum("ni,nj->ij", J, J, precision=_P32)
        g = J.T @ r
        step = jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), g)
        new = params - step
        better = jnp.sum(residual(new) ** 2) < jnp.sum(r * r)
        params = jnp.where(better, new, params)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e4)
        return params, lam

    params, _ = lax.fori_loop(0, iters, body, (params, jnp.float32(1e-3)))
    r = residual(params)
    ecc = 1.0 - 0.5 * jnp.sum(r * r)  # ||a-b||^2 = 2-2rho for unit vectors
    return _warp_params_to_matrix(params, motion), ecc
