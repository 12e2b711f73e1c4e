"""Kalman filter: batched predict/correct.

Analog of cv::KalmanFilter (reference: video/src/kalman.cpp, 134 LoC).
TPU-native twist: the filter state is a pytree of arrays with an
arbitrary leading batch shape, so a tracker holding N targets updates
all of them in one fused step (the reference loops one filter per
track).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class KalmanState(NamedTuple):
    x: jnp.ndarray  # [..., S] state estimate
    P: jnp.ndarray  # [..., S, S] covariance


def predict(
    state: KalmanState, F: jnp.ndarray, Q: jnp.ndarray
) -> KalmanState:
    """x <- F x;  P <- F P F^T + Q."""
    x = jnp.einsum("ij,...j->...i", F, state.x)
    P = jnp.einsum("ij,...jk,lk->...il", F, state.P, F) + Q
    return KalmanState(x=x, P=P)


def correct(
    state: KalmanState, H: jnp.ndarray, R: jnp.ndarray, z: jnp.ndarray
) -> KalmanState:
    """Measurement update with z [..., M]."""
    S = jnp.einsum("ij,...jk,lk->...il", H, state.P, H) + R
    PHt = jnp.einsum("...ij,kj->...ik", state.P, H)
    K = jnp.linalg.solve(S, jnp.swapaxes(PHt, -1, -2))  # [...,M,S]
    K = jnp.swapaxes(K, -1, -2)  # [...,S,M]
    innov = z - jnp.einsum("ij,...j->...i", H, state.x)
    x = state.x + jnp.einsum("...ij,...j->...i", K, innov)
    eye = jnp.eye(state.P.shape[-1], dtype=state.P.dtype)
    KH = jnp.einsum("...ij,jk->...ik", K, H)
    P = jnp.einsum("...ij,...jk->...ik", eye - KH, state.P)
    return KalmanState(x=x, P=P)


def constant_velocity_model(
    dim: int, dt: float = 1.0, process_noise: float = 1e-2,
    measurement_noise: float = 1e-1, init_var: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(F, H, Q, R, P0) for a [pos(dim), vel(dim)] state measuring pos.

    The default motion model of the TBD tracker (the reference installs a
    constant-velocity `motionModel` function pointer, tbd.hpp:96-121)."""
    eye = jnp.eye(dim)
    F = jnp.block([[eye, dt * eye], [jnp.zeros((dim, dim)), eye]])
    H = jnp.concatenate([eye, jnp.zeros((dim, dim))], axis=1)
    Q = process_noise * jnp.eye(2 * dim)
    R = measurement_noise * jnp.eye(dim)
    P0 = init_var * jnp.eye(2 * dim)
    return F, H, Q, R, P0
