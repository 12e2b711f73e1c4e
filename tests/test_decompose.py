"""Homography decomposition, projection decomposition, stereo rectify,
seamless cloning."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.geometry import decompose
from opencv_tpu.geometry.rotation import rodrigues
from opencv_tpu.ops import photo


def make_planar_homography(rng):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    rvec = rng.normal(0, 0.1, 3).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    t = rng.normal(0, 0.2, 3).astype(np.float32)
    n = np.array([0.1, -0.05, 1.0], np.float32)
    n /= np.linalg.norm(n)
    d = 3.0
    H = K @ (R + np.outer(t, n) / d) @ np.linalg.inv(K)
    return H.astype(np.float32), K, R, t / d, n


def test_decompose_homography_contains_truth(rng):
    H, K, R, t_over_d, n = make_planar_homography(rng)
    dec = decompose.decompose_homography(jnp.asarray(H), jnp.asarray(K))
    best_rot = np.inf
    best_n = np.inf
    for i in range(4):
        if not dec.valid[i]:
            continue
        Ri = np.asarray(dec.R[i])
        ni = np.asarray(dec.n[i])
        ang = np.arccos(np.clip((np.trace(Ri.T @ R) - 1) / 2, -1, 1))
        best_rot = min(best_rot, ang)
        best_n = min(best_n, np.linalg.norm(ni - n), np.linalg.norm(ni + n))
    assert best_rot < np.deg2rad(1.0)
    assert best_n < 0.05


def test_decompose_projection_matrix(rng):
    K = np.array([[600.0, 0, 300], [0, 580, 200], [0, 0, 1]], np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rng.normal(0, 0.4, 3).astype(np.float32))))
    C = rng.normal(0, 2, 3).astype(np.float32)
    P = K @ np.concatenate([R, (-R @ C)[:, None]], axis=1)
    Kd, Rd, Cd = decompose.decompose_projection_matrix(jnp.asarray(P))
    np.testing.assert_allclose(np.asarray(Kd), K / K[2, 2], rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(Rd), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Cd), C, atol=1e-2)


def test_stereo_rectify_aligns_rows(rng):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    rvec = rng.normal(0, 0.05, 3).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    t = np.array([-0.5, 0.02, 0.01], np.float32)
    rect = decompose.stereo_rectify(jnp.asarray(K), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), (480, 640))
    R1, R2 = np.asarray(rect.R1), np.asarray(rect.R2)
    # rectified cameras: rotations valid and relative rotation ~ identity
    for Rx in (R1, R2):
        np.testing.assert_allclose(Rx @ Rx.T, np.eye(3), atol=1e-4)
    Rrel = R1 @ R.T @ R2.T  # wait: verify row alignment via baseline
    # baseline in rectified frame-1 coordinates is along +/-x
    b = R1 @ (-t)  # direction from cam1 to cam2 in cam1 coords, rectified
    b = b / np.linalg.norm(b)
    assert abs(abs(b[0]) - 1.0) < 1e-3


def test_seamless_clone_boundary_smooth(rng):
    dst = np.full((40, 40), 50.0, np.float32)
    src = np.full((40, 40), 200.0, np.float32)
    # add texture to the source
    src[15:25, 15:25] += 30.0
    mask = np.zeros((40, 40), bool)
    mask[10:30, 10:30] = True
    out = np.asarray(photo.seamless_clone(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)))
    # outside untouched
    assert out[5, 5] == 50.0
    # inside: source TEXTURE preserved (relative contrast) but levels
    # pulled to the destination's boundary value
    assert abs(out[20, 20] - out[12, 12] - (src[20, 20] - src[12, 12])) < 8.0
    assert out[20, 20] < 150.0  # far below the raw source value
