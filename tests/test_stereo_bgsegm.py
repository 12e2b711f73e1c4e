"""StereoBM on synthetic shifted scenes; MOG2 on synthetic sequences."""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import bgsegm, stereo


def make_stereo_pair(rng, disp=12, h=96, w=160):
    """Left image random texture; right = left shifted LEFT by disp
    (so left[y,x] == right[y,x-disp])."""
    tex = rng.uniform(0, 255, size=(h, w + 96)).astype(np.float32)
    from opencv_tpu.core import imgproc

    tex = np.asarray(imgproc.gaussian_blur(jnp.asarray(tex), 5, 1.0))
    left = tex[:, 32 : 32 + w]
    right = tex[:, 32 + disp : 32 + disp + w]  # features shift LEFT in right
    return left, right


def test_stereobm_constant_disparity(rng):
    left, right = make_stereo_pair(rng, disp=12)
    d = np.asarray(
        stereo.compute_disparity_bm(jnp.asarray(left), jnp.asarray(right), 32, 11)
    )
    interior = d[20:-20, 40:-20]
    valid = interior[interior > 0]
    assert len(valid) > 0.7 * interior.size
    assert abs(np.median(valid) - 12.0) < 0.5


def test_stereobm_two_depths(rng):
    h, w = 96, 160
    tex = rng.uniform(0, 255, size=(h, w + 96)).astype(np.float32)
    from opencv_tpu.core import imgproc

    tex = np.asarray(imgproc.gaussian_blur(jnp.asarray(tex), 5, 1.0))
    left = tex[:, 32 : 32 + w].copy()
    right = np.empty_like(left)
    # top half disparity 6, bottom half 18
    right[: h // 2] = tex[: h // 2, 32 + 6 : 32 + 6 + w]
    right[h // 2 :] = tex[h // 2 :, 32 + 18 : 32 + 18 + w]
    d = np.asarray(
        stereo.compute_disparity_bm(jnp.asarray(left), jnp.asarray(right), 32, 9)
    )
    top = d[15 : h // 2 - 10, 40:-20]
    bot = d[h // 2 + 10 : -15, 40:-20]
    assert abs(np.median(top[top > 0]) - 6.0) < 1.0
    assert abs(np.median(bot[bot > 0]) - 18.0) < 1.0


def test_reproject_to_3d():
    disp = jnp.full((10, 10), 10.0)
    pts = np.asarray(stereo.reproject_to_3d(disp, fx=100.0, baseline=0.5, cx=5.0, cy=5.0))
    np.testing.assert_allclose(pts[..., 2], 5.0)  # Z = 100*0.5/10
    assert abs(pts[5, 5, 0]) < 0.3 and abs(pts[5, 5, 1]) < 0.3


def test_mog2_learns_background_and_flags_foreground(rng):
    h, w = 40, 50
    bg = rng.uniform(80, 120, size=(h, w)).astype(np.float32)
    state = bgsegm.init_state(jnp.asarray(bg))
    # train on noisy background
    for _ in range(30):
        frame = bg + rng.normal(0, 2.0, (h, w)).astype(np.float32)
        state, fg = bgsegm.apply(state, jnp.asarray(frame), learning_rate=0.05)
    assert np.asarray(fg).mean() < 0.05  # background learned
    # foreground object appears
    frame = bg.copy()
    frame[10:20, 15:30] = 250.0
    state, fg = bgsegm.apply(state, jnp.asarray(frame), learning_rate=0.05)
    fg = np.asarray(fg)
    assert fg[12:18, 18:27].mean() > 0.9
    assert fg[30:, 35:].mean() < 0.1


def test_mog2_adapts_to_new_background(rng):
    h, w = 20, 20
    bg1 = np.full((h, w), 100.0, np.float32)
    bg2 = np.full((h, w), 200.0, np.float32)
    state = bgsegm.init_state(jnp.asarray(bg1))
    for _ in range(10):
        state, _ = bgsegm.apply(state, jnp.asarray(bg1), learning_rate=0.1)
    # scene change: initially foreground, then absorbed
    state, fg_first = bgsegm.apply(state, jnp.asarray(bg2), learning_rate=0.1)
    assert np.asarray(fg_first).mean() > 0.9
    for _ in range(60):
        state, fg = bgsegm.apply(state, jnp.asarray(bg2), learning_rate=0.1)
    assert np.asarray(fg).mean() < 0.1


def test_knn_bgsub_detects_and_adapts(rng):
    import jax

    h, w = 30, 30
    bg = rng.uniform(80, 120, size=(h, w)).astype(np.float32)
    state = bgsegm.knn_init(jnp.asarray(bg))
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        frame = bg + rng.normal(0, 2.0, (h, w)).astype(np.float32)
        state, fg = bgsegm.knn_apply(state, jnp.asarray(frame), sub)
    assert np.asarray(fg).mean() < 0.05
    frame = bg.copy()
    frame[10:20, 10:20] = 250.0
    key, sub = jax.random.split(key)
    state, fg = bgsegm.knn_apply(state, jnp.asarray(frame), sub)
    fg = np.asarray(fg)
    assert fg[12:18, 12:18].mean() > 0.9
    assert fg[:8, :8].mean() < 0.1
