"""Parity tests for the Pallas LK sampling kernels (interpret mode on
the CPU test platform; the identical pallas_call runs compiled when the
backend is a real TPU).

Gold = the XLA banded-einsum sampler `ops/lk.py _sample_at` (itself
parity-tested against the reference LK): `sample_templates_pallas` must
reproduce its zero-outside-image convention exactly, because ops/lk.py
`_level_templates` swaps between the two paths by backend.
"""

import numpy as np
import jax.numpy as jnp

from opencv_tpu.ops import lk
from opencv_tpu.ops.pallas.lk_sample import (
    sample_templates_pallas,
    sample_windows_pallas,
)


def _rand_image(rng, h=96, w=144):
    return rng.normal(0, 50.0, (h, w)).astype(np.float32) + 100.0


def _gold_windows(img, pts, win):
    return np.asarray(
        lk._sample_at(jnp.asarray(img), jnp.asarray(pts), win, "highest")
    )


def test_sample_windows_interpret_parity(rng):
    """The probe kernel on interior points (its documented domain)."""
    img = _rand_image(rng)
    h, w = img.shape
    win = 21
    n = 32
    pts = np.stack(
        [
            rng.uniform(12, w - 13, n),
            rng.uniform(12, h - 13, n),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(
        sample_windows_pallas(
            jnp.asarray(img), jnp.asarray(pts), win=win, blk=8,
            interpret=True,
        )
    )
    gold = _gold_windows(img, pts, win)
    np.testing.assert_allclose(got, gold, rtol=1e-5, atol=1e-3)


def test_sample_templates_interior_parity(rng):
    img = _rand_image(rng)
    from opencv_tpu.core import imgproc

    dx, dy = imgproc.scharr_derivatives(jnp.asarray(img))
    h, w = img.shape
    win = 21
    n = 48
    pts = np.stack(
        [rng.uniform(0, w - 1, n), rng.uniform(0, h - 1, n)], axis=-1
    ).astype(np.float32)
    iw, ix, iy = sample_templates_pallas(
        jnp.asarray(img), dx, dy, jnp.asarray(pts), win=win, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(iw), _gold_windows(img, pts, win), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ix), _gold_windows(np.asarray(dx), pts, win),
        rtol=1e-5, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(iy), _gold_windows(np.asarray(dy), pts, win),
        rtol=1e-5, atol=1e-3,
    )


def test_sample_templates_boundary_and_outside(rng):
    """Exact zero-convention parity at every awkward position: window
    hanging off each border, corners, wholly outside, and non-finite."""
    img = _rand_image(rng, 64, 80)
    h, w = img.shape
    win = 21
    pts = np.array(
        [
            [0.0, 0.0],
            [w - 1.0, h - 1.0],
            [0.3, 17.2],          # left edge
            [w - 1.4, 30.1],      # right edge
            [40.2, 0.7],          # top edge
            [39.9, h - 1.2],      # bottom edge
            [-3.5, 12.0],         # center outside, window partly in
            [w + 4.0, h + 4.0],   # center outside, corner overlap
            [-500.0, -500.0],     # far outside
            [1e7, 12.0],          # clamped far outside
            [np.nan, 5.0],        # non-finite
            [5.0, np.inf],
            [12.345, 11.875],     # interior (subpixel) for contrast
            [33.0, 44.0],         # integer position
        ],
        np.float32,
    )
    iw, _, _ = sample_templates_pallas(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(img),
        jnp.asarray(pts), win=win, interpret=True,
    )
    gold = _gold_windows(img, np.nan_to_num(pts, nan=-1e6,
                                            posinf=1e6, neginf=-1e6), win)
    np.testing.assert_allclose(np.asarray(iw), gold, rtol=1e-5, atol=1e-3)
    # the far-outside and non-finite rows must be exactly zero
    assert np.all(np.asarray(iw)[8:12] == 0.0)


def test_sample_templates_odd_count_padding(rng):
    """N not a multiple of blk: padded internally, result sliced back."""
    img = _rand_image(rng, 72, 96)
    win = 15
    pts = np.stack(
        [rng.uniform(10, 80, 21), rng.uniform(10, 60, 21)], axis=-1
    ).astype(np.float32)
    iw, _, _ = sample_templates_pallas(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(img),
        jnp.asarray(pts), win=win, interpret=True,
    )
    assert iw.shape == (21, win, win)
    np.testing.assert_allclose(
        np.asarray(iw), _gold_windows(img, pts, win), rtol=1e-5, atol=1e-3
    )


def test_sample_single_integer_extraction(rng):
    """win=48 frac-0 sampling == the XLA patch gather (bf16-rounded),
    the patch-extraction call site in _track_level_patch."""
    img = _rand_image(rng, 128, 200)
    h, w = img.shape
    p = 48
    jy0 = np.array([0, 13, h - p, 40, 7], np.int32)
    jx0 = np.array([0, 152, w - p, 99, 3], np.int32)
    from opencv_tpu.ops.pallas.lk_sample import sample_single_pallas

    ctr = np.stack([jx0, jy0], -1).astype(np.float32) + p // 2
    got = (
        np.asarray(
            sample_single_pallas(
                jnp.asarray(img), jnp.asarray(ctr), win=p, interpret=True
            )
        )
        .astype(np.float32)
    )
    gold = np.asarray(
        lk._extract_patches(
            jnp.asarray(img).astype(jnp.bfloat16)[None],
            jnp.asarray(jy0), jnp.asarray(jx0), p,
        )[0]
    )
    exact = np.stack([img[y : y + p, x : x + p] for y, x in zip(jy0, jx0)])
    np.testing.assert_allclose(got, exact, rtol=0, atol=1e-4)
    # and through the bf16 round-trip the two paths agree bit-for-bit
    got_bf16 = np.asarray(
        jnp.asarray(got).astype(jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_array_equal(got_bf16, gold)


def test_track_level_patch_pallas_parity(rng):
    """Full level track (templates + extraction + Newton + polish) with
    the kernel forced on vs off — trajectories must agree closely."""
    from opencv_tpu.core import imgproc
    from opencv_tpu.core.config import LKConfig
    import opencv_tpu.ops.lk as lkmod

    h, w = 400, 400
    base = _rand_image(rng, h, w)
    # smooth the noise so LK has a basin
    img0 = np.asarray(imgproc.gaussian_blur(jnp.asarray(base), 9, 2.0))
    shift = np.float32(1.7)
    img1 = np.roll(img0, 2, axis=1)  # ~2 px x-shift
    cfg = LKConfig(win_size=21, n_levels=1)
    n = 32
    pts = np.stack(
        [rng.uniform(40, w - 40, n), rng.uniform(40, h - 40, n)], -1
    ).astype(np.float32)
    dx, dy = imgproc.scharr_derivatives(jnp.asarray(img0))

    old = lkmod._use_pallas_templates
    try:
        lkmod._use_pallas_templates = lambda *a: False
        g_x, me_x, r_x = lkmod._track_level_patch(
            jnp.asarray(img0), jnp.asarray(img1), dx, dy,
            jnp.asarray(pts), jnp.asarray(pts), cfg,
        )
        lkmod._use_pallas_templates = lambda *a: True
        import opencv_tpu.ops.pallas.lk_sample as ls

        orig = ls.sample_channels_pallas
        ls.sample_channels_pallas = lambda *a, **k: orig(
            *a, **{**k, "interpret": True}
        )
        try:
            g_p, me_p, r_p = lkmod._track_level_patch(
                jnp.asarray(img0), jnp.asarray(img1), dx, dy,
                jnp.asarray(pts), jnp.asarray(pts), cfg,
            )
        finally:
            ls.sample_channels_pallas = orig
    finally:
        lkmod._use_pallas_templates = old

    ok = np.asarray(me_x) > cfg.min_eig_threshold
    np.testing.assert_allclose(
        np.asarray(g_p)[ok], np.asarray(g_x)[ok], rtol=0, atol=0.05
    )
    # both must actually track the 2 px shift
    moved = np.asarray(g_p)[ok, 0] - pts[ok, 0]
    assert np.median(moved) > 1.5, np.median(moved)


def test_level_templates_pallas_switch(rng):
    """ops/lk.py `_level_templates` with the kernel forced on must agree
    with the XLA path (G matrix, gate, and windows) on real workloads."""
    img = _rand_image(rng, 128, 160)
    from opencv_tpu.core import imgproc
    from opencv_tpu.core.config import LKConfig

    dx, dy = imgproc.scharr_derivatives(jnp.asarray(img))
    n = 64
    pts = np.stack(
        [rng.uniform(0, 159, n), rng.uniform(0, 127, n)], axis=-1
    ).astype(np.float32)
    cfg = LKConfig(win_size=21, n_levels=2)
    t_x = lk._level_templates(
        jnp.asarray(img), dx, dy, jnp.asarray(pts), cfg, use_pallas=False
    )
    t_p = lk._level_templates(
        jnp.asarray(img), dx, dy, jnp.asarray(pts), cfg,
        use_pallas=True, _pallas_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(t_p.iw), np.asarray(t_x.iw), rtol=1e-4, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(t_p.gxx), np.asarray(t_x.gxx), rtol=2e-3, atol=1.0
    )
    np.testing.assert_allclose(
        np.asarray(t_p.min_eig), np.asarray(t_x.min_eig), rtol=2e-3,
        atol=1e-4,
    )
    # the min-eig gate must agree except within a hair of the threshold
    near = (
        np.abs(np.asarray(t_x.min_eig) - cfg.min_eig_threshold)
        < 1e-3 * max(1.0, cfg.min_eig_threshold)
    )
    assert np.all((np.asarray(t_p.ok) == np.asarray(t_x.ok)) | near)
