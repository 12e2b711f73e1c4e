"""Sanitizer/determinism harness tests (SURVEY §5 aux subsystems)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opencv_tpu.utils import guard


def test_checked_catches_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    g = guard.checked(jax.jit(f))
    assert np.isfinite(float(g(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        g(jnp.asarray(-1.0))


def test_assert_finite():
    guard.assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        guard.assert_finite({"a": jnp.asarray([1.0, np.inf])}, "state")


def test_determinism_of_engine_front_end(rng):
    """Bitwise-identical reruns of the ORB front end — the de-facto race
    check (cf. the reference's async multi-stream tests)."""
    from opencv_tpu.core.config import ORBConfig
    from opencv_tpu.ops import orb

    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    fn = jax.jit(lambda a: orb.detect_and_compute(a, ORBConfig(
        n_features=256, n_levels=3)))
    assert guard.determinism_check(fn, img)
