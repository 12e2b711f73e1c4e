"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's recommendation: multi-chip sharding is validated
single-process via XLA's host-platform device-count override, the same way
the reference validates CUDA kernels against CPU gold without needing a
farm of GPUs.

Env vars MUST be set before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel) and sitecustomize.py imports jax before conftest runs, so the
# env var alone is not enough — jax.config must be updated too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same fresh stream, so adding
    # or reordering tests can never change another test's random draws
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def checker_image():
    """Synthetic 128x160 image with corners, gradients and texture."""
    rng = np.random.default_rng(0)
    h, w = 128, 160
    img = np.zeros((h, w), np.float32)
    # checkerboard block
    yy, xx = np.mgrid[0:h, 0:w]
    img += 120.0 * (((yy // 16) + (xx // 16)) % 2)
    # smooth gradient
    img += 40.0 * (xx / w)
    # random texture
    img += rng.normal(0, 10.0, (h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The suite jits hundreds of distinct programs; without this the
    full-suite run accumulates every executable in process memory and
    slows far past the sum of per-file runtimes."""
    yield
    jax.clear_caches()


# NOTE: do NOT enable jax_compilation_cache_dir here. On this jaxlib the
# XLA:CPU persistent-cache READ path aborts the process
# ("Fatal Python error: Aborted" in compilation_cache.get_executable_and_time)
# once entries written earlier in the run are re-read — it killed two
# full-suite runs ~35 min in before the cause was isolated.


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute end-to-end runs (engine sequences, renders, "
        "2-process tests). Fast lane: pytest -m 'not slow' (measured "
        "24m12s / 416 tests round 5 on the 2-vCPU host); full suite "
        "(CI/driver): pytest tests/.",
    )
