"""Numeric sanitizers + determinism harness.

The reference's story here is CV_Assert/CV_DbgAssert in debug builds and
cudaSafeCall after every kernel (core/cuda/common.hpp:74); its async
tests double as race checks (SURVEY §5). The TPU equivalents:

- `checked(fn)`: wraps a jittable function with jax.experimental.checkify
  so NaN/inf production and out-of-bounds gathers raise structured
  errors instead of propagating silently — the debug-build analog. Zero
  cost when unused; opt-in per call site like CV_DbgAssert.
- `assert_finite(tree)`: eager guard for host-side checkpoints.
- `determinism_check(fn, *args)`: run twice, assert bitwise equality —
  the de-facto race detector on an accelerator (XLA programs are
  deterministic unless something is wrong: donated-buffer aliasing,
  cross-replica nondeterminism, host threading).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap `fn` with checkify (float + index error sets by default).
    The wrapper raises ValueError on the first NaN/inf/OOB with the
    offending primitive's location."""
    errs = errors or (checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errs)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree: Any, name: str = "value") -> None:
    """Host-side eager guard: raises on any non-finite leaf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite "
                f"values of {arr.size}"
            )


def determinism_check(fn: Callable, *args, **kwargs) -> bool:
    """Run `fn` twice; True iff every output leaf is BITWISE identical.
    (The reference's multi-stream async tests play this role for CUDA;
    under XLA any divergence indicates buffer aliasing or a real race.)"""
    a = fn(*args, **kwargs)
    b = fn(*args, **kwargs)
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    for x, y in zip(la, lb):
        xa = np.asarray(x)
        ya = np.asarray(y)
        if xa.shape != ya.shape or xa.dtype != ya.dtype:
            return False
        if xa.tobytes() != ya.tobytes():
            return False
    return True
