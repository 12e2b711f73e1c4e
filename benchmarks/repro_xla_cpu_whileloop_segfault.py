"""Minimal repro harness for the XLA:CPU compile-time segfault that forced
the VO engine's fixed-batch RANSAC workaround (commit 543f0e8; VOConfig
ransac_adaptive=None resolves to False on the CPU backend because of it).

Observed failure mode (round 2): building MANY distinct jitted programs
that each contain the chunked-adaptive RANSAC `lax.while_loop`
(geometry/ransac.py ransac_adaptive) in ONE long-lived process —
the engine's test lane — intermittently crashes inside XLA:CPU's
backend_compile_and_load (SIGSEGV, not a Python exception). The same
programs compile fine in isolation, which is why this harness compiles a
large number of shape-distinct variants in-process.

Usage:
    python benchmarks/repro_xla_cpu_whileloop_segfault.py [n_variants]

Exit 0 = no crash reproduced this run (the bug is intermittent; round-2
logs saw it roughly once per 2-3 full-suite runs). A segfault exits with
SIGSEGV — run under a shell that reports termination signals.

Status: not yet root-caused upstream; tracked here so a future jaxlib
bump can be re-validated by running this harness a few times before
removing the CPU fence in slam/vo.py.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from opencv_tpu.core.config import RansacConfig  # noqa: E402
from opencv_tpu.geometry import epipolar, pnp  # noqa: E402


def main(n_variants: int = 40) -> None:
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for i in range(n_variants):
        # shape-distinct programs (like the engine's per-call-site jits)
        n = 128 + 16 * (i % 24)
        p0 = jnp.asarray(rng.normal(0, 0.3, (n, 2)).astype(np.float32))
        p1 = p0 + jnp.asarray(rng.normal(0, 1e-3, (n, 2)).astype(np.float32))
        valid = jnp.ones((n,), bool)
        cfg = RansacConfig(n_hypotheses=256 + 64 * (i % 3), threshold=2e-3)
        res = epipolar.find_essential_ransac(
            key, p0, p1, valid=valid, adaptive=True, cfg=cfg
        )
        X = jnp.concatenate([p0, jnp.ones((n, 1))], axis=1) * 5.0
        pres = pnp.solve_pnp_ransac(
            key, X, p1, valid=valid, adaptive=True,
            cfg=RansacConfig(n_hypotheses=256, threshold=3e-3),
        )
        print(
            f"variant {i}: n={n} E_inl={int(res.n_inliers)} "
            f"pnp_inl={int(pres.n_inliers)}",
            flush=True,
        )
    print("no crash reproduced in", n_variants, "variants")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
