"""Per-kernel performance regression harness (ts_perf analog,
reference modules/ts/src/ts_perf.cpp + per-module perf/perf_*.cpp).

Measures each hot op with the amortized on-device fori_loop method and
compares against the stored baseline (benchmarks/baselines.json, the
SANITY_CHECK analog but for timings: committed numbers from this repo's
own history, regression = slower than baseline * tolerance).

Run on the TPU:   python benchmarks/perf_kernels.py
Update baseline:  python benchmarks/perf_kernels.py --update
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "baselines.json")
TOLERANCE = 1.5  # fail if slower than baseline * tolerance


def measure(body, n=30):
    """Amortized per-iteration seconds of `body(carry)->carry`.

    Auto-scales the trip count until the measured interval clears the
    device-relay jitter (~tens of ms): sub-ms kernels at n=30 would be
    pure noise."""

    @jax.jit
    def run(k):
        return lax.fori_loop(0, k, lambda i, c: body(c), jnp.float32(0.0))

    float(run(jnp.int32(2)))  # compile once (dynamic trip count)
    while True:
        t0 = time.perf_counter()
        float(run(jnp.int32(n + 2)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(jnp.int32(2)))
        tb = time.perf_counter() - t0
        diff = ta - tb
        if diff > 0.1 or n >= 50000:
            return max(diff / n, 1e-9)
        n *= 8


def build_benchmarks():
    from opencv_tpu.core import imgproc
    from opencv_tpu.core.config import MatchConfig, ORBConfig
    from opencv_tpu.ops import fast, matching, orb
    from opencv_tpu.ops.pallas import knn

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, size=(376, 1241)).astype(np.float32))
    img2 = jnp.asarray(np.roll(np.asarray(img), (3, 7), (0, 1)))
    qs = matching.signed_descriptors(
        jnp.asarray(rng.integers(0, 2 ** 32, (2048, 8), dtype=np.uint64).astype(np.uint32))
    )
    ts_ = matching.signed_descriptors(
        jnp.asarray(rng.integers(0, 2 ** 32, (65536, 8), dtype=np.uint64).astype(np.uint32))
    )
    cfg = ORBConfig(n_features=2000, n_levels=8)

    def orb_pair(c):
        kp0, d0 = orb.detect_and_compute(img * (1.0 + c * 1e-30), cfg)
        kp1, d1 = orb.detect_and_compute(img2, cfg)
        m = matching.knn_match(d0, d1, query_valid=kp0.valid,
                               train_valid=kp1.valid, config=MatchConfig())
        return jnp.sum(m.distance) * 1e-12

    return {
        "fast_score_kitti": lambda c: jnp.sum(fast.fast_score(img * (1.0 + c * 1e-30))) * 1e-12,
        "harris_kitti": lambda c: jnp.sum(imgproc.harris_response(img * (1.0 + c * 1e-30))) * 1e-12,
        "gaussian7_kitti": lambda c: jnp.sum(imgproc.gaussian_blur(img * (1.0 + c * 1e-30))) * 1e-12,
        "orb_pair_2000": orb_pair,
        "streaming_knn_2048x65536": lambda c: jnp.sum(
            knn.knn2_hamming(qs * (1.0 + c * 1e-30).astype(qs.dtype), ts_)[0]
        ) * 1e-12,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    baseline = {}
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)

    results = {}
    failures = []
    for name, body in build_benchmarks().items():
        ms = measure(body) * 1e3
        results[name] = round(ms, 3)
        base = baseline.get(name)
        status = ""
        if base is not None and not args.update:
            if ms > base * TOLERANCE:
                status = f"  REGRESSION (baseline {base} ms)"
                failures.append(name)
            else:
                status = f"  (baseline {base} ms)"
        print(f"{name}: {ms:.3f} ms{status}", flush=True)

    if args.update:
        with open(BASELINE_PATH, "w") as f:
            json.dump(results, f, indent=2)
        print(f"baseline updated: {BASELINE_PATH}")
        return 0
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
