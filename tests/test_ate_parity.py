"""ATE parity vs the cv2 reference pipeline on identical rendered frames
(BASELINE.md north star, measured on data this box has — VERDICT r3
missing #1). Full-size numbers: benchmarks/ate_parity.json (produced by
benchmarks/ate_parity.py); this test runs the reduced config end-to-end
and asserts the parity bound."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/samples/data"

needs_ref_data = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference sample images not present"
)


@needs_ref_data
def test_forward_sequence_ate_parity():
    """Runs each pipeline in a SUBPROCESS (benchmarks/ate_parity.py
    --run-one): an in-process engine run here would stack its jitted
    programs onto the full suite's and risk the XLA:CPU LLVM
    section-memory exhaustion documented in COVERAGE.md."""
    import json
    import subprocess
    import sys
    import tempfile

    script = os.path.join(REPO, "benchmarks", "ate_parity.py")
    results = {}
    for pipe in ("cv2", "repo"):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            tmp = f.name
        subprocess.run(
            [sys.executable, script, "--run-one", "forward_dolly", pipe,
             tmp, "--small"],
            check=True, timeout=3000,
        )
        with open(tmp) as f:
            results[pipe] = json.load(f)
        os.unlink(tmp)
    assert results["repo"]["repo_state"] == "tracking"
    ate_cv2 = results["cv2"]["ate"]
    ate_repo = results["repo"]["ate"]
    # the parity bound from VERDICT r3 item 2: repo ATE within 1.25x of
    # the reference pipeline's on the same frames
    assert ate_repo <= 1.25 * ate_cv2, (ate_repo, ate_cv2)


@needs_ref_data
def test_committed_parity_artifact_consistent():
    """benchmarks/ate_parity.json (the full-size committed run) must
    exist and show parity on every sequence."""
    import json

    path = os.path.join(REPO, "benchmarks", "ate_parity.json")
    assert os.path.exists(path), "run benchmarks/ate_parity.py to produce it"
    with open(path) as f:
        payload = json.load(f)
    assert payload["sequences"], "empty parity artifact"
    for row in payload["sequences"]:
        assert row["ratio_repo_over_cv2"] <= 1.25, row
    rows = {r["sequence"]: r for r in payload["sequences"]}
    # loop-closure behavior (VERDICT r4 punch #3): the closed-loop orbit
    # must actually close; the pure-forward dolly — which never revisits
    # anything — must NOT (gap-gated retrieval, slam/vo.py)
    assert rows["closed_loop_orbit"]["repo_loop_closures"] >= 1, rows
    assert rows["forward_dolly"]["repo_loop_closures"] == 0, rows
    # platform provenance (VERDICT r4 weak #3): the full-size engine run
    # must record which backend produced it
    assert rows["forward_dolly"].get("platform_repo"), rows
