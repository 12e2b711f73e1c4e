"""ATE parity vs the cv2 reference pipeline on identical rendered frames
(BASELINE.md north star, measured on data this box has — VERDICT r3
missing #1). Full-size numbers: benchmarks/ate_parity.json (produced by
benchmarks/ate_parity.py); this test runs the reduced config end-to-end
and asserts the parity bound."""

import importlib.util
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


def _load_ate_parity():
    spec = importlib.util.spec_from_file_location(
        "ate_parity", os.path.join(REPO, "benchmarks", "ate_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_ref_data
def test_forward_sequence_ate_parity():
    from opencv_tpu.utils.evaluate import ate_rmse

    ap = _load_ate_parity()
    frames, gt, K = ap.render_forward(240, 320, 90)
    traj_cv2 = ap.run_cv2_vo(frames, K, n_features=1200)
    traj_repo, engine = ap.run_repo_vo(frames, K, n_features=1200)
    assert engine.state == "tracking", "repo engine lost tracking"
    ate_cv2 = ate_rmse(traj_cv2, gt)
    ate_repo = ate_rmse(traj_repo, gt)
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
