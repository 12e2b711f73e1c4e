"""Aux subsystem tests: persistence round-trip, profiler regions, logger."""

import numpy as np

from opencv_tpu.utils import persistence, profiler
from opencv_tpu.utils.logger import get_logger


def test_persistence_roundtrip(tmp_path, rng):
    state = {
        "poses": rng.normal(size=(5, 6)).astype(np.float32),
        "landmarks": {
            "pos": rng.normal(size=(100, 3)).astype(np.float32),
            "valid": rng.random(100) > 0.5,
        },
        "frames": 42,
        "name": "kitti00",
        "scales": [1.0, 1.2, 1.44],
        "none_field": None,
    }
    path = str(tmp_path / "ckpt")
    persistence.save_state(path, state)
    back = persistence.load_state(path)
    np.testing.assert_array_equal(back["poses"], state["poses"])
    np.testing.assert_array_equal(back["landmarks"]["pos"], state["landmarks"]["pos"])
    np.testing.assert_array_equal(back["landmarks"]["valid"], state["landmarks"]["valid"])
    assert back["frames"] == 42
    assert back["name"] == "kitti00"
    assert back["scales"] == [1.0, 1.2, 1.44]
    assert back["none_field"] is None


def test_profiler_regions():
    profiler.reset()
    profiler.enable(True)
    with profiler.profile_region("outer"):
        with profiler.profile_region("inner"):
            sum(range(1000))
    rep = profiler.report()
    assert "outer" in rep and "inner" in rep
    assert rep["outer"][1] == 1
    assert rep["outer"][0] >= rep["inner"][0]
    profiler.enable(False)


def test_logger_levels(capsys):
    log = get_logger("opencv_tpu.test")
    log.warning("a warning")
    err = capsys.readouterr().err
    assert "a warning" in err
