"""Multi-host substrate tests (parallel/multihost.py).

Two tiers, per SURVEY.md §4's added multi-host strategy:
  1. single-process SIMULATION: the 8 virtual CPU devices partitioned as
     a 2x4 (host, chip) mesh — same axis structure and psum axis sets as
     a real 2-host slice, only the transport differs;
  2. a REAL 2-process run: subprocesses with jax.distributed.initialize
     over localhost (Gloo), 4 virtual devices each, running the
     observation-sharded BA on a global mesh and asserting equality with
     the single-device solver.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opencv_tpu.optim import ba
from opencv_tpu.parallel import dist_ba, multihost

from test_optim import make_ba_problem  # synthetic BA scene


def _padded_problem(rng, n_dev):
    prob, *_ = make_ba_problem(rng, n_cams=4, n_pts=64)
    O = prob.obs_cam.shape[0]
    pad = (-O) % n_dev
    return prob._replace(
        obs_cam=jnp.pad(prob.obs_cam, (0, pad)),
        obs_pt=jnp.pad(prob.obs_pt, (0, pad)),
        obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
        obs_valid=jnp.pad(prob.obs_valid, (0, pad)),
    )


def test_simulated_two_host_ba(rng):
    """BA sharded over a hierarchical (host, chip) mesh == single device."""
    prob = _padded_problem(rng, 8)
    mesh = multihost.simulate_host_mesh(2)  # 2x4
    assert mesh.shape == {"host": 2, "chip": 4}

    opt_s, cost_s = dist_ba.bundle_adjust_sharded(
        prob, mesh, iters=10, axes=(multihost.HOST_AXIS, multihost.CHIP_AXIS)
    )
    opt_1, _ = ba.bundle_adjust(prob, iters=10)
    assert float(cost_s) < float(ba.cost(prob)) * 1e-2
    np.testing.assert_allclose(
        np.asarray(opt_s.cam_tvec), np.asarray(opt_1.cam_tvec), atol=1e-3
    )


def test_host_mesh_single_process_shape():
    mesh = multihost.make_host_mesh()
    assert mesh.shape[multihost.HOST_AXIS] == 1
    assert mesh.shape[multihost.CHIP_AXIS] == len(jax.devices())


def test_run_on_host0_passthrough():
    out = multihost.run_on_host0(lambda: np.arange(6.0), (6,), np.float32)
    np.testing.assert_allclose(out, np.arange(6.0))


_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from opencv_tpu.parallel import multihost
multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from opencv_tpu.optim import ba
from opencv_tpu.parallel import dist_ba

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_optim import make_ba_problem

rng = np.random.default_rng(1234)
prob, *_ = make_ba_problem(rng, n_cams=4, n_pts=64)
O = prob.obs_cam.shape[0]; pad = (-O) % 8
prob = prob._replace(
    obs_cam=jnp.pad(prob.obs_cam, (0, pad)),
    obs_pt=jnp.pad(prob.obs_pt, (0, pad)),
    obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
    obs_valid=jnp.pad(prob.obs_valid, (0, pad)),
)
mesh = multihost.make_host_mesh()
assert mesh.shape == {"host": 2, "chip": 4}
axes = (multihost.HOST_AXIS, multihost.CHIP_AXIS)
shd = lambda a: multihost.global_sharded(mesh, P(axes), np.asarray(a))
rep = lambda a: multihost.replicated(mesh, np.asarray(a))
gprob = prob._replace(
    cam_rvec=rep(prob.cam_rvec), cam_tvec=rep(prob.cam_tvec),
    points=rep(prob.points), fixed_cams=rep(prob.fixed_cams),
    obs_cam=shd(prob.obs_cam), obs_pt=shd(prob.obs_pt),
    obs_uv=shd(prob.obs_uv), obs_valid=shd(prob.obs_valid),
)
opt_s, cost_s = dist_ba.bundle_adjust_sharded(gprob, mesh, iters=10, axes=axes)
tvec_dist = multihost.fetch_replicated(opt_s.cam_tvec)

opt_1, _ = ba.bundle_adjust(prob, iters=10)  # local single-device reference
assert float(multihost.fetch_replicated(cost_s)) < float(ba.cost(prob)) * 1e-2
np.testing.assert_allclose(tvec_dist, np.asarray(opt_1.cam_tvec), atol=1e-3)

# host-0 broadcast policy hook
out = multihost.run_on_host0(lambda: np.full(4, 7.0, np.float32), (4,), np.float32)
np.testing.assert_allclose(out, 7.0)
print(f"WORKER_OK {pid}", flush=True)
"""


@pytest.mark.slow
def test_real_two_process_ba(tmp_path):
    """Launch 2 actual processes, Gloo collectives over localhost."""
    script = tmp_path / "mh_worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:  # grab a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # the ambient sitecustomize registers the axon PJRT backend (and so
    # initialises JAX) whenever PALLAS_AXON_POOL_IPS is set — that must
    # not happen before jax.distributed.initialize in the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(tests_dir)
    env["PYTHONPATH"] = (
        tests_dir + os.pathsep + repo_root
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out
