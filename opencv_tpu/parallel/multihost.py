"""Multi-host substrate: jax.distributed glue + host-aware (DCN x ICI)
meshes + global-array construction from per-host data.

The reference is strictly single-process (SURVEY.md §2.8 — no NCCL/MPI
anywhere in the tree); this is the one structural component the TPU
build adds rather than re-expresses. Design follows the standard JAX
multi-host recipe: one process per host calls
`jax.distributed.initialize`, every process participates in building ONE
global mesh whose OUTER axis spans processes (traffic on that axis rides
DCN) and whose INNER axis spans each host's local chips (ICI). Sharded
computations are written once against axis names; XLA routes the
collectives hierarchically (ICI-first reduce, then DCN) on real slices.

Consumers:
  * parallel/dist_ba.py   — observations sharded over BOTH axes; the LM
    accumulators psum over ("host", "chip") which XLA lowers to an
    in-host reduce-scatter + cross-host all-reduce of parameter-sized
    tensors only;
  * parallel/dist_match.py — map blocks sharded over the flattened mesh.

Validated two ways (tests/test_multihost.py): a REAL 2-process CPU run
(Gloo collectives over localhost, 4 virtual devices per process) and a
single-process 2x4 simulation, both asserting equality with the
single-device solver.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

HOST_AXIS = "host"  # spans processes: collectives on it ride DCN
CHIP_AXIS = "chip"  # spans each host's local devices: rides ICI

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent `jax.distributed.initialize` wrapper.

    With no arguments, relies on env auto-detection (TPU pods populate
    the cluster env; single-process runs no-op). Explicit args support
    the CPU/Gloo integration test and manual launches."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process: nothing to set up
    # NOTE: must run before ANY backend-initializing jax call (including
    # jax.devices/process_count), hence no are-we-already-multi-process
    # probe here — the _initialized flag alone provides idempotence.
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def make_host_mesh(
    axis_names: tuple[str, str] = (HOST_AXIS, CHIP_AXIS),
) -> Mesh:
    """Global [n_hosts, chips_per_host] mesh, rows grouped by process.

    Row p holds exactly process p's local devices (sorted by id), so the
    outer axis is the DCN axis and the inner axis the ICI axis. In a
    single process this degenerates to [1, n_devices]."""
    devs = jax.devices()
    n_proc = jax.process_count()
    rows = [
        sorted((d for d in devs if d.process_index == p), key=lambda d: d.id)
        for p in range(n_proc)
    ]
    width = len(rows[0])
    assert all(len(r) == width for r in rows), "uneven devices per host"
    return Mesh(np.array(rows), axis_names)


def simulate_host_mesh(
    n_hosts: int, axis_names: tuple[str, str] = (HOST_AXIS, CHIP_AXIS)
) -> Mesh:
    """Single-process stand-in for an n_hosts layout: partition the local
    devices into n_hosts rows. Collectives take the same (outer, inner)
    axis structure as a real multi-host mesh, so sharding layouts and
    psum axis sets are exercised identically (only the transport
    differs)."""
    devs = jax.devices()
    assert len(devs) % n_hosts == 0, f"{len(devs)} devices over {n_hosts} hosts"
    return Mesh(np.array(devs).reshape(n_hosts, -1), axis_names)


def global_sharded(
    mesh: Mesh, spec: PartitionSpec, host_value: np.ndarray
) -> jax.Array:
    """Build a global array from the SAME full-size per-host value.

    Every process passes the identical full array (the cheap pattern for
    BA problems, whose observation tensors are built host-side anyway);
    each process materializes only its addressable shards."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda idx: host_value[idx]
    )


def replicated(mesh: Mesh, host_value: np.ndarray) -> jax.Array:
    return global_sharded(mesh, PartitionSpec(), host_value)


def fetch_replicated(x: jax.Array) -> np.ndarray:
    """Read back a replicated global array on any process (each process
    owns a full copy in its addressable shards)."""
    return np.asarray(x.addressable_shards[0].data)


def run_on_host0(fn: Callable[[], np.ndarray], shape, dtype) -> np.ndarray:
    """SURVEY §7.8 policy hook: a small global problem (pose graph, loop
    closure) is solved on host 0 in plain numpy, then broadcast to every
    process. Single-process: just fn()."""
    if jax.process_count() == 1:
        return np.asarray(fn(), dtype)
    from jax.experimental import multihost_utils

    local = fn() if jax.process_index() == 0 else np.zeros(shape, dtype)
    return np.asarray(
        multihost_utils.broadcast_one_to_all(np.asarray(local, dtype))
    )
