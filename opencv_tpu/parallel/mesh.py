"""Device-mesh helpers: the distribution substrate the reference lacks.

The reference is single-process/single-GPU (SURVEY.md §2.8 — no NCCL/MPI
anywhere); its only parallelism is intra-kernel. This module is the new
first-class component: explicit `jax.sharding.Mesh` construction over
ICI/DCN with named axes, used by parallel/dist_ba.py (observation-sharded
bundle adjustment) and parallel/dist_match.py (map-sharded matching).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


DATA_AXIS = "data"  # shards observations / frames (DP analog)
MODEL_AXIS = "model"  # shards the map / train descriptors (MP analog)


def make_mesh(
    n_devices: int | None = None, axis_names: tuple[str, ...] = (DATA_AXIS,)
) -> Mesh:
    """1-D (or reshaped n-D) mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if len(axis_names) == 1:
        shape = (len(devs),)
    elif len(axis_names) == 2:
        # favour the data axis
        n = len(devs)
        m = 1
        while n % 2 == 0 and m < 2:
            n //= 2
            m *= 2
        shape = (len(devs) // m, m)
    else:
        raise ValueError("1- or 2-axis meshes only")
    return Mesh(np.array(devs).reshape(shape), axis_names)


def shard_leading(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading array axis over `axis`."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
