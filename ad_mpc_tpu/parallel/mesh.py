"""Device-mesh helpers: the framework's scaling axis.

The reference is a single-process, single-vehicle stack (SURVEY.md §2.6);
its TPU-native counterpart scales *scenario count* — thousands of concurrent
vehicle/quad MPC solves — by sharding the batch axis of every solver input
over an ICI mesh. One jitted program serves 1 chip or a multi-host slice;
XLA inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


HOST_AXIS = "host"


def make_mesh_2d(
    n_hosts: int,
    chips_per_host: int | None = None,
    host_axis: str = HOST_AXIS,
    chip_axis: str = BATCH_AXIS,
) -> Mesh:
    """2-D (host x chip) mesh: the DCN axis outermost so cross-host
    collectives ride DCN while intra-host reductions stay on ICI — the
    topology BASELINE's ">=2 hosts" scaling row measures. With the scenario
    batch sharded over BOTH axes, each solve stays on one chip and no
    per-solve collective ever crosses DCN (batch DP is embarrassingly
    parallel; only diagnostics reductions cross hosts)."""
    devs = jax.devices()
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    devs = devs[: n_hosts * chips_per_host]
    arr = np.array(devs).reshape(n_hosts, chips_per_host)
    return Mesh(arr, (host_axis, chip_axis))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest. On a 2-D mesh the
    batch dim shards over both axes (host-major)."""
    if len(mesh.axis_names) == 2:
        return NamedSharding(mesh, P(mesh.axis_names))
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
