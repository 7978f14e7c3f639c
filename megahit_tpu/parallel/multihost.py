"""Multi-host initialization and mesh construction.

The reference is single-node (files are its interconnect). The
TPU-native scale-out path: `jax.distributed` for multi-host process
bootstrap, one global mesh whose "shard" axis spans all chips, ICI
collectives inside a slice and DCN between hosts (handled by XLA's
partitioner through the same `shard_map` programs used single-host -
see parallel.shuffle).

Single-process this is a thin wrapper; on a pod slice launch one
process per host with the usual JAX coordinator environment
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or
pass them explicitly.
"""

from __future__ import annotations

import numpy as np

from ..utils.log import get_logger


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed when running multi-process; no-op
    for a single process with no coordinator configured."""
    import os

    import jax

    if coordinator is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    get_logger().info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def put_global(arr: np.ndarray, mesh, spec):
    """Create a GLOBAL device array from identical host data on every
    process (works single- and multi-process, unlike device_put which
    requires all mesh devices to be addressable)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fetch_global(x) -> np.ndarray:
    """Fetch a (possibly non-fully-addressable) global array to host."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def global_shard_mesh():
    """One 1-D mesh over every chip across all hosts (the counting
    shuffle's axis). Device order keeps each host's chips contiguous so
    the all_to_all's heavy traffic stays on ICI within a host/slice."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("shard",))
