"""Multi-host bring-up helpers.

A pod-slice deployment calls `initialize_multihost()` once per host process;
afterwards `jax.devices()` spans the slice and the same Mesh/sharding code in
mesh.py drives DP over hosts (DCN for batch scatter / audio gather, ICI for
model collectives). On single-host setups this is a no-op.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed when running as part of a multi-host job.

    With no arguments, relies on the cluster environment (TPU metadata / env
    vars) the way jax.distributed.initialize() auto-detects. Returns a summary
    dict for logging/health endpoints.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    logger.info("multihost: %s", info)
    return info


def assert_mesh_healthy(mesh) -> bool:
    """Cheap liveness collective over the mesh: every device contributes 1 and
    the psum must equal the device count. Used by serving health checks."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    ones = jax.device_put(
        jnp.ones((n,), jnp.int32),
        NamedSharding(mesh, P(mesh.axis_names[0])),
    )
    total = int(jnp.sum(ones))
    return total == n
