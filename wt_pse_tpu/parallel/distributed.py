"""Multi-host initialization hook.

Single-host slices need nothing; on a multi-host deployment call
``initialize_multihost()`` once per process before any jax computation
(wraps ``jax.distributed.initialize`` with env-driven defaults). All the
framework's collectives (grad pmean, sync-BN, MMD all_gather) are mesh-axis
based and carry over unchanged — the mesh simply spans all hosts' devices
(``parallel.mesh.data_mesh`` then returns the global device list).
"""

from __future__ import annotations

import os


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or JAX_* env vars. Returns True if
    distributed mode was initialized, False for single-process runs."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True
