"""Multi-host (DCN) initialization helper.

The reference is strictly single-host (SURVEY §2: no ``torch.distributed``, no
NCCL/MPI).  Multi-host here is one call: ``jax.distributed.initialize`` makes every
host's local chips part of one global device set, and the same ``Mesh``-based code in
``tpuhar.parallel.mesh`` then spans hosts — data-parallel gradients ride ICI within a
slice and DCN across slices, with no further code changes (SPMD global-view semantics).

Parity does not require multi-host (the reference can't do it); this makes it free.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-process mode if applicable; returns True when active.

    No-ops (returns False) in single-process settings so the same entry point works
    everywhere.  Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``) and to
    auto-detection on TPU pods where the runtime provides them.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    if coordinator_address is None and num_processes is None:
        # On TPU pods jax.distributed.initialize() can auto-detect; only attempt when
        # the runtime looks multi-host.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in ("", "localhost"):
            return False
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded batch (host data feeding)."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
