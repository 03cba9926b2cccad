"""Multi-host initialization (SURVEY.md SS2 distributed-backend row).

The reference is single-process/single-GPU; here multi-host runs use JAX's
distributed runtime: every host calls ``init_distributed()`` before any
device use, after which ``jax.devices()`` is the global device list and the
same mesh/sharding code paths (parallel/mesh.py, sweep_sharded.py) run
unchanged — collectives ride ICI within a slice, DCN across slices.

Environment-driven (GKE/TPU-VM conventions): COORDINATOR_ADDRESS,
NUM_PROCESSES, PROCESS_ID — or fully automatic on Cloud TPU (jax infers
from the metadata server).
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed; returns True if multi-host was set up.

    No-ops (returns False) when neither arguments nor environment request a
    multi-process setup — single-host flows never need to care.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "PROCESS_ID"
    )

    if coordinator_address is None and num_processes is None:
        # Cloud TPU pods: jax can auto-discover; only initialize when the
        # environment indicates a pod (avoids touching single-host runs).
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_info():
    """(process_index, process_count) — (0, 1) on single host."""
    import jax

    return jax.process_index(), jax.process_count()
