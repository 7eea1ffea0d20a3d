"""Multi-host (multi-pod) bootstrap.

Single-pod meshes need nothing beyond ``build_mesh`` — XLA routes
collectives over ICI. Spanning pods (DCN) requires every host process to
join a ``jax.distributed`` cluster first; this wraps that handshake with
environment-based defaults so SPMD CLI workloads stay launch-tool agnostic
(GKE/JobSet, Cloud TPU VMs, or manual COORDINATOR/NUM_PROCESSES/PROCESS_ID
env vars).

After ``initialize()``, ``jax.devices()`` spans the whole cluster and
``build_mesh`` lays the data axis across it; put slow (DCN) partitions on
the OUTER mesh axis — pure-DP gradient reductions tolerate DCN latency,
tensor-parallel axes should stay inside a pod.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join (or skip) the multi-host cluster. Returns True if distributed.

    No-op when single-process: either no coordinator is configured, or
    num_processes == 1.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get("SSIP_COORDINATOR")
    num_processes = num_processes or int(os.environ.get("SSIP_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        env_pid = os.environ.get("SSIP_PROCESS_ID", "") or ""
        process_id = int(env_pid) if env_pid.strip() else None

    if not coordinator_address or num_processes <= 1:
        if coordinator_address and num_processes <= 1:
            # a coordinator address is explicit distributed intent — don't
            # let a missing SSIP_NUM_PROCESSES silently fork N independent
            # single-host jobs that clobber shared outputs
            LOGGER.warning(
                "SSIP_COORDINATOR is set (%s) but SSIP_NUM_PROCESSES is %s — "
                "running single-process; set SSIP_NUM_PROCESSES to go "
                "distributed.",
                coordinator_address, num_processes or "unset",
            )
        return False

    LOGGER.info(
        "Joining distributed cluster: %s (%d processes, this is %s)",
        coordinator_address, num_processes,
        "auto" if process_id is None else process_id,
    )
    # process_id=None lets jax auto-detect on TPU/GKE launchers
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
