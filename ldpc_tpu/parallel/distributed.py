"""Multi-host runtime initialization.

The reference is single-process (no MPI/NCCL/Gloo — SURVEY.md §2). The
TPU-native framework targets multi-host pod slices: call
:func:`initialize_distributed` once per host process before any JAX call;
collectives then ride ICI within a slice and DCN across slices.

For CPU-only simulation of a multi-process setup, run N processes with
``JAX_PLATFORMS=cpu`` and pass explicit coordinator/num_processes/process_id.
"""
from __future__ import annotations

import os

import jax

__all__ = ["initialize_distributed", "is_multi_host", "process_index",
           "process_count"]


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process.

    With no arguments, relies on the TPU environment's automatic discovery
    (GKE/TPU VMs set the cluster env vars); explicit arguments support the
    CPU simulation path. Safe to call when single-process: if no cluster
    configuration is present or discoverable, it is a no-op.
    """
    if num_processes is not None and num_processes <= 1:
        return
    explicit = coordinator_address is not None
    auto = any(v in os.environ for v in
               ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"))
    if not (explicit or auto):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multi_host() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()
