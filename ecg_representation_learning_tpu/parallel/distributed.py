"""Multi-host / multi-slice initialization.

Single-controller JAX: every host runs the same program;
``jax.distributed.initialize`` wires the DCN mesh between slices, after which
the same ('data','model') mesh rules from :mod:`.mesh` apply across all
processes (collectives ride ICI within a slice, DCN between slices).  The
reference has no distributed anything (SURVEY.md §2.3); this is the new
first-class entry point.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-process JAX when launched across hosts.

    No-ops for single-process runs (the common case here).  Arguments default
    to the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) or the TPU metadata auto-detection built into
    ``jax.distributed.initialize``.
    Returns a summary dict {process_id, num_processes, local_devices, devices}.
    """
    coordinator_address = coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')
    num_processes = num_processes or _int_env('JAX_NUM_PROCESSES')
    process_id = process_id if process_id is not None else _int_env('JAX_PROCESS_ID')
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        'process_id': jax.process_index(),
        'num_processes': jax.process_count(),
        'local_devices': len(jax.local_devices()),
        'devices': len(jax.devices()),
    }


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this process should feed (host-side input
    sharding: each process loads only its shard, per-process contiguous)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
