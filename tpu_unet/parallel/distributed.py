"""Multi-host runtime initialization (SURVEY.md §5.8).

The reference has no distributed runtime at all; the TPU-native equivalent of
the NCCL/MPI role is ``jax.distributed`` + XLA collectives: within a slice,
collectives ride ICI; across hosts/slices, DCN. This wrapper standardizes
boot for multi-host pods:

* on Cloud TPU pods, ``jax.distributed.initialize()`` auto-discovers the
  coordinator from the TPU metadata — call with no arguments;
* elsewhere, pass coordinator address + process count/id explicitly (or via
  the standard env vars).

After initialization, ``jax.devices()`` spans the pod and
``parallel.mesh.make_mesh`` builds global meshes; everything else in this
framework (DP train step, halo inference, sharded tile forward) is written
against global meshes and works unchanged multi-host.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the distributed runtime. Returns True if multi-host was
    initialized, False for single-process (no-op) operation.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (matching jax.distributed's own conventions).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") not in (None, "",
                                                                "localhost")
    if coordinator_address is None and not on_tpu_pod:
        return False  # single process
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError) as e:
        if "already initialized" in str(e):
            return True
        raise
