"""Multi-host (pod) initialization and per-host data sharding.

The reference is single-process/single-device (SURVEY.md §2.4). On a TPU pod
each host runs this same program; ``initialize_multihost`` wires up DCN
coordination, after which ``jax.devices()`` spans the slice and the mesh/pjit
code in :mod:`mst_tpu.parallel.mesh` compiles unchanged with gradient psums
riding ICI inside the slice.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Call jax.distributed.initialize when running under a multi-host
    launcher (args or the standard env vars); no-op single-host. Returns
    whether multi-host mode is active."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def shard_files_for_host(files: Sequence, process_index: Optional[int] = None,
                         process_count: Optional[int] = None):
    """Deterministic per-host slice of the corpus file list (each host feeds
    its local devices; the batch axis is globally sharded over ``data``)."""
    index = jax.process_index() if process_index is None else process_index
    count = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(files) if i % count == index]
