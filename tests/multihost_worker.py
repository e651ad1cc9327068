"""Worker for the REAL 2-process multihost test (tests/test_multihost.py).

Run as: python multihost_worker.py <coordinator_addr> <process_id>
Forces the CPU backend, joins a 2-process jax.distributed cluster through
mst_tpu's own wrapper, runs one cross-process psum and prints a JSON line.
"""

import json
import os
import sys


def main():
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax
    # the container pins jax_platforms="axon,cpu"; force CPU before any use
    jax.config.update("jax_platforms", "cpu")

    from mst_tpu.parallel.multihost import (
        initialize_multihost, shard_files_for_host)

    active = initialize_multihost(coordinator_address=coordinator,
                                  num_processes=2, process_id=process_id)
    assert active, "initialize_multihost reported single-host"
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    n_local = jax.local_device_count()
    # distinct values per (process, device) so the psum proves cross-process
    # reduction, not a local one
    x = np.arange(n_local, dtype=np.float32) + 100.0 * process_id
    total = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)

    files = [f"song{i}.mid" for i in range(7)]
    mine = shard_files_for_host(files)  # un-mocked: real process_index/count

    print(json.dumps({
        "process_id": process_id,
        "process_count": jax.process_count(),
        "n_local_devices": n_local,
        "n_global_devices": jax.device_count(),
        "psum": float(np.asarray(total)[0]),
        "shard": mine,
    }), flush=True)


if __name__ == "__main__":
    main()
