#!/usr/bin/env python
"""Device-time decomposition of the batched transfer path via jax.profiler.

Warms the full transfer_styles request (3 runs), then traces N repeat runs
and prints the per-op/per-component device-time summary through
tools/parse_profile.py's machinery. Device durations come from the trace, so
the numbers are valid even if the host is otherwise busy. Run on the real
TPU (no args); writes the trace under /tmp/mst_profile_transfer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EX = "/root/reference/examples/style transfer - midi"
COMPOSITIONS = [
    f"{_EX}/Sweet Dreams/original/Sweet Dreams.mid",
    f"{_EX}/Orient Express/original/Orient Express.mid",
    f"{_EX}/My Way/original/My Way (live).3.mid",
    f"{_EX}/It Must Have Been Love/original/It Must Have Been Love (live studio).1.mid",
    f"{_EX}/Sweet Dreams/original/Beat It.4.mid",
    f"{_EX}/Sweet Dreams/original/Equinox Part 4.mid",
]
STYLE = f"{_EX}/My Way/original/Angie.4.mid"


def main():
    import jax

    import bench
    from mst_tpu.transfer import transfer_styles

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mst_profile_transfer"
    n_traced = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    bundle = bench.load_bundle()
    for i in range(3):
        transfer_styles(bundle, COMPOSITIONS, [STYLE], f"/tmp/ptd_warm_{i}")

    jax.profiler.start_trace(out)
    for i in range(n_traced):
        transfer_styles(bundle, COMPOSITIONS, [STYLE], f"/tmp/ptd_run_{i}")
    jax.profiler.stop_trace()

    n_songs = n_traced * len(COMPOSITIONS)
    print(f"trace: {out}  ({n_traced} requests, {n_songs} songs)")
    import json

    from tools.parse_profile import summarize
    print(json.dumps(summarize(out, n_songs), indent=1))


if __name__ == "__main__":
    main()
