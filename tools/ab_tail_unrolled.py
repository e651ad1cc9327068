#!/usr/bin/env python
"""A/B the applier note-grid tail formulations on the real TPU (dev tool).

Compares device time + HBM bytes (jax.profiler — wall-clock through this
container's tunnel measures enqueue, not device) of:

- ``_tail_jnp``     — checkpointed broadcast contraction (training default);
- ``_tail_plain``   — same without jax.checkpoint (control: proves the
                      checkpoint wrapper is not what materializes the grid);
- ``_tail_unrolled``— per-feature fusions recomputing the leaky grid
                      (the transfer serving default, ModelBundle.tail_mode).

Also asserts the three produce BIT-identical outputs on device. Shapes are
the v5e transfer apply bucket (12 jobs, Cb=8, R=128).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mst_tpu.ops.pallas_grid import _tail_jnp, _tail_plain, _tail_unrolled

    B, C, R, T, F10, O, D, K, P = 12, 8, 128, 4, 10, 8, 7, 8, 5
    rng = np.random.default_rng(0)
    scale = (6.0, 1.0, 1.0, 1.0, 1.0)
    xo = jnp.asarray(rng.normal(size=(B, C, R, T, F10, O, K)).astype(np.float32))
    xd = jnp.asarray(rng.normal(size=(B, C, R, T, F10, D, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, P)).astype(np.float32))
    rest = jnp.asarray(
        rng.normal(size=(B, 1, R, T, F10, O * D, P)).astype(np.float32))

    variants = [("ckpt", _tail_jnp), ("plain", _tail_plain),
                ("unrolled", _tail_unrolled)]
    jitted = [(nm, jax.jit(lambda *a, fn=fn: fn(*a, scale)))
              for nm, fn in variants]
    outs = {}
    for nm, f in jitted:
        outs[nm] = np.asarray(f(xo, xd, w, rest))   # compile + fetch
    for nm in ("plain", "unrolled"):
        same = np.array_equal(outs["ckpt"].view(np.uint32),
                              outs[nm].view(np.uint32))
        print(f"{nm} bit-identical to ckpt: {same}")
        assert same, (nm, np.abs(outs['ckpt'] - outs[nm]).max())

    n_rep = 4
    trace_dir = "/tmp/ab_tail_unrolled_trace"
    jax.profiler.start_trace(trace_dir)
    for nm, f in jitted:
        for _ in range(n_rep):
            np.asarray(f(xo, xd, w, rest))
    jax.profiler.stop_trace()

    import glob
    import gzip
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as fh:
        events = [e for e in json.load(fh)["traceEvents"]
                  if e.get("ph") == "X" and e.get("args", {}).get("hlo_category")]
    events.sort(key=lambda e: e["ts"])
    clusters = [[events[0]]]
    for e in events[1:]:
        if e["ts"] - (clusters[-1][-1]["ts"] + clusters[-1][-1]["dur"]) > 2000:
            clusters.append([e])
        else:
            clusters[-1].append(e)
    names = [nm for nm, _ in jitted for _ in range(n_rep)]
    agg = {}
    for nm, c in zip(names, clusters):
        t = sum(float(e["args"]["device_duration_ps"]) for e in c) / 1e12
        b = sum(float(e["args"].get("raw_bytes_accessed", 0)) for e in c)
        agg.setdefault(nm, []).append((t, b))
    for nm, rows in agg.items():
        t = min(r[0] for r in rows) * 1e3
        b = rows[0][1] / 1e9
        print(f"{nm:10s} device {t:6.2f} ms/call  {b:6.2f} GB/call")


if __name__ == "__main__":
    main()
