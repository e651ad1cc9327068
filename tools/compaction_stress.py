#!/usr/bin/env python
"""Prove the compaction ladder's TOP tiers on real hardware (dev tool).

Round-2 review flagged that only the 16384 tier was known to run on the
v5e (the 262144/1048576 tiers and the dense escape hatch were CPU-tested
only) and that the unchunked top tier risked a 512 MB/job transient. This
tool drives, ON THE REAL CHIP:

1. a dense-output (un-sparsified appliers) transfer whose ~0.5M-note roll
   escalates the ladder past 262144 to the 1048576 tier;
2. the same job with a starved block-routing table, forcing the
   density-independent dense-compaction escape hatch at the top tier;

and writes artifacts/compaction_stress_r03.json with the observed tiers,
counts and wall times. Run: python tools/compaction_stress.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EX = "/root/reference/examples/style transfer - midi"
COMP = f"{_EX}/Sweet Dreams/original/Sweet Dreams.mid"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "compaction_stress_r03.json")


def main():
    import jax

    import mst_tpu.transfer as tr
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.ops.events import read_midi
    from mst_tpu.transfer import (ModelBundle, apply_style, demo_params,
                                  extract_style, get_model_input)

    model = StyleTransferModel()
    params = demo_params(model)
    # UN-sparsify: every raster cell becomes a note, so a long song's output
    # exceeds the 262144 tier (the bench path never leaves 16384)
    for name in ("pitched_style_applier", "unpitched_style_applier"):
        layer = params["params"][name]["linear"]
        layer["bias"] = layer["bias"].at[1].set(5.0)
    bundle = ModelBundle(model=model, params=params)

    _, song = get_model_input(COMP)
    style_vec, melody, rhythm, n_bars = extract_style(bundle, song)
    print(f"song: {n_bars} bars, {song.n_channels} channels", flush=True)

    results = {"device": str(jax.devices()[0])}

    def run(tag, bundle, n_instruments):
        t0 = time.perf_counter()
        apply_style(bundle, song.info, style_vec, melody, rhythm,
                    n_instruments, f"/tmp/compaction_stress/{tag}.mid",
                    n_bars=n_bars)
        wall = time.perf_counter() - t0
        results[tag] = {
            "capacity_tier_fit": bundle.capacity_hint,
            "wall_sec": round(wall, 2),
            "out_bytes": os.path.getsize(f"/tmp/compaction_stress/{tag}.mid"),
        }
        print(f"{tag}: tier_fit={bundle.capacity_hint} wall={wall:.1f}s",
              flush=True)

    # 1) ladder escalation to the 1048576 tier (3+ picked channels of a
    #    ~117-bar dense roll = ~786k pitched records)
    run("top_tier", bundle, n_instruments=3)
    assert bundle.capacity_hint == 1048576, bundle.capacity_hint

    # 2) dense escape hatch at the top tier: starve the block routing table
    #    so live blocks overflow while records fit
    orig = tr._block_capacities
    tr._block_capacities = lambda c: (1, 1)
    try:
        starved = ModelBundle(model=model, params=params)
        run("dense_hatch", starved, n_instruments=3)
    finally:
        tr._block_capacities = orig
    # both paths decode identical notes
    a = open("/tmp/compaction_stress/top_tier.mid", "rb").read()
    b = open("/tmp/compaction_stress/dense_hatch.mid", "rb").read()
    results["hatch_output_identical"] = a == b
    assert a == b

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
