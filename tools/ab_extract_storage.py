"""A/B the transfer EXTRACTION stage on the real chip: fp32 vs bf16 storage.

VERDICT r03 item 8: the extract stage's grid activations (the on-device
raster + encoder activations) were kept fp32 by design to protect the packed
wire formats. ModelBundle.extract_storage_dtype now narrows ONLY the
extraction stage (the apply stage and its packing always trace at fp32
storage), so this measures whether halving the extraction HBM traffic buys
wall-clock on the batched transfer path, and how far the output files drift.

Run ad hoc on the real chip (~5 min including compiles):
    python tools/ab_extract_storage.py
Writes artifacts/ab_extract_storage.json.
"""
import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from mst_tpu.transfer import transfer_styles

N_RUNS = 6


def run_variant(bundle, tag):
    def run(out_dir):
        return transfer_styles(bundle, bench.COMPOSITIONS, [bench.STYLE],
                               out_dir)

    for i in range(3):
        run(f"/tmp/ab_extract_{tag}_warm{i}")
    times = []
    for i in range(N_RUNS):
        t0 = time.perf_counter()
        run(f"/tmp/ab_extract_{tag}_{i}")
        times.append(time.perf_counter() - t0)
    rate = len(bench.COMPOSITIONS) / min(times)
    print(f"{tag}: {rate:.2f} songs/sec "
          f"(times {[round(t, 2) for t in sorted(times)]})", flush=True)
    return rate, f"/tmp/ab_extract_{tag}_0"


def output_drift(dir_a, dir_b):
    """Fraction of note cells whose packed payloads differ between the two
    variants' decoded outputs (same file set)."""
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi

    diff = total = 0
    files_a = sorted(glob.glob(os.path.join(dir_a, "**", "*.mid"),
                               recursive=True))
    for fa in files_a:
        fb = fa.replace(dir_a, dir_b, 1)
        ca, _ = read_midi(load_midi_from_file(fa))
        cb, _ = read_midi(load_midi_from_file(fb))
        for a, b in zip(ca, cb):
            ma, mb = a["messages"], b["messages"]
            total += max(len(ma.note), 1)
            if len(ma.note) != len(mb.note):
                diff += abs(len(ma.note) - len(mb.note))
            else:
                import numpy as np
                diff += int((ma.note != mb.note).sum()
                            + (ma.time != mb.time).sum())
    return diff / max(total, 1), len(files_a)


def main():
    bundle = bench.load_bundle()
    rate_f32, out_f32 = run_variant(bundle, "fp32")

    bundle_bf16 = dataclasses.replace(
        bundle, extract_storage_dtype="bfloat16",
        _jitted={}, _raw={})
    rate_bf16, out_bf16 = run_variant(bundle_bf16, "bf16")

    drift, n_files = output_drift(out_f32, out_bf16)
    result = {
        "transfer_songs_per_sec_fp32_extract_storage": round(rate_f32, 3),
        "transfer_songs_per_sec_bf16_extract_storage": round(rate_bf16, 3),
        "speedup": round(rate_bf16 / rate_f32, 4),
        "output_drift_fraction": round(drift, 6),
        "n_output_files_compared": n_files,
        "n_runs": N_RUNS,
    }
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "ab_extract_storage.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
