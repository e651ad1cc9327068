#!/usr/bin/env python
"""Decompose WHERE bf16 extraction-storage drift lands in transfer outputs.

VERDICT r4 weak #2 conjectured the 3.96% of moved output cells under
``extract_storage_dtype="bfloat16"`` (artifacts/ab_extract_storage.json) is
a THRESHOLD-crossing problem fixable by computing ``hard_output``'s
0.01/0.1 gates from fp32 values before storage narrowing. This tool tests
that conjecture by classifying every difference between the fp32 and bf16
runs' decoded .mid outputs:

- ``vel_byte_delta_1`` / ``vel_byte_delta_gt1`` — same note, velocity byte
  moved (VALUE drift: int(v*127) re-quantized a shifted float — no gate
  involved, unfixable while anything upstream rounds);
- ``dur_delta_1`` / ``dur_delta_gt1`` — same note, duration ticks moved
  (value drift likewise);
- ``accidental_flip`` — same (channel, onset), note id moved ±1 semitone
  (the 0.1 accidental gate flipped);
- ``presence_flip`` — note exists in exactly one run (the 0.01 velocity
  gate flipped).

If gate flips dominate, the verdict's reformulation wins the bf16 speedup
back; if byte deltas dominate, the drift is plain value drift — narrowed
storage re-quantizes to different WIRE bytes and no gate reformulation can
make it bit-exact (the negative result, committed with these numbers).

Run on the real TPU: python tools/bf16_drift_decomposition.py
Writes artifacts/bf16_drift_decomposition.json.
"""

import collections
import json
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


def notes_of(path):
    """Decoded .mid -> {(channel, onset_tick, note): (vel, dur_ticks)}."""
    import numpy as np
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.io.smf import EV_NOTE_OFF, EV_NOTE_ON
    mid = load_midi_from_file(path)
    out = {}
    pending = {}
    for track in mid.tracks:
        t = np.cumsum(track.delta)
        for i in range(len(track)):
            typ = int(track.type[i])
            if typ == EV_NOTE_ON and track.b[i] > 0:
                key = (int(track.channel[i]), int(track.a[i]))
                pending.setdefault(key, []).append((int(t[i]),
                                                    int(track.b[i])))
            elif typ in (EV_NOTE_OFF, EV_NOTE_ON):
                key = (int(track.channel[i]), int(track.a[i]))
                if pending.get(key):
                    on_t, vel = pending[key].pop(0)
                    out[(key[0], on_t, key[1])] = (vel, int(t[i]) - on_t)
    return out


def classify(a, b):
    c = collections.Counter()
    c["notes_fp32"] = len(a)
    c["notes_bf16"] = len(b)
    only_a = set(a) - set(b)
    only_b = set(b) - set(a)
    for k in set(a) & set(b):
        (va, da), (vb, db) = a[k], b[k]
        if va != vb:
            c["vel_byte_delta_1" if abs(va - vb) == 1
              else "vel_byte_delta_gt1"] += 1
        if da != db:
            c["dur_delta_1" if abs(da - db) == 1 else "dur_delta_gt1"] += 1
    # accidental flips: unmatched note whose (channel, onset) partner exists
    # a semitone away in the other run
    def acc_match(src, dst_map, dst_only):
        hits = 0
        for (ch, t, n) in list(src):
            for dn in (n - 1, n + 1):
                if (ch, t, dn) in dst_only:
                    dst_only.discard((ch, t, dn))
                    src.discard((ch, t, n))
                    hits += 1
                    break
        return hits
    c["accidental_flip"] = acc_match(only_a, b, only_b)
    c["presence_flip"] = len(only_a) + len(only_b)
    return c


def main():
    import jax  # noqa: F401  (axon platform init)

    from mst_tpu.transfer import transfer_styles
    import bench

    totals = collections.Counter()
    per_file = {}
    out_a, out_b = "/tmp/drift_fp32", "/tmp/drift_bf16"
    for storage, out in ((None, out_a), ("bfloat16", out_b)):
        bundle = bench.load_bundle()
        bundle.extract_storage_dtype = storage
        for i in range(2):  # warm compiles; timing is not the point here
            transfer_styles(bundle, COMPOSITIONS, [STYLE],
                            out if i else out + "_warm")

    for root, _, files in os.walk(out_a):
        for f in sorted(files):
            if not f.endswith(".mid") or "/original" in root:
                continue
            pa = os.path.join(root, f)
            pb = pa.replace(out_a, out_b)
            if not os.path.exists(pb):
                continue
            cls = classify(notes_of(pa), notes_of(pb))
            per_file[f] = dict(cls)
            totals.update(cls)

    n = max(totals["notes_fp32"], 1)
    moved = {k: v for k, v in totals.items() if not k.startswith("notes")}
    result = {
        "totals": dict(totals),
        "moved_fraction_of_notes": {k: round(v / n, 5)
                                    for k, v in moved.items()},
        "gate_flips": totals["accidental_flip"] + totals["presence_flip"],
        "value_drifts": (totals["vel_byte_delta_1"]
                         + totals["vel_byte_delta_gt1"]
                         + totals["dur_delta_1"] + totals["dur_delta_gt1"]),
        "per_file": per_file,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/bf16_drift_decomposition.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("totals", "gate_flips", "value_drifts")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
