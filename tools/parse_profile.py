#!/usr/bin/env python
"""Summarize a jax.profiler trace (the .trace.json.gz) of the train step:
busy time / HBM bytes by model component, top source lines, and the two
headline utilization numbers (matmul FLOP/s vs MXU peak, bytes/s vs HBM
peak). Usage: python tools/parse_profile.py <profile_dir> [steps_in_trace]
[measured_step_seconds]."""

import collections
import glob
import gzip
import json
import re
import sys

V5E_HBM_PEAK = 819e9     # bytes/s
V5E_FP32_PEAK = 98.5e12  # matmul FLOP/s


def load_ops(profile_dir):
    paths = sorted(glob.glob(
        f"{profile_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as fh:
        events = json.load(fh)["traceEvents"]
    return [e for e in events if e.get("ph") == "X" and e.get("args")
            and e["args"].get("hlo_category")]


def component(e):
    tf = e["args"].get("tf_op", "")
    m = re.search(r"(StyleTransferModel\.\w+)/(\w+)?", tf)
    phase = "bwd" if "transpose" in tf else "fwd"
    if m:
        return f"{m.group(1)}/{m.group(2) or ''} [{phase}]"
    return f"other [{phase}]"


def summarize(profile_dir, n_steps, measured_step_s=None):
    ops = load_ops(profile_dir)
    t = sum(float(e["args"]["device_duration_ps"]) for e in ops) / 1e12
    b = sum(float(e["args"].get("raw_bytes_accessed", 0)) for e in ops)
    f = sum(float(e["args"].get("model_flops", 0) or 0) for e in ops)
    step_s = measured_step_s or t / n_steps
    by_comp = collections.defaultdict(lambda: [0.0, 0.0])
    for e in ops:
        c = component(e)
        by_comp[c][0] += float(e["args"]["device_duration_ps"]) / 1e12
        by_comp[c][1] += float(e["args"].get("raw_bytes_accessed", 0))
    by_src = collections.defaultdict(float)
    for e in ops:
        by_src[e["args"].get("source", "?")] += \
            float(e["args"]["device_duration_ps"]) / 1e12
    return {
        "busy_ms_per_step": round(t / n_steps * 1e3, 2),
        "bytes_per_step_gb": round(b / n_steps / 1e9, 2),
        "model_gflops_per_step": round(f / n_steps / 1e9, 2),
        "implied_hbm_gbps": round(b / n_steps / step_s / 1e9),
        "hbm_fraction_of_peak": round(b / n_steps / step_s / V5E_HBM_PEAK, 3),
        "matmul_fraction_of_fp32_peak": round(
            f / n_steps / step_s / V5E_FP32_PEAK, 4),
        "by_component_ms_gb": {
            k: [round(v[0] / n_steps * 1e3, 3), round(v[1] / n_steps / 1e9, 3)]
            for k, v in sorted(by_comp.items(), key=lambda kv: -kv[1][0])},
        "top_source_lines_ms": {
            k: round(v / n_steps * 1e3, 3)
            for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:12]},
    }


def main():
    profile_dir = sys.argv[1]
    n_steps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    step_s = float(sys.argv[3]) if len(sys.argv) > 3 else None
    print(json.dumps(summarize(profile_dir, n_steps, step_s), indent=1))


if __name__ == "__main__":
    main()
