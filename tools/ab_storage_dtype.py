"""A/B the K=16 scan train step on the real chip: fp32 vs bf16 storage.

Backs the README "Measured behavior" bf16-storage numbers and bench.py's
train_config() choice: compiles the same K-step scan dispatch under
storage_dtype float32 and bfloat16, reports sustained steps/sec and the
worst per-component loss delta after 32 steps. Run ad hoc on the real chip
(~5 min including both compiles).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mst_tpu.config import Config, ModelConfig
from mst_tpu.data.pipeline import get_input
from mst_tpu.io import load_midi_from_file
from mst_tpu.models import StyleTransferModel
from mst_tpu.ops.events import read_midi
from mst_tpu.runtime.train import (create_train_state,
                                   device_batch_from_songs,
                                   make_multi_train_step)

_EX = "/root/reference/examples/style transfer - midi"
COMP = f"{_EX}/Sweet Dreams/original/Sweet Dreams.mid"
K = 16

channels, info = read_midi(load_midi_from_file(COMP))
song = get_input(channels, info)
cap = min(800 // song.n_channels, 128)
kbatch = device_batch_from_songs([song] * K, 8, 128, bar_cap=[cap] * K)

results = {}
for sd in ("float32", "bfloat16"):
    config = Config(model=ModelConfig(storage_dtype=sd))
    model = StyleTransferModel(config=config.model)
    state = create_train_state(model, config, kbatch, jax.random.PRNGKey(0))
    multi = make_multi_train_step(
        model, config, has_unpitched=kbatch.unpitched is not None, k=K)
    t0 = time.perf_counter()
    for _ in range(2):
        state, vec = multi(state, kbatch)
    v0 = np.asarray(vec)
    print(f"{sd}: compiled+warm in {time.perf_counter()-t0:.1f}s; "
          f"last-step losses total={v0[-1][0]:.4f} "
          f"pitched_notes={v0[-1][3]:.4f}", flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, vec = multi(state, kbatch)
        np.asarray(vec)
    rate = (n * K) / (time.perf_counter() - t0)
    results[sd] = (rate, v0[-1])
    print(f"{sd}: {rate:.1f} steps/sec sustained (K={K})", flush=True)

f32, bf16 = results["float32"][1], results["bfloat16"][1]
print("max |loss delta| over the 15 components:",
      float(np.nanmax(np.abs(f32 - bf16))))
print(f"speedup: {results['bfloat16'][0] / results['float32'][0]:.3f}x")
