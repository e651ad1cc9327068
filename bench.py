#!/usr/bin/env python
"""Headline benchmark: full-song MIDI -> styled-MIDI throughput on one chip,
plus training-step throughput.

Line 1 measures the complete style-transfer path of BASELINE.json's north
star over a BATCH of bundled compositions styled against one style song:
MIDI ingestion (parse -> scale detection -> quantization), batched on-device
rasterization + latent extraction, batched song-info prediction + style
application + packed compaction (one fused device program per shape group),
and per-song .mid decode/synthesis. Steady-state timing (the first run pays
jit compiles and is excluded); the unit is one full composition->styled-song
pipeline.

Line 2 measures unamortized single-request latency (transfer_style on ONE
composition) — the north star's '<1 s per full song' is a latency target,
so the batch-amortized line 1 alone would overstate it.

Line 3 measures the jitted train step (forward + backward + accumulate +
Adam, runtime/train.py) at the standard (8-channel, 128-bar) shape bucket
with the device-rasterized data path, including the per-step loss fetch the
real training loop pays.

Params come from the committed trained snapshot (snapshots/, the round-2
5000-iteration campaign) so output density is a trained model's; without a
snapshot the appliers' velocity bias is sparsified to approximate it.

The reference publishes no throughput numbers (BASELINE.md); baselines are
the north-star target of 1 song/sec (<1 s per song, BASELINE.json) and a
reference-scale campaign (5000 iterations) in under 10 minutes on one chip
(8.33 steps/sec).

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import statistics
import sys
import time


def spread(per_run_values):
    """Dispersion of the per-run samples behind a metric, in the metric's own
    unit. The headline `value` stays best-of-N (the transport to the
    remote-attached chip has high one-sided variance, so the min-time run is
    the standard robust estimator), and this records how far the other runs
    landed from it — a regression is only real if it clears this spread
    (VERDICT r03: point estimates made a 14% move unattributable)."""
    vals = sorted(float(v) for v in per_run_values)
    return {"median": round(statistics.median(vals), 4),
            "min": round(vals[0], 4), "max": round(vals[-1], 4),
            "n": len(vals)}

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
SNAPSHOTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "snapshots")
# NOTE: the reference publishes NO performance numbers (BASELINE.md), so
# these baselines are self-chosen north-star targets, not reference
# measurements; vs_baseline reads "x times the target", not "x times the
# reference". Each JSON line carries baseline="north-star-target" to say so.
TARGET_SONGS_PER_SEC = 1.0        # north star: <1 s per full song
TARGET_TRAIN_STEPS_PER_SEC = 8.33  # 5000-iteration campaign in <10 min


def train_config():
    """The benched training configuration: storage_dtype="bfloat16".

    The committed v5e profile shows the device step HBM-bound on fp32
    activation traffic; bf16 activation storage halves those bytes and was
    measured 1.16x faster at K=16 (87 vs 75 steps/sec) with the loss
    trajectory tracking fp32 (tests/test_precision.py + the campaign-level
    A/B in README "Measured behavior"). Params/grads/optimizer state/loss
    reductions stay float32; the transfer metrics above are untouched
    (ModelBundle never reads storage_dtype)."""
    import dataclasses

    from mst_tpu.config import Config

    config = Config()
    return dataclasses.replace(config, model=dataclasses.replace(
        config.model, storage_dtype="bfloat16"))


def load_bundle():
    import jax
    import jax.numpy as jnp
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.checkpoint import load_trained_params
    from mst_tpu.transfer import ModelBundle, sparsify_velocity_bias

    model = StyleTransferModel()
    params, step = load_trained_params(model, SNAPSHOTS)
    if params is None:
        # initialize on the host CPU backend: un-jitted init dispatches
        # hundreds of tiny ops, pathological over a remote-TPU transport
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.array([[1.0, 0.0]]),
                jnp.array([120.0]), jnp.zeros((1, 1, 4, 4, 10, 56, 5)),
                jnp.zeros((1, 1, 51)).at[0, 0, 0].set(1.0),
                jnp.zeros((1, 1, 4, 4, 10, 47, 2)))
            params = sparsify_velocity_bias(dict(params))
    params = jax.device_put(params, jax.devices()[0])
    return ModelBundle(model=model, params=dict(params))


def bench_transfer(bundle):
    from mst_tpu.transfer import transfer_styles

    def run(out_dir):
        return transfer_styles(bundle, COMPOSITIONS, [STYLE], out_dir)

    for i in range(3):  # jit compiles on run 1; tunnel/page caches keep
        run(f"/tmp/bench_warmup_{i}")  # warming for 2-3 full requests

    # best-of-N: the transport to a remote/attached chip has high run-to-run
    # variance; the minimum is the standard robust estimator. Device
    # dispatches are logged so the device-side matmul FLOPs per song can be
    # accounted (replay_log_flops traces the same programs abstractly).
    bundle.call_log = []
    times = []
    n_runs = 8
    for i in range(n_runs):
        t0 = time.perf_counter()
        run(f"/tmp/bench_run_{i}")
        times.append(time.perf_counter() - t0)
    per_song = min(times) / len(COMPOSITIONS)

    from mst_tpu.runtime.flops import replay_log_flops
    flops_per_song = replay_log_flops(bundle._raw, bundle.call_log) \
        / n_runs / len(COMPOSITIONS)
    bundle.call_log = None
    rates = [len(COMPOSITIONS) / t for t in times]
    return 1.0 / per_song, per_song, flops_per_song, spread(rates)


def bench_ingestion(n_songs=64):
    """Host ingestion throughput: full parse -> event pairing -> scale
    detection -> quantize/rasterize (get_model_input) in songs/sec — the one
    pipeline stage with no device involvement. Songs come from the committed
    corpus generator (deterministic seed) so the sample is corpus-like and
    self-contained; ingestion uses the same thread pool as transfer_styles."""
    import glob
    import shutil
    import subprocess
    import sys as _sys

    from mst_tpu.transfer import get_model_input, ingest_map

    out = "/tmp/bench_ingest_corpus"
    shutil.rmtree(out, ignore_errors=True)
    subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tools", "make_corpus.py"),
         "--out", out, "--n", str(n_songs), "--seed", "12345"],
        check=True, capture_output=True)
    files = sorted(glob.glob(os.path.join(out, "*.mid")))
    ingest_map(get_model_input, files[:8])  # warmup (imports, page caches)
    cold_rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        songs = ingest_map(get_model_input, files)  # transfer's ingest path
        cold_rates.append(len(files) / (time.perf_counter() - t0))
        assert all(s is not None for s in songs)

    # steady-state epochs on the TRAIN pipeline: with the cross-epoch
    # SongCache (data/cache.py) every epoch after the first replays slim
    # Songs from host RAM — the reference re-parses each file each epoch
    # (style/data.py:34-48), so its warm rate equals its cold rate
    import numpy as np
    from mst_tpu.data.cache import SongCache
    from mst_tpu.data.pipeline import iter_inputs

    cache = SongCache()
    # epoch 1 (fill) via a NON-looped pass: it terminates even if every file
    # is bad/filtered, and counts exactly the good songs — a looped iterator
    # here could spill into warm replays (or block forever on an all-bad
    # corpus) when files filter out
    n_good = sum(1 for _ in iter_inputs(files, cache=cache))
    if n_good == 0:
        raise RuntimeError("bench ingestion corpus yielded no usable songs")
    it = iter_inputs(files, shuffle=True, looped=True,
                     rng=np.random.default_rng(0), cache=cache)
    warm_rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2 * n_good):  # two pure-warm epochs per block
            next(it)
        warm_rates.append(2 * n_good / (time.perf_counter() - t0))
    return (max(cold_rates), spread(cold_rates),
            max(warm_rates), spread(warm_rates))


def bench_single_song(bundle):
    """Unamortized single-request latency: ONE composition, one style, via the
    same public path (transfer_style, B=1) — the north star's '<1 s per full
    song' is a latency target, and batch-amortized throughput alone would
    overstate it."""
    from mst_tpu.transfer import transfer_style

    def run(out_dir):
        return transfer_style(bundle, COMPOSITIONS[0], [STYLE], out_dir)

    for i in range(2):  # pays the B=1 shape-group compiles, warms caches
        run(f"/tmp/bench_single_warmup_{i}")
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        run(f"/tmp/bench_single_{i}")
        times.append(time.perf_counter() - t0)
    return min(times), spread(times)


def bench_train_step(bundle):
    import jax
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi
    from mst_tpu.runtime.train import (
        create_train_state, device_batch_from_song, make_train_step)

    config = train_config()
    channels, info = read_midi(load_midi_from_file(COMPOSITIONS[0]))
    song = get_input(channels, info)
    batch = device_batch_from_song(song, 8, 128,
                                   bar_cap=800 // song.n_channels,
                                   raster_dtype=config.model.storage_dtype)
    state = create_train_state(bundle.model, config, batch,
                               jax.random.PRNGKey(0))
    step = make_train_step(bundle.model, config,
                           has_unpitched=batch.unpitched is not None)
    for _ in range(5):  # compile + warmup
        state, _ = step(state, batch)
    # best-of-blocks: per-dispatch rate rides the tunnel round-trip, which
    # drifts run to run; the best 10-step block is the robust steady state
    block_rates = []
    for _ in range(4):
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = step(state, batch)
        block_rates.append(n / (time.perf_counter() - t0))
    steps_per_sec = max(block_rates)

    # analytic matmul FLOPs of the whole step (fwd + bwd + Adam), traced
    # from the exact program benched above (runtime.flops walks the jaxpr)
    from mst_tpu.runtime.flops import count_matmul_flops
    raw_step = make_train_step(bundle.model, config,
                               has_unpitched=batch.unpitched is not None,
                               fetch_losses=False)
    flops_per_step = count_matmul_flops(raw_step, state, batch)
    return (steps_per_sec, flops_per_step, config.model.compute_dtype,
            spread(block_rates))


def bench_train_scan(bundle, k: int = 8, b: int = 1):
    """Sustained training throughput with K steps per dispatch
    (runtime.train.make_multi_train_step): one jit call + one stacked-loss
    fetch per K steps. On the remote-attached chip the per-dispatch
    transport round-trip (~30-40 ms) dwarfs the ~12 ms of device compute, so
    this is the train loop's real steady-state configuration
    (train-model.py --steps-per-dispatch).

    ``b``: songs per scanned step (train-model.py --batch). b=1 matches the
    reference's regime (one song per step); b=8 is the production regime of
    the committed batch campaign (training_batch8.csv) — each scan step
    consumes a whole batch, so the stacked input carries k*b songs and
    steps/sec counts batch-steps. Returns (steps_per_sec, spread,
    flops_per_step) with FLOPs traced from the exact benched program."""
    import jax
    import numpy as np
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi
    from mst_tpu.runtime.train import (
        create_train_state, device_batch_from_songs, make_multi_train_step)

    config = train_config()
    channels, info = read_midi(load_midi_from_file(COMPOSITIONS[0]))
    song = get_input(channels, info)
    cap = min(800 // song.n_channels, 128)
    kbatch = device_batch_from_songs(
        [song] * (k * b), 8, 128, bar_cap=[cap] * (k * b),
        raster_dtype=config.model.storage_dtype)
    state = create_train_state(bundle.model, config, kbatch,
                               jax.random.PRNGKey(0))
    multi = make_multi_train_step(
        bundle.model, config, has_unpitched=kbatch.unpitched is not None, k=k)
    for _ in range(2):  # compile + warmup
        state, vec = multi(state, kbatch)
    np.asarray(vec)
    block_rates = []
    for _ in range(3):  # best-of-blocks (tunnel round-trip drifts)
        n = 5
        pending = None
        t0 = time.perf_counter()
        for _ in range(n):
            state, vec = multi(state, kbatch)
            # the real loop's loss fetch is DEFERRED one dispatch
            # (train-model.py records the previous dispatch's losses after
            # enqueuing the next), so the ~25 ms tunnel round-trip overlaps
            # this dispatch's device compute instead of serializing with it
            if pending is not None:
                np.asarray(pending)
            pending = vec
        np.asarray(pending)
        block_rates.append((n * k) / (time.perf_counter() - t0))

    # analytic matmul FLOPs of one scanned step (fwd + bwd + Adam) at this
    # batch size, traced from the same step function the scan runs
    from mst_tpu.runtime.flops import count_matmul_flops
    from mst_tpu.runtime.train import make_train_step
    bbatch = device_batch_from_songs(
        [song] * b, 8, 128, bar_cap=[cap] * b,
        raster_dtype=config.model.storage_dtype)
    raw_step = make_train_step(bundle.model, config,
                               has_unpitched=bbatch.unpitched is not None,
                               fetch_losses=False)
    flops_per_step = count_matmul_flops(raw_step, state, bbatch)
    return max(block_rates), spread(block_rates), flops_per_step


def main():
    # metric order note: the driver records the tail of this output and
    # parses the LAST line as the round's headline, so lines run from
    # supporting accounting to the north-star metric (full-pipeline
    # songs/sec/chip) last
    from mst_tpu.runtime.flops import mfu

    bundle = load_bundle()

    (songs_per_sec, sec_per_song, t_flops_per_song,
     transfer_spread) = bench_transfer(bundle)
    single_latency, single_spread = bench_single_song(bundle)
    (ingest_songs_per_sec, ingest_spread,
     warm_replay_per_sec, warm_spread) = bench_ingestion()
    steps_per_sec, flops_per_step, dtype, step_spread = \
        bench_train_step(bundle)
    # K ladder on the v5e (same bucket, best-of-3 blocks): K=8 ~90, K=16
    # 106.0, K=32 109.1 steps/sec with non-overlapping spreads — the
    # round-trip is nearly amortized by K=16, K=32 buys the last ~3% and
    # still fits HBM at this (8-channel, 128-bar) bucket
    scan_k = 32
    scan_steps_per_sec, scan_spread, _ = bench_train_scan(bundle, k=scan_k)
    # the production regime: batch-8 steps (training_batch8.csv) under the
    # K-scan; K=4 keeps the stacked 32-song input comfortably in HBM while
    # the ~0.5 s of device compute per dispatch already amortizes the
    # round-trip
    b8_k, b8_b = 4, 8
    (b8_steps_per_sec, b8_spread,
     b8_flops_per_step) = bench_train_scan(bundle, k=b8_k, b=b8_b)

    print(json.dumps({
        "metric": "host_ingestion",
        "value": round(ingest_songs_per_sec, 4),
        "unit": "songs/sec",
        "spread": ingest_spread,
        # anchored to the transfer north star: ingestion must never be the
        # <1 s/song pipeline's bottleneck
        "vs_baseline": round(ingest_songs_per_sec / TARGET_SONGS_PER_SEC, 4),
        "baseline": "north-star-target",
    }))

    # steady-state training epochs replay slim Songs from the cross-epoch
    # cache (data/cache.py); vs_baseline is vs COLD ingestion — the
    # reference's warm rate, since it re-parses every file every epoch
    print(json.dumps({
        "metric": "cached_epoch_replay",
        "value": round(warm_replay_per_sec, 1),
        "unit": "songs/sec",
        "spread": warm_spread,
        "vs_baseline": round(warm_replay_per_sec / ingest_songs_per_sec, 1),
        "baseline": "cold-ingestion (reference re-parses every epoch)",
    }))

    # device-side matmul FLOPs the batched transfer executes per song, and
    # the utilization its wall-clock implies — honest accounting: the
    # pipeline is transport/host-bound, not MXU-bound (see README), so this
    # fraction is structurally small for this model family
    t_dtype = bundle.model.config.compute_dtype
    print(json.dumps({
        "metric": "transfer_device_mfu",
        "value": round(mfu(t_flops_per_song, sec_per_song, t_dtype), 6),
        "unit": "fraction_of_peak",
        "flops_per_song": round(t_flops_per_song),
        "compute_dtype": t_dtype,
        "vs_baseline": round(mfu(t_flops_per_song, sec_per_song, t_dtype), 6),
        "baseline": "chip-peak",
    }))

    # utilization at the sustained (K-steps-per-dispatch) training rate —
    # the per-step-dispatch rate below is transport-bound, not a chip number
    best = max(steps_per_sec, scan_steps_per_sec)
    print(json.dumps({
        "metric": "train_step_mfu",
        "value": round(mfu(flops_per_step, 1.0 / best, dtype), 6),
        "unit": "fraction_of_peak",
        "flops_per_step": round(flops_per_step),
        "compute_dtype": dtype,
        "storage_dtype": "bfloat16",
        "vs_baseline": round(mfu(flops_per_step, 1.0 / best, dtype), 6),
        "baseline": "chip-peak",
    }))

    print(json.dumps({
        "metric": "train_step",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec/chip",
        "spread": step_spread,
        "storage_dtype": "bfloat16",
        "vs_baseline": round(steps_per_sec / TARGET_TRAIN_STEPS_PER_SEC, 4),
        "baseline": "north-star-target",
    }))
    print(json.dumps({
        "metric": "train_step_scan",
        "value": round(scan_steps_per_sec, 4),
        "unit": "steps/sec/chip",
        "spread": scan_spread,
        "steps_per_dispatch": scan_k,
        "storage_dtype": "bfloat16",
        "vs_baseline": round(scan_steps_per_sec / TARGET_TRAIN_STEPS_PER_SEC,
                             4),
        "baseline": "north-star-target",
    }))

    # the production training regime (batch 8, K-scan): steps here are
    # batch-steps, so songs/sec = value * 8; vs_baseline stays anchored to
    # the north-star steps/sec target for comparability with train_step_scan
    print(json.dumps({
        "metric": "train_step_scan_batch8",
        "value": round(b8_steps_per_sec, 4),
        "unit": "steps/sec/chip",
        "spread": b8_spread,
        "steps_per_dispatch": b8_k,
        "batch_size": b8_b,
        "songs_per_sec": round(b8_steps_per_sec * b8_b, 2),
        "mfu": round(mfu(b8_flops_per_step, 1.0 / b8_steps_per_sec, dtype),
                     6),
        "storage_dtype": "bfloat16",
        "vs_baseline": round(b8_steps_per_sec / TARGET_TRAIN_STEPS_PER_SEC,
                             4),
        "baseline": "north-star-target",
    }))

    print(json.dumps({
        "metric": "single_song_transfer_latency",
        "value": round(single_latency, 4),
        "unit": "sec/song",
        "spread": single_spread,
        # north star: <1 s per full song — vs_baseline > 1 means faster
        "vs_baseline": round(1.0 / (single_latency *
                                    TARGET_SONGS_PER_SEC), 4),
        "baseline": "north-star-target",
    }))
    print(json.dumps({
        "metric": "midi_to_styled_midi_full_pipeline",
        "value": round(songs_per_sec, 4),
        "unit": "songs/sec/chip",
        "spread": transfer_spread,
        "vs_baseline": round(songs_per_sec / TARGET_SONGS_PER_SEC, 4),
        "baseline": "north-star-target",
    }))


if __name__ == "__main__":
    sys.exit(main())
