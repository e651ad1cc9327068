#!/usr/bin/env python
"""Train the style-transfer model (entry point, parity: the reference's
root-level train-model.py).

Defaults reproduce the reference run: Lakh clean_midi corpus, 5000 iterations
of one song each, gradient accumulation 2, Adam(0.01) with StepLR(200, 0.9),
EMA progress display, training.csv logging, snapshots every 100 iterations
(train-model.py:33-60,89-160). The reference is a constants-at-top script; a
minimal CLI is added for paths/iteration overrides.
"""

import argparse
import dataclasses
import glob
import os
import time


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default="data/Lakh MIDI Dataset/clean_midi/",
                        help="corpus directory (searched for **/*.mid)")
    parser.add_argument("--iters", type=int, default=5000)
    parser.add_argument("--csv", default="training.csv")
    parser.add_argument("--snapshots", default="snapshots/")
    parser.add_argument("--save-interval", type=int, default=100)
    parser.add_argument("--seed", type=int, default=108)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--exact-shapes", action="store_true",
                        help="train on exact per-song shapes (the reference's "
                             "behavior; recompiles per shape) instead of "
                             "padded shape buckets")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest snapshot if present")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from mst_tpu.config import Config, TrainConfig
    from mst_tpu.data.pipeline import iter_inputs
    from mst_tpu.data.prefetch import prefetch_iterator
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.checkpoint import CheckpointManager
    from mst_tpu.runtime.metrics import CsvLogger, ProgressBar, flatten_losses
    from mst_tpu.runtime.train import (
        batch_from_song, bucket_shape, create_train_state, make_train_step,
        pad_batch)

    config = Config(train=TrainConfig(n_iterations=args.iters, seed=args.seed,
                                      save_interval=args.save_interval))

    print(f"Using {jax.devices()[0].platform}:{jax.devices()[0]}")
    print("Listing data files")
    files = sorted(glob.glob(os.path.join(args.data, "**/*.mid"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no .mid files under {args.data}")
    print(f"{len(files)} files")

    print("Creating model")
    model = StyleTransferModel(config=config.model)
    rng = jax.random.PRNGKey(config.train.seed)

    songs = iter_inputs(files, shuffle=True, looped=True,
                        min_n_messages=config.train.min_n_messages,
                        rng=np.random.default_rng(config.train.seed))
    songs = prefetch_iterator(songs, depth=config.train.prefetch_depth)

    print("Training")
    logger = CsvLogger(args.csv)
    checkpoints = CheckpointManager(args.snapshots)
    pbar = ProgressBar(config.train.n_iterations)
    state = None
    step_fns = {}

    start_iteration = 0
    if args.resume:
        latest = checkpoints.latest_step()
        if latest is not None:
            start_iteration = latest + 1
            print(f"Resuming from snapshot {latest}")

    for iteration in range(start_iteration, config.train.n_iterations):
        filename, song = next(songs)
        # parity: per-song bar cap 800 // n_channels (train-model.py:101)
        max_n_bars = config.train.max_total_bars // song.n_channels
        if args.exact_shapes:
            batch = batch_from_song(song, max_n_bars)
            if batch is None:
                continue
        else:
            if song.pitched.sum() == 0:
                continue
            Cb = bucket_shape(song.n_channels, config.train.channel_buckets)
            Rb = bucket_shape(min(song.n_bars, max_n_bars),
                              config.train.bar_buckets)
            batch = pad_batch([song], Cb, Rb, bar_cap=max_n_bars)
        has_unpitched = batch.unpitched is not None
        if state is None:
            state = create_train_state(model, config, batch, rng)
            if args.resume and start_iteration:
                state = checkpoints.restore(state)

        key = has_unpitched
        if key not in step_fns:
            step_fns[key] = make_train_step(model, config, has_unpitched)
        state, losses = step_fns[key](state, batch)

        values = dict(
            total_loss=float(losses.total),
            pitched_loss=float(losses.pitched_total),
            pitched_notes_loss=float(losses.pitched_notes),
            song_info_loss=float(losses.song_info_total),
            instruments_loss=float(losses.instruments),
            channelss_loss=float(losses.channels_total),
            mode_loss=float(losses.mode),
            bpm_loss=float(losses.bpm),
        )
        if has_unpitched:
            values.update(unpitched_loss=float(losses.unpitched_total),
                          unpitched_notes_loss=float(losses.unpitched_notes))
        assert not np.isnan(values["total_loss"])  # parity: train-model.py:125
        pbar.add(1, **values)
        logger.append(iteration=iteration, **flatten_losses(losses))

        if iteration % config.train.save_interval == 0:
            checkpoints.save(iteration, state)

    pbar.close()
    checkpoints.close()


if __name__ == "__main__":
    main()
