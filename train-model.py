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
import glob
import os


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
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of iterations 10-15")
    parser.add_argument("--batch-size", type=int, default=1,
                        help="songs per step (>1: padded fixed-shape batch, "
                             "data-parallel over all devices; the reference "
                             "trains one song per step)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the forward in backward "
                             "(jax.checkpoint). Note: for this model the "
                             "HBM peak is forward transients, which remat "
                             "cannot shrink (measured) — the batch cell "
                             "budget is the effective memory lever")
    parser.add_argument("--seq-parallel", type=int, default=1,
                        help="shard the bar axis over this many devices "
                             "(pipelined LSTM recurrence; bar bucket must be "
                             "divisible by it)")
    parser.add_argument("--compute-dtype", default=None,
                        choices=("float32", "bfloat16"),
                        help="matmul compute dtype (params/grads stay "
                             "float32; bfloat16 doubles MXU throughput). "
                             "Default: ModelConfig.compute_dtype")
    parser.add_argument("--storage-dtype", default=None,
                        choices=("float32", "bfloat16"),
                        help="activation STORAGE dtype: bfloat16 halves the "
                             "HBM bytes of the grid-scale activation buffers "
                             "— the measured bottleneck of the train step "
                             "(params/grads/optimizer/loss reductions stay "
                             "float32). Default: ModelConfig.storage_dtype")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="scan this many steps inside ONE jitted "
                             "dispatch (amortizes the per-dispatch transport "
                             "round-trip of a remote-attached TPU; consecutive "
                             "same-bucket batches are stacked, others run "
                             "single). Requires no --exact-shapes/mesh")
    parser.add_argument("--bucket-window", type=int, default=0,
                        help="reorder this many consecutive songs so same-"
                             "shape-bucket songs run as FULL K-step scans "
                             "(needs --steps-per-dispatch>1 and batch size "
                             "1; shape-bucket analogue of NLP length-"
                             "bucketing). Every song is still visited once "
                             "per epoch; a resume mid-window re-trains at "
                             "most window-1 songs, never skips one. 0 "
                             "disables (exact shuffled order, like the "
                             "reference)")
    parser.add_argument("--cache-mb", type=int, default=512,
                        help="host-RAM budget (MB) for the cross-epoch "
                             "ingestion cache: each corpus file is parsed/"
                             "rasterized once and later epochs replay its "
                             "SoA notes from RAM (~tens of KB/song). 0 "
                             "disables (re-parse every epoch, like the "
                             "reference)")
    args = parser.parse_args()
    if args.steps_per_dispatch > 1 and args.exact_shapes:
        raise SystemExit("--steps-per-dispatch needs bucketed shapes "
                         "(drop --exact-shapes)")
    if args.bucket_window:
        if args.steps_per_dispatch <= 1:
            raise SystemExit("--bucket-window only helps the K-step scan "
                             "path (set --steps-per-dispatch)")
        if args.batch_size != 1:
            raise SystemExit("--bucket-window needs --batch-size 1 (group "
                             "resume cursors only track the last song)")

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np
    from mst_tpu.config import Config, TrainConfig
    from mst_tpu.data.pipeline import iter_inputs
    from mst_tpu.data.prefetch import prefetch_iterator
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.checkpoint import CheckpointManager
    from mst_tpu.runtime.metrics import CsvLogger, ProgressBar, flatten_losses
    from mst_tpu.runtime.train import (
        batch_from_song, bucket_shape, create_train_state, group_stacks,
        make_train_step, make_multi_train_step)

    config = Config(train=TrainConfig(n_iterations=args.iters, seed=args.seed,
                                      save_interval=args.save_interval,
                                      remat=args.remat))
    if args.compute_dtype or args.storage_dtype:
        config = dataclasses.replace(config, model=dataclasses.replace(
            config.model,
            compute_dtype=args.compute_dtype or config.model.compute_dtype,
            storage_dtype=args.storage_dtype or config.model.storage_dtype))

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

    print("Training")
    logger = CsvLogger(args.csv)
    checkpoints = CheckpointManager(args.snapshots)
    pbar = ProgressBar(config.train.n_iterations)
    state = None
    step_fns = {}

    start_iteration = 0
    resume_cursor = 0
    if args.resume:
        latest = checkpoints.latest_step()
        if latest is not None:
            start_iteration = latest + 1
            resume_cursor = checkpoints.load_cursor(latest) or 0
            print(f"Resuming from snapshot {latest} "
                  f"(data cursor {resume_cursor})")

    cache = None
    if args.cache_mb > 0:
        from mst_tpu.data.cache import SongCache
        cache = SongCache(max_bytes=args.cache_mb << 20)
    songs = iter_inputs(files, shuffle=True, looped=True,
                        min_n_messages=config.train.min_n_messages,
                        rng=np.random.default_rng(config.train.seed),
                        start_at=resume_cursor, cache=cache)

    mesh = None
    if (args.batch_size > 1 or args.seq_parallel > 1) and \
            len(jax.devices()) > 1:
        from mst_tpu.parallel import create_mesh
        mesh = create_mesh(n_seq=args.seq_parallel)
        print(f"Device mesh: {dict(mesh.shape)}")
    if args.steps_per_dispatch > 1 and mesh is not None and \
            args.batch_size % mesh.shape["data"] != 0:
        raise SystemExit("--steps-per-dispatch with a mesh needs "
                         "--batch-size divisible by the data axis (each "
                         "device must own whole batch rows)")

    def group_stream():
        """Yield (data_cursor, (songs, Cb, Rb, caps)): one bucketed group of
        ``batch_size`` songs per training step, shapes decided but device
        arrays not yet built (the build stage below stacks consecutive
        same-bucket groups into one dispatch when --steps-per-dispatch>1)."""
        from mst_tpu.runtime.train import clamp_bar_bucket
        while True:
            if args.batch_size == 1:
                filename, song = next(songs)
                if song.pitched_empty:
                    continue
                max_n_bars = config.train.max_total_bars // song.n_channels
                Cb = bucket_shape(song.n_channels,
                                  config.train.channel_buckets)
                Rb = bucket_shape(min(song.n_bars, max_n_bars),
                                  config.train.bar_buckets)
                yield song.cursor, ([song], Cb, Rb, [min(max_n_bars, Rb)])
                continue
            group, caps = [], []
            while len(group) < args.batch_size:
                _, song = next(songs)
                if song.pitched_empty:
                    continue
                if group and song.beats_per_bar != \
                        group[0].beats_per_bar:
                    continue  # batch tensors share one beats-per-bar axis
                group.append(song)
                caps.append(config.train.max_total_bars // song.n_channels)
            Cb = bucket_shape(max(s.n_channels for s in group),
                              config.train.channel_buckets)
            Rb = bucket_shape(max(min(s.n_bars, c)
                                  for s, c in zip(group, caps)),
                              config.train.bar_buckets)
            # HBM budget: cap the bar bucket so B*Cb*Rb*T activations fit
            # (a (8,8,256,4) batch OOMs a 16 GB chip); truncation beyond the
            # cap mirrors the reference's max_total_bars rule
            Rb = clamp_bar_bucket(Rb, len(group), Cb,
                                  group[0].beats_per_bar,
                                  config.train.batch_cell_budget,
                                  config.train.bar_buckets)
            caps = [min(c, Rb) for c in caps]
            yield group[-1].cursor, (group, Cb, Rb, caps)

    def stack_signature(g):
        songs_g, Cb, Rb, _ = g
        has_u = any(s.has_unpitched for s in songs_g)
        return (len(songs_g), Cb, Rb, songs_g[0].beats_per_bar, has_u)

    spd = args.steps_per_dispatch
    if spd > 1:
        groups = group_stream()
        if args.bucket_window:
            from mst_tpu.runtime.train import window_sort
            groups = window_sort(groups, args.bucket_window, stack_signature)
        stacks = group_stacks(groups, spd, stack_signature,
                              limit=config.train.n_iterations
                              - start_iteration)
    else:
        stacks = ((c, [g]) for c, g in group_stream())

    def build_stream():
        """Build device batches on the prefetch thread: one rasterize
        dispatch covers the WHOLE stack (K*B songs), so host parsing, the
        host->HBM transfer AND the raster dispatch of the next stack overlap
        the current train dispatch."""
        from mst_tpu.runtime.train import device_batch_from_songs, pad_batch
        for cursor, groups in stacks:
            if mesh is not None and len(groups) > 1:
                # b-major stack layout: under a data-parallel mesh the
                # leading (B*K) axis shards into whole-b blocks (see
                # make_multi_train_step(b_major=True))
                B = len(groups[0][0])
                songs_flat = [g[0][b] for b in range(B) for g in groups]
                caps = [g[3][b] for b in range(B) for g in groups]
            else:
                songs_flat = [s for g in groups for s in g[0]]
                caps = [c for g in groups for c in g[3]]
            _, Cb, Rb, _ = groups[0]
            if args.exact_shapes:
                if args.batch_size == 1:
                    batch = batch_from_song(
                        songs_flat[0],
                        config.train.max_total_bars
                        // songs_flat[0].n_channels)
                    if batch is None:
                        continue
                else:
                    batch = pad_batch(songs_flat, Cb, Rb, bar_cap=caps)
            else:
                # scatter the rasters straight at the storage dtype: a bf16
                # train step then never reads/writes an fp32 raster at all
                batch = device_batch_from_songs(
                    songs_flat, Cb, Rb, bar_cap=caps,
                    raster_dtype=config.model.storage_dtype)
            if mesh is not None:
                from mst_tpu.parallel import shard_batch
                batch = shard_batch(batch, mesh, seq=args.seq_parallel > 1)
            yield cursor, (len(groups), batch)

    batches = prefetch_iterator(build_stream(),
                                depth=config.train.prefetch_depth)
    from mst_tpu.ops.losses import LossDict

    def record(base_iteration, loss_vecs, has_unpitched):
        # one host fetch for the whole dispatch: (n,) for a single step or
        # (K, n) for a K-step scan — reshaped host-side (indexing a device
        # array would dispatch a device op, i.e. a transport round-trip)
        arr = np.asarray(loss_vecs)
        for j, row in enumerate(arr.reshape(-1, arr.shape[-1])):
            _record_row(base_iteration + j, row, has_unpitched)

    def _record_row(iteration, row, has_unpitched):
        losses = LossDict(*[float(v) for v in row])
        values = dict(
            total_loss=float(losses.total),
            pitched_loss=float(losses.pitched_total),
            pitched_notes_loss=float(losses.pitched_notes),
            song_info_loss=float(losses.song_info_total),
            instruments_loss=float(losses.instruments),
            channels_loss=float(losses.channels_total),
            mode_loss=float(losses.mode),
            bpm_loss=float(losses.bpm),
        )
        if has_unpitched:
            values.update(unpitched_loss=float(losses.unpitched_total),
                          unpitched_notes_loss=float(losses.unpitched_notes))
        # parity: train-model.py:125, widened to every component — a NaN in
        # one branch must never hide behind a zeroed mean
        assert all(np.isfinite(v) for v in values.values()), values
        pbar.add(1, **values)
        logger.append(iteration=iteration, **flatten_losses(losses))

    data_cursor = resume_cursor
    pending = None  # (first iteration, (K, n) device loss matrix, has_u)
    profiling = False
    iteration = start_iteration
    while iteration < config.train.n_iterations:
        data_cursor, (ksteps, batch) = next(batches)
        has_unpitched = batch.unpitched is not None
        if state is None:
            state = create_train_state(model, config, batch, rng)
            if args.resume and start_iteration:
                state = checkpoints.restore(state)

        key = (has_unpitched, ksteps)
        if key not in step_fns:
            if ksteps == 1:
                step_fns[key] = make_train_step(model, config, has_unpitched,
                                                fetch_losses=False)
            else:
                step_fns[key] = make_multi_train_step(
                    model, config, has_unpitched, ksteps,
                    b_major=mesh is not None)
        if args.profile_dir and not profiling and iteration >= 10:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        from mst_tpu.ops.seq_context import sequence_sharding
        with sequence_sharding(mesh):  # no-op when mesh is None or seq==1
            state, loss_vec = step_fns[key](state, batch)
        if args.profile_dir and profiling and iteration + ksteps >= 15:
            jax.profiler.stop_trace()
            args.profile_dir = None

        # materialize the PREVIOUS dispatch's losses: the host fetch then
        # overlaps this dispatch's device compute instead of synchronizing
        # every step
        if pending is not None:
            record(*pending)
        pending = (iteration, loss_vec, has_unpitched)

        crossed_save = (iteration // config.train.save_interval) != \
            ((iteration + ksteps - 1) // config.train.save_interval) or \
            iteration % config.train.save_interval == 0
        iteration += ksteps
        if crossed_save:
            # drain the deferred fetch first: record() asserts every loss
            # component is finite, so a NaN-poisoned state is never persisted
            # (the loss of the step that produced `state` is still pending)
            record(*pending)
            pending = None
            checkpoints.save(iteration - 1, state, cursor=data_cursor)

    if pending is not None:
        record(*pending)
    pbar.close()
    checkpoints.close()


if __name__ == "__main__":
    main()
