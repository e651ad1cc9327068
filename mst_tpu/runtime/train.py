"""The jit-compiled training step: forward + loss + summed-gradient
accumulation + Adam with step decay.

Parity target: train-model.py:89-160 —
- Adam(lr=.01) with StepLR(step_size=200, gamma=.9) applied once per optimizer
  step (train-model.py:89-90,151-154);
- gradient accumulation over ``iter_size`` songs by *summing* gradients
  (``loss.backward()`` per song with one ``optimizer.step()``), reproduced
  exactly: grads are summed, not averaged;
- the loss call uses normalize=True (train-model.py:118).

TPU-first: the whole micro-step (forward, backward, accumulate, conditional
apply) is one jitted function; under a device mesh the same function is
pjit-sharded with batch-axis sharding and XLA inserts the gradient psum over
ICI (see mst_tpu.parallel).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mst_tpu.config import Config
from mst_tpu.data.pipeline import Song, get_used_instruments
from mst_tpu.models import StyleTransferModel
from mst_tpu.ops import precision
from mst_tpu.ops.losses import LossDict, total_loss
from mst_tpu.ops.shapes import split_note_features


class Batch(NamedTuple):
    """A padded, fixed-shape batch of songs."""

    mode: jnp.ndarray                 # (B, 2)
    bpm: jnp.ndarray                  # (B,)
    pitched: jnp.ndarray              # (B, C, R, T, 10, 56, 5)
    instruments_features: jnp.ndarray  # (B, C, 51)
    unpitched: Optional[jnp.ndarray]  # (B, Cu, R, T, 10, 47, 2) or None
    used_instruments: jnp.ndarray     # (B, 41)
    bar_lengths: jnp.ndarray          # (B,)
    channel_mask: jnp.ndarray         # (B, C)
    uchannel_mask: Optional[jnp.ndarray]  # (B, Cu) or None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    accum_grads: Any
    micro_step: jnp.ndarray   # total micro-steps taken (iterations)
    opt_step: jnp.ndarray     # optimizer applications (scheduler steps)


def make_lr_schedule(config: Config):
    """lr * gamma^(opt_step // step_size) (parity: StepLR, train-model.py:90)."""
    t = config.train

    def schedule(opt_step):
        return t.learning_rate * (t.lr_decay_gamma **
                                  (opt_step // t.lr_decay_every))
    return schedule


def make_optimizer(config: Config):
    # torch Adam defaults: betas (0.9, 0.999), eps 1e-8 (train-model.py:89).
    # optax's update count increments once per optimizer application, which is
    # exactly the reference's scheduler step, so StepLR is a schedule function.
    return optax.adam(learning_rate=make_lr_schedule(config))


def create_train_state(model: StyleTransferModel, config: Config,
                       sample_batch: Batch, rng) -> TrainState:
    # Initialize on the host CPU backend: un-jitted init dispatches hundreds
    # of small ops, which is pathological on a remote/attached accelerator;
    # params then transfer once (~4 MB).
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_batch = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if x is not None else None, sample_batch,
            is_leaf=lambda x: x is None)
        # ALWAYS init with an unpitched input: flax only creates params for
        # executed branches, so seeding from a percussion-free first song
        # would build a TrainState missing the unpitched encoder/applier and
        # the first percussion song of the run would crash with
        # ScopeParamNotFoundError. A zero dummy exercises the branch; the
        # per-module param RNG streams are path-keyed, so pitched params are
        # unchanged.
        unpitched = host_batch.unpitched
        umask = host_batch.uchannel_mask
        if unpitched is None:
            B, _, R, T = host_batch.pitched.shape[:4]
            unpitched = np.zeros((B, 1, R, T, 10, 47, 2), np.float32)
            umask = np.ones((B, 1), np.float32)
        # jit the init: one compiled program instead of hundreds of eager ops
        params = jax.jit(model.init)(
            rng, host_batch.mode, host_batch.bpm, host_batch.pitched,
            host_batch.instruments_features, unpitched,
            bar_lengths=host_batch.bar_lengths,
            channel_mask=host_batch.channel_mask,
            uchannel_mask=umask)
        opt = make_optimizer(config)
        opt_state = opt.init(params)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        state = TrainState(params=params, opt_state=opt_state,
                           accum_grads=zeros,
                           micro_step=jnp.zeros((), jnp.int32),
                           opt_step=jnp.zeros((), jnp.int32))
    default = jax.devices()[0]
    if default.platform != "cpu":
        state = jax.device_put(state, default)
    return state


def loss_fn(model: StyleTransferModel, params, batch: Batch,
            has_unpitched: bool, mean_type: str = "quadratic") -> LossDict:
    # batches built by device_batch_from_songs/pad_batch carry the rasters
    # NF-fused (see device_rasterize_batch fuse_nf); split inside this traced
    # program where XLA folds the reshape into the first consumer fusion
    batch = batch._replace(
        pitched=split_note_features(batch.pitched, 5),
        unpitched=split_note_features(batch.unpitched, 2))
    (inst_pred, mode_pred, bpm_pred), x_pitched, x_unpitched = model.apply(
        params, batch.mode, batch.bpm, batch.pitched,
        batch.instruments_features,
        batch.unpitched if has_unpitched else None,
        bar_lengths=batch.bar_lengths, channel_mask=batch.channel_mask,
        uchannel_mask=batch.uchannel_mask if has_unpitched else None)

    R = batch.pitched.shape[2]
    bar_mask = (jnp.arange(R)[None, :] < batch.bar_lengths[:, None]
                ).astype(batch.pitched.dtype)
    p_mask = batch.channel_mask[:, :, None] * bar_mask[:, None, :]
    u_mask = None
    if has_unpitched:
        u_mask = batch.uchannel_mask[:, :, None] * bar_mask[:, None, :]

    return total_loss(
        inst_pred, batch.used_instruments, mode_pred, batch.mode,
        bpm_pred, batch.bpm,
        x_pitched, batch.pitched,
        x_unpitched, batch.unpitched if has_unpitched else None,
        normalize=True, mean_type=mean_type,
        pitched_pad_mask=p_mask, unpitched_pad_mask=u_mask)


def _make_step_fn(model: StyleTransferModel, config: Config,
                  has_unpitched: bool):
    """The un-jitted micro-step body shared by make_train_step (one dispatch
    per step) and make_multi_train_step (a K-step lax.scan per dispatch)."""
    opt = make_optimizer(config)
    iter_size = config.train.iter_size

    def step(state: TrainState, batch: Batch):
        def scalar_loss(params):
            # traced under the config's numeric policy: matmul operands cast
            # to bf16 under compute_dtype="bfloat16", grid-scale activations
            # and the raster under storage_dtype="bfloat16" (params/grads/
            # optimizer state stay fp32)
            with precision.precision(config.model.compute_dtype,
                                     storage=config.model.storage_dtype):
                b = batch._replace(
                    pitched=precision.cast_storage(batch.pitched),
                    unpitched=(None if batch.unpitched is None else
                               precision.cast_storage(batch.unpitched)))
                losses = loss_fn(model, params, b, has_unpitched)
            return losses.total, losses

        if config.train.remat:
            # recompute the forward during backward instead of saving
            # activations — the TPU HBM lever for big (B, C, R) buckets
            scalar_loss = jax.checkpoint(scalar_loss)
        (loss, losses), grads = jax.value_and_grad(
            scalar_loss, has_aux=True)(state.params)
        accum = jax.tree_util.tree_map(jnp.add, state.accum_grads, grads)
        micro_step = state.micro_step + 1
        should_apply = (micro_step % iter_size) == 0

        def apply(operand):
            params, opt_state, accum, opt_step = operand
            updates, new_opt_state = opt.update(accum, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, accum)
            return new_params, new_opt_state, zeros, opt_step + 1

        def skip(operand):
            return operand

        params, opt_state, accum, opt_step = jax.lax.cond(
            should_apply, apply, skip,
            (state.params, state.opt_state, accum, state.opt_step))
        new_state = TrainState(params=params, opt_state=opt_state,
                               accum_grads=accum, micro_step=micro_step,
                               opt_step=opt_step)
        # one stacked loss vector -> ONE host fetch for all metrics (separate
        # scalar fetches cost a transport round-trip each on remote TPUs)
        return new_state, jnp.stack(tuple(losses))

    return step


def make_train_step(model: StyleTransferModel, config: Config,
                    has_unpitched: bool, fetch_losses: bool = True):
    """One micro-step: grad, accumulate (sum), apply Adam every ``iter_size``
    micro-steps with the decayed learning rate. Fully jit-compatible.

    With ``fetch_losses=False`` the returned losses are the raw device vector
    (convert later with ``LossDict(*np.asarray(vec))``) — the caller can defer
    the host fetch one iteration so it overlaps the next step's compute
    instead of synchronizing every step."""
    step = _make_step_fn(model, config, has_unpitched)

    jitted = jax.jit(step, donate_argnums=(0,))
    if not fetch_losses:
        return jitted

    def wrapped(state: TrainState, batch: Batch):
        new_state, vec = jitted(state, batch)
        values = np.asarray(vec)
        return new_state, LossDict(*[float(v) for v in values])

    return wrapped


def make_multi_train_step(model: StyleTransferModel, config: Config,
                          has_unpitched: bool, k: int,
                          b_major: bool = False):
    """K micro-steps as ONE jitted ``lax.scan`` dispatch.

    On a remote-attached TPU every jit dispatch costs a transport round-trip
    (~30-40 ms through this container's tunnel) that dwarfs the step's
    ~12 ms of device compute; per-step dispatch caps training at ~24
    steps/sec no matter how fast the chip is. Scanning K steps inside one
    program amortizes the round-trip K-fold: one dispatch, one (K, n_losses)
    fetch. No reference analogue (torch eager dispatches per op); this is
    the jit/XLA-native shape of the training loop.

    The input is a :class:`Batch` whose array leaves carry a leading ``K*B``
    axis (build it with ``device_batch_from_songs`` over K*B songs — one
    rasterize dispatch for the whole stack); the reshape to (K, B, …)
    happens inside the program so no extra device ops are dispatched.
    Returns ``(state, (K, n_losses) loss matrix)``. Semantics are identical
    to K sequential :func:`make_train_step` calls (gradient accumulation and
    the StepLR decay advance per scanned step; tests/test_multi_step.py pins
    the equivalence).

    ``b_major``: the stack axis is laid out ``b*K + k`` instead of
    ``k*B + b``. Use this under a data-parallel mesh: sharding the leading
    axis over ``data`` then gives each device contiguous whole-``b`` blocks
    (its K steps of its batch rows stay local), and the in-program
    (B, K, …) -> (K, B, …) transpose permutes only replicated/unsharded
    axes, so the scan slices inherit the batch-axis sharding and XLA still
    inserts one grad psum per scanned step over ICI.
    """
    step = _make_step_fn(model, config, has_unpitched)

    def multi(state: TrainState, kbatch: Batch):
        def split(x):
            if x is None:
                return None
            if b_major:
                x = x.reshape((x.shape[0] // k, k) + x.shape[1:])
                return jnp.moveaxis(x, 0, 1)
            return x.reshape((k, x.shape[0] // k) + x.shape[1:])

        batches = Batch(*(split(f) for f in kbatch))
        return jax.lax.scan(step, state, batches)

    return jax.jit(multi, donate_argnums=(0,))


def window_sort(stream, window: int, signature):
    """Reorder ``(cursor, item)`` pairs inside blocks of ``window`` items so
    same-``signature`` items become consecutive (stable within a block) —
    the shape-bucket analogue of NLP length-bucketing. Feeding this into
    :func:`group_stacks` turns a shape-diverse corpus from mostly-singleton
    dispatches into mostly-full K-step scans.

    Order semantics: each block is a permutation of ``window`` consecutive
    stream items, so every epoch still visits every song and the shuffle's
    global order is preserved at block granularity (the reference trains in
    fully shuffled order, train-model.py:92-96; within-block locality is the
    only deviation and is off by default).

    Resume semantics are conservative: items before a block's last carry the
    cursor that replays the block FROM ITS FIRST ATTEMPT (a mid-block resume
    re-trains at most ``window - 1`` songs, never skips one); the block's
    final item carries the true end-of-block cursor."""
    import itertools

    stream = iter(stream)
    while True:
        block = list(itertools.islice(stream, window))
        if not block:
            return
        # stable sort by signature: items keep stream order within a bucket
        order = sorted(range(len(block)),
                       key=lambda i: (repr(signature(block[i][1])), i))
        replay_block = block[0][0] - 1  # cursor-1 = the attempt index that
        end_cursor = block[-1][0]       # yielded the block's first item
        for n, i in enumerate(order):
            cursor = end_cursor if n == len(order) - 1 else replay_block
            yield cursor, block[i][1]


def group_stacks(stream, k: int, signature, limit: Optional[int] = None):
    """Group CONSECUTIVE same-signature items from ``(cursor, item)`` pairs
    into stacks of exactly ``k`` for the multi-step path.

    Yields ``(cursor, [items])`` with 1 <= len <= k: a full stack when k
    consecutive items share ``signature(item)``, else the buffered items are
    flushed as singletons (so only two program shapes exist per signature:
    the K-stack and the single step). Consecutive-only grouping preserves
    the exact song order — resume cursors and loss curves stay comparable
    with the per-step path. ``limit``: total item budget (the campaign's
    remaining iterations) — once fewer than k remain, items flush as
    singletons so a run of exactly ``n_iterations`` never overshoots."""
    buf = []
    buf_sig = None
    emitted = 0

    def room():
        return limit is None or emitted + k <= limit

    for cursor, item in stream:
        sig = signature(item)
        if buf and (sig != buf_sig or not room()):
            for c, it in buf:
                yield c, [it]
                emitted += 1
            buf = []
        if room():
            buf.append((cursor, item))
            buf_sig = sig
            if len(buf) == k:
                yield buf[-1][0], [it for _, it in buf]
                emitted += k
                buf = []
        else:
            yield cursor, [item]
            emitted += 1
    for c, it in buf:
        yield c, [it]
        emitted += 1


def batch_from_song(song: Song, max_n_bars: Optional[int] = None,
                    drop_empty_unpitched: bool = True) -> Optional[Batch]:
    """Tensorize one song as a batch of one (the reference's training unit,
    train-model.py:98-111): truncate bars, build mode/bpm/used-instruments,
    full masks. Returns None for silent songs (parity :105-106)."""
    from mst_tpu.data.pipeline import prepare_input
    mode, bpm, pitched, instf, unpitched = prepare_input(song, max_n_bars)
    if pitched.sum() == 0:
        return None
    if unpitched is not None and drop_empty_unpitched and unpitched.sum() == 0:
        unpitched = None
    used = get_used_instruments(instf, unpitched is not None)
    B, C, R = pitched.shape[:3]
    return Batch(
        mode=jnp.asarray(mode), bpm=jnp.asarray(bpm),
        pitched=jnp.asarray(pitched), instruments_features=jnp.asarray(instf),
        unpitched=None if unpitched is None else jnp.asarray(unpitched),
        used_instruments=jnp.asarray(used),
        bar_lengths=jnp.full((B,), R, dtype=jnp.int32),
        channel_mask=jnp.ones((B, C), dtype=jnp.float32),
        uchannel_mask=(None if unpitched is None else
                       jnp.ones((B, unpitched.shape[1]), dtype=jnp.float32)),
    )


def bucket_shape(n: int, buckets) -> int:
    """Smallest bucket >= n (falls back to n itself beyond the largest)."""
    for b in buckets:
        if n <= b:
            return b
    return n


def clamp_bar_bucket(Rb: int, B: int, Cb: int, T: int, budget: int,
                     bar_buckets) -> int:
    """Largest bar bucket with B*Cb*Rb*T within the HBM cell budget
    (TrainConfig.batch_cell_budget); floors to a bucket so jit shapes stay
    bucketed. Returns Rb unchanged when it already fits."""
    allowed = budget // max(B * Cb * T, 1)
    if Rb <= allowed:
        return Rb
    fitting = [b for b in bar_buckets if b <= allowed]
    return fitting[-1] if fitting else max(allowed, 1)


def device_batch_from_song(song: Song, max_channels: int, max_bars: int,
                           bar_cap: Optional[int] = None,
                           use_pallas: Optional[bool] = None,
                           raster_dtype=None) -> Optional[Batch]:
    """Bucket-padded batch-of-one whose dense rasters are materialized ON
    DEVICE from the song's SoA notes (mst_tpu.ops.device_raster) — per step
    only ~KBs of note records cross host->HBM instead of the padded tensor
    (tens of MB). Masks/labels identical to pad_batch."""
    if song.pitched_empty:
        return None
    return device_batch_from_songs([song], max_channels, max_bars,
                                   bar_cap=bar_cap, use_pallas=use_pallas,
                                   raster_dtype=raster_dtype)


def device_batch_from_songs(songs, max_channels: int, max_bars: int,
                            bar_cap=None, max_uchannels: int = 1,
                            use_pallas: Optional[bool] = None,
                            raster_dtype=None, mesh=None) -> Batch:
    """Collate N songs into one fixed-shape Batch whose dense rasters are
    materialized ON DEVICE (one scatter dispatch per note family for the whole
    batch) — the data-parallel path ships ~KBs of note records per song
    instead of pad_batch's dense host tensors (tens of MB each) over the
    host->HBM link. Masks/labels identical to pad_batch; songs must share
    beats-per-bar (the caller groups by time signature).

    ``raster_dtype``: scatter the rasters directly at this dtype (pass the
    config's storage_dtype so a bf16-storage train step never materializes
    the fp32 raster at all — its in-step cast_storage becomes a no-op).
    None keeps float32.

    ``mesh``: with a >1-device ``data`` axis (and a divisible batch), the
    rasters are built BORN-SHARDED — each device scatters only its local
    songs' notes via a shard_map'd kernel (device_rasterize_batch_sharded),
    so the batch never materializes on one chip; the later
    ``parallel.shard_batch`` device_put then finds the rasters already laid
    out and moves nothing."""
    from mst_tpu.ops.device_raster import (
        device_rasterize_batch, device_rasterize_batch_sharded)
    from mst_tpu.ops.rasterize import Rasterizer

    if raster_dtype is None:
        raster_dtype = jnp.float32

    B = len(songs)
    if bar_cap is None or isinstance(bar_cap, int):
        bar_caps = [bar_cap] * B
    else:
        bar_caps = list(bar_cap)
    rasterizers = [Rasterizer(s.info) for s in songs]
    valid_bars = []
    channel_counts = []
    for i, song in enumerate(songs):
        R = min(song.n_bars, max_bars)
        if bar_caps[i] is not None:
            R = min(R, bar_caps[i])
        valid_bars.append(R)
        channel_counts.append(min(song.n_channels, max_channels))

    # fuse_nf: the rasters ride in the Batch with (note, feature) fused into
    # one minor axis — the jitted raster program then emits a free leading-dim
    # reshape of its (rows, lanes) scatter output instead of the ~1.8 ms
    # standalone relayout into the 7-axis layout; the step program splits NF
    # back inside its first fusion (ops.shapes.split_note_features)
    sharded = (mesh is not None and mesh.shape.get("data", 1) > 1
               and B % mesh.shape["data"] == 0)
    if sharded:
        def build(note_arrays, pitched, n_ch):
            return device_rasterize_batch_sharded(
                mesh, rasterizers, note_arrays, pitched, n_ch, max_bars,
                valid_bars, use_pallas=use_pallas, out_dtype=raster_dtype,
                fuse_nf=True)
    else:
        def build(note_arrays, pitched, n_ch):
            return device_rasterize_batch(
                rasterizers, note_arrays, pitched, n_ch, max_bars,
                valid_bars, use_pallas=use_pallas, out_dtype=raster_dtype,
                fuse_nf=True)

    pitched = build([s.pitched_notes[:c] for s, c in
                     zip(songs, channel_counts)], True, max_channels)
    has_u = [s.has_unpitched for s in songs]
    unpitched = None
    if any(has_u):
        unpitched = build([(s.unpitched_notes[:max_uchannels] if h else [])
                           for s, h in zip(songs, has_u)],
                          False, max_uchannels)

    instf = np.zeros((B, max_channels, 51), np.float32)
    cmask = np.zeros((B, max_channels), np.float32)
    umask = np.zeros((B, max_uchannels), np.float32)
    mode = np.zeros((B, 2), np.float32)
    bpm = np.zeros((B,), np.float32)
    used = np.zeros((B, 41), np.float32)
    for i, song in enumerate(songs):
        C = channel_counts[i]
        instf[i, :C] = song.instruments_features[:C]
        cmask[i, :C] = 1.0
        if has_u[i]:
            umask[i, :min(len(song.unpitched_notes), max_uchannels)] = 1.0
        mode[i] = [0.0, 1.0] if song.info.scale.is_minor else [1.0, 0.0]
        bpm[i] = song.info.bpm
        used[i] = get_used_instruments(
            song.instruments_features[None, :C], has_u[i])[0]
    return Batch(
        mode=jnp.asarray(mode), bpm=jnp.asarray(bpm),
        pitched=pitched, instruments_features=jnp.asarray(instf),
        unpitched=unpitched, used_instruments=jnp.asarray(used),
        bar_lengths=jnp.asarray(np.asarray(valid_bars, np.int32)),
        channel_mask=jnp.asarray(cmask),
        uchannel_mask=jnp.asarray(umask) if any(has_u) else None,
    )


def pad_batch(songs, max_channels: int, max_bars: int,
              max_uchannels: int = 1, bar_cap=None):
    """Collate songs into one fixed-shape Batch with masks (the TPU-native
    batched-training path; no reference equivalent — SURVEY.md §2.4 DP row).

    ``bar_cap``: per-song bar truncation (the reference's
    max_total_bars // n_channels rule) applied before padding to ``max_bars``;
    an int applies to all songs, a sequence gives per-song caps.
    """
    B = len(songs)
    T = songs[0].beats_per_bar  # metadata — must not force a lazy raster
    if bar_cap is None or isinstance(bar_cap, int):
        bar_caps = [bar_cap] * B
    else:
        bar_caps = list(bar_cap)
    pitched = np.zeros((B, max_channels, max_bars, T, 10, 56, 5), np.float32)
    instf = np.zeros((B, max_channels, 51), np.float32)
    unpitched = np.zeros((B, max_uchannels, max_bars, T, 10, 47, 2),
                         np.float32)
    cmask = np.zeros((B, max_channels), np.float32)
    umask = np.zeros((B, max_uchannels), np.float32)
    lengths = np.zeros((B,), np.int32)
    mode = np.zeros((B, 2), np.float32)
    bpm = np.zeros((B,), np.float32)
    used = np.zeros((B, 41), np.float32)
    any_unpitched = False
    for i, song in enumerate(songs):
        C = min(song.pitched.shape[0], max_channels)
        R = min(song.pitched.shape[1], max_bars)
        if bar_caps[i] is not None:
            R = min(R, bar_caps[i])
        pitched[i, :C, :R] = song.pitched[:C, :R]
        instf[i, :C] = song.instruments_features[:C]
        cmask[i, :C] = 1.0
        lengths[i] = R
        # has_unpitched is the precomputed "raster exists and sums > 0" flag;
        # testing song.unpitched directly would force a lazy rasterization
        # (and a full sum) per song per epoch on cache-replayed slim Songs
        if song.has_unpitched:
            Cu = min(song.unpitched.shape[0], max_uchannels)
            unpitched[i, :Cu, :R] = song.unpitched[:Cu, :R]
            umask[i, :Cu] = 1.0
            any_unpitched = True
        is_minor = song.info.scale.is_minor
        mode[i] = [0.0, 1.0] if is_minor else [1.0, 0.0]
        bpm[i] = song.info.bpm
        used[i] = get_used_instruments(
            song.instruments_features[None, :C], song.has_unpitched)[0]
    # same NF-fused raster convention as device_batch_from_songs (a host-side
    # numpy reshape is free); consumers split via ops.shapes.split_note_features
    return Batch(
        mode=jnp.asarray(mode), bpm=jnp.asarray(bpm),
        pitched=jnp.asarray(pitched.reshape(pitched.shape[:-2] + (-1,))),
        instruments_features=jnp.asarray(instf),
        unpitched=(jnp.asarray(unpitched.reshape(
            unpitched.shape[:-2] + (-1,))) if any_unpitched else None),
        used_instruments=jnp.asarray(used),
        bar_lengths=jnp.asarray(lengths), channel_mask=jnp.asarray(cmask),
        uchannel_mask=jnp.asarray(umask) if any_unpitched else None,
    )
