"""Style transfer driver: compose one song's melody/rhythm with another's style.

Parity target: style/style_transfer.py. The public surface keeps the
reference's entry points and file layout:

  transfer_style(model_bundle, composition_path, style_paths, output_path)
    -> output_path/<name>/original/<name>.mid
       output_path/<name>/<name> (reconstructed).mid
       output_path/<name>/original/<style>.mid
       output_path/<name>/<name> (<style> style).mid

Differences by design: the model is a (flax module, params) bundle rather than
a pickled torch object, decoding runs through the vectorized derasterizer, and
``hard_output`` + appliers run jit-compiled. (The reference also calls an
unimported ``shutil.rmtree`` swallowed by a bare except, style_transfer.py:31-34
— behaviorally a no-op, so stale outputs are simply overwritten here.)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.data.pipeline import Song, get_input, prepare_input
from mst_tpu.exceptions import MidiFormatError
from mst_tpu.data.taxonomy import (
    INCLUDED_INSTRUMENTS, PERCUSSION_ID, category_instrument)
from mst_tpu.io import create_midi, load_midi_from_file, native
from mst_tpu.io.midi import bpm2tempo
from mst_tpu.models import StyleTransferModel
from mst_tpu.ops.events import SongInfo, read_midi
from mst_tpu.ops.losses import hard_output
from mst_tpu.ops.rasterize import Rasterizer
from mst_tpu.theory.scales import Scale


def _pack_output(x, ticks_per_beat):
    """Device-side hard_output + lossless wire packing (4 bytes/cell).

    The decoded .mid only ever contains int velocities (int(v*127),
    style/midi.py:147) and int tick durations (int(d*tpb),
    midi_conversion.py:558); computing those on device and shipping
    (uint16 ticks, uint8 velocity, uint8 accidental) is bit-identical to
    shipping the float tensor and converting on host — at 1/5 the bytes.
    """
    duration = x[..., 0]
    velocity = x[..., 1]
    velocity = velocity * (velocity > 0.01)
    vel_byte = (velocity * 127.0).astype(jnp.uint8)
    dur_ticks = jnp.clip((duration * ticks_per_beat).astype(jnp.int32),
                         0, 65535).astype(jnp.uint16)
    if x.shape[-1] > 2:
        acc = x[..., 2:]
        is_max = acc == acc.max(axis=-1, keepdims=True)
        hard = is_max & (acc > 0.1)
        flat, natural, sharp = hard[..., 0], hard[..., 1], hard[..., 2]
        code = jnp.where(flat, 0, jnp.where(natural, 1,
                                            jnp.where(sharp, 2, 1)))
    else:
        code = jnp.zeros_like(vel_byte, dtype=jnp.int32)
    return dur_ticks, vel_byte, code.astype(jnp.uint8)


def _pack_word(x, ticks_per_beat):
    """_pack_output fused into ONE uint32 word per cell —
    ``dur<<16 | vel<<8 | acc``, zero where the velocity byte gates out —
    exactly the record payload _compact_song emits.

    Handing the compaction a single u32 array instead of the (dur, vel, acc)
    triple matters on TPU: the block compaction consumes the roll in FLAT
    cell order, and the 6-D tiled -> flat flatten is a relayout XLA lowers
    as a sequential per-job slice loop (v5e transfer trace: three ~4 ms
    "wide" while loops per request, one per array — ~3.7 ms/song with their
    update-slices). One packed word pays that relayout once."""
    dur, vel, acc = _pack_output(x, ticks_per_beat)
    word = ((dur.astype(jnp.uint32) << 16) | (vel.astype(jnp.uint32) << 8)
            | acc.astype(jnp.uint32))
    return jnp.where(vel > 0, word, jnp.uint32(0))


COMPACT_CAPACITIES = (16384, 65536, 262144, 1048576)

# Fetched-record POOL tiers: without a device mesh, an apply batch's records
# are packed contiguously across jobs before the fetch (_pack_pool), so the
# transported buffer scales with the OBSERVED record total instead of
# B x capacity — per-job capacity only sizes device-internal routing buffers.
# Tiers double (waste <= 2x) and a sticky per-bundle hint keeps steady-state
# requests on the exact tier. With a mesh the per-job row layout is kept:
# cross-job packing would all-gather every shard's records onto one device,
# while the row layout fetches each shard's rows straight from its chip.
POOL_TIERS = (8192, 16384, 32768, 65536, 131072, 262144, 524288,
              1048576, 2097152, 4194304)


def _pick_pool_tier(n: int) -> int:
    for t in POOL_TIERS:
        if n <= t:
            return t
    return POOL_TIERS[-1]

# fused-result buffer layout (see _fused_transfer_apply)
_HDR = 8  # [bpm, mode_idx, n_picked, has_unpitched, count_p, count_u,
#            live_blocks_p, live_blocks_u]

_BLOCK = 128  # compaction block = one 128-lane row

# ranks per chunk of the big-tier compaction lookup (bounds the per-job
# rank->cell gather transient at CHUNK*128 floats = 8 MB)
_COMPACT_CHUNK = 16384


def _block_capacities(capacity: int) -> Tuple[int, int]:
    """Max nonempty 128-cell blocks the compaction can route at a capacity
    tier (pitched, unpitched). Worst case one note per block needs K =
    capacity, but real rolls cluster; the ladder escalates when the live-block
    count in the header exceeds these.

    Floors raised in round 4 (16384/4096, from 4096/1024): the routing table
    only sizes in-program transients (live_idx, the block prefix), NOT the
    fetched buffer, yet an overflow escalates the whole job to the next
    CAPACITY tier — whose rank-lookup compute and fetch bytes scale with
    capacity. The bench songs (~4-10k output notes spread over ~16k possible
    blocks) overflowed 4096 live blocks and paid the 65536 tier for counts
    that fit 16384; with the floor raised they stay on the small tier
    (device-profiled: the chunked big-tier lookup was 22% of transfer device
    time)."""
    return max(capacity // 4, 16384), max(capacity // 16, 4096)


def _device_pick_instruments(logits, n_instruments, max_channels):
    """Top-n instrument selection on device (parity with the host argsort of
    style_transfer.py:105-116, including the percussion-only escalation
    :107-108: when n_instruments == 1 and the top pick is percussion, the
    selection widens to top-2 so one pitched instrument survives — the
    reference's `instruments[0] == [percussion_id]` comparison broadcasts to
    a truthy array, so that branch IS live). Returns (picked category ids
    (max_channels,) padded -1, n_picked, has_unpitched)."""
    from mst_tpu.data.taxonomy import PERCUSSION_ID
    order = jnp.argsort(-logits)                       # (41,)
    rank = jnp.arange(order.shape[0])
    percussion_only = (n_instruments == 1) & (order[0] == PERCUSSION_ID)
    n_top = jnp.where(percussion_only, 2, n_instruments)
    in_top = rank < n_top
    has_unpitched = jnp.any(in_top & (order == PERCUSSION_ID))
    keep = in_top & (order != PERCUSSION_ID)
    pos = jnp.nonzero(keep, size=max_channels, fill_value=order.shape[0])[0]
    picked = jnp.where(pos < order.shape[0], order[jnp.minimum(pos, 40)], -1)
    n_picked = keep.sum()
    return picked, n_picked, has_unpitched


def _compact_song(word_raw, n_channels, n_bars, capacity, max_blocks):
    """Nonzero-velocity compaction of one song's packed raster (the
    (C, R, T, F10, N) uint32 word array from _pack_word) into a flat uint32
    record block: per note [cell_index, dur<<16 | vel<<8 | acc] — 8 bytes.
    Returns (count, n_live_blocks, records).

    TPU-first, scatter-free design: a flat ``jnp.nonzero`` over the ~4.6M-cell
    roll lowers to a 55M-row scatter plus O(n*128) reduce-window cumsums —
    measured ~600 ms of the fused apply program. Instead the roll is cut into
    128-cell blocks whose inclusive prefix sums are ONE (G,128)@(128,128) MXU
    matmul; only the (few thousand) nonempty blocks are routed: output rank q
    finds its block by a searchsorted over the live-block prefix and its cell
    by comparing against that block's prefix row. Everything is reduces,
    gathers and two tiny matmuls — bit-identical records (same ascending cell
    order), ~2x faster end-to-end. Blocks beyond ``max_blocks`` overflow the
    routing table; the count is reported in the header so the capacity ladder
    escalates (same contract as record-count overflow)."""
    shape = word_raw.shape
    c_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    valid = (c_idx < n_channels) & (r_idx < n_bars)
    word = jnp.where(valid, word_raw, 0)
    flat = word.reshape(-1)
    M = flat.shape[0]
    maskf = (flat != 0).astype(jnp.float32)
    pad = (-M) % _BLOCK
    if pad:
        maskf = jnp.concatenate([maskf, jnp.zeros((pad,), jnp.float32)])
    G = maskf.shape[0] // _BLOCK
    upper = jnp.triu(jnp.ones((_BLOCK, _BLOCK), jnp.float32))
    within = maskf.reshape(G, _BLOCK) @ upper   # inclusive prefix per block
    counts = within[:, -1]                      # (G,) notes per block
    n_live = (counts > 0).sum()
    live_idx = jnp.nonzero(counts > 0, size=max_blocks, fill_value=G - 1)[0]
    live_counts = jnp.where(jnp.arange(max_blocks) < n_live,
                            counts[live_idx], 0.0)
    prefix = jnp.cumsum(live_counts)            # (K,) inclusive block prefix
    total = prefix[-1]                          # exact: f32 integers < 2^24

    starts = prefix - live_counts  # exclusive block prefix (rank ranges)

    def rank_lookup(q):
        """CONSECUTIVE output ranks q -> (cell index, payload) records; the
        ``within[live_idx[k]]`` gather is (len(q), 128).

        Block-finding note: block k owns ranks [starts[k], prefix[k]), so
        k(q) = #{j: starts[j] <= q} - 1 — the monotone inverse of a step
        function. Computed as a chunk-local histogram of block starts +
        cumsum (O(ranks + blocks)) instead of jnp.searchsorted: the
        searchsorted form was the single largest cost of the fused transfer
        program on the v5e (12.3 of 39.8 ms/song device — XLA lowers the
        vectorized binary search as a 14-deep gather loop). Bit-identical
        on live ranks (dead ranks are masked below either way); ties with
        zero-count blocks resolve identically because such blocks share
        their successor's start and are counted together."""
        C = q.shape[0]
        rel = starts - q[0]
        base = (rel < 0).sum()
        idx = jnp.where((rel >= 0) & (rel < C), rel, C).astype(jnp.int32)
        hist = jnp.zeros((C + 1,), jnp.int32).at[idx].add(1)
        k = jnp.minimum(base + jnp.cumsum(hist[:C]) - 1, max_blocks - 1)
        before = jnp.where(k > 0, prefix[jnp.maximum(k - 1, 0)], 0.0)
        rows = within[live_idx[k]]
        idx_in = (rows < (q - before)[:, None] + 1.0).sum(axis=1)
        gidx = live_idx[k] * _BLOCK + idx_in
        live = q < total
        gidx = jnp.where(live, jnp.minimum(gidx, M - 1), 0)
        payload = jnp.where(live, flat[gidx], 0)
        return jnp.stack([jnp.where(live, gidx, 0).astype(jnp.uint32),
                          payload], axis=1)

    q = jnp.arange(capacity, dtype=jnp.float32)          # output ranks
    if capacity <= _COMPACT_CHUNK:
        rec = rank_lookup(q)
    else:
        # big tiers run the lookup in rank chunks (lax.map = sequential
        # scan) so the gather transient is O(chunk*128) not O(capacity*128)
        # — the unchunked 1048576 tier would materialize 512 MB per vmapped
        # job and OOM a 16 GB chip at realistic batch sizes; chunked, the
        # top tier's transient equals the (known-good) 16384 tier's
        rec = jax.lax.map(rank_lookup,
                          q.reshape(-1, _COMPACT_CHUNK)).reshape(capacity, 2)
    return (total.astype(jnp.uint32), n_live.astype(jnp.uint32),
            rec)  # (capacity, 2) uint32


def _compact_song_dense(word_raw, n_channels, n_bars, capacity):
    """Flat jnp.nonzero compaction — the escape hatch for pathologically
    SPREAD rolls whose live-block count overflows even the top tier's routing
    table while the record count itself fits. Slow (XLA lowers it to a full
    scatter + reduce-window cumsums) but density-independent; only compiled
    when a batch actually exhausts the block ladder. Bit-identical records."""
    shape = word_raw.shape
    c_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    valid = (c_idx < n_channels) & (r_idx < n_bars)
    word = jnp.where(valid, word_raw, 0)
    flat = word.reshape(-1)
    count = (flat != 0).sum()
    idx = jnp.nonzero(flat, size=capacity, fill_value=0)[0]
    rec = jnp.stack([idx.astype(jnp.uint32), flat[idx]], axis=1)
    return count.astype(jnp.uint32), jnp.zeros((), jnp.uint32), rec


def _pack_pool(rec, counts, pool_cap: int):
    """Pack B jobs' compacted records ((B, cap, 2) uint32, job b's first
    ``counts[b]`` rows live) contiguously into one (pool_cap, 2) buffer — job
    b's records start at sum(counts[:b]), preserving each job's ascending
    cell order, so the records are BIT-IDENTICAL to the per-job layout, just
    densely packed. Ranks beyond the observed total are zero; if the total
    exceeds ``pool_cap`` the tail is truncated — the host detects that from
    the (untruncated) header counts and escalates the pool tier."""
    c = counts.astype(jnp.int32)
    incl = jnp.cumsum(c)
    q = jnp.arange(pool_cap, dtype=jnp.int32)
    # job j owns pool ranks [incl[j]-c[j], incl[j]): invert the step
    # function with a histogram of job starts + cumsum (same trick as
    # _compact_song's rank_lookup; jnp.searchsorted lowers to a gather loop)
    starts = jnp.clip(incl - c, 0, pool_cap)
    hist = jnp.zeros((pool_cap + 1,), jnp.int32).at[starts].add(1)
    j = jnp.clip(jnp.cumsum(hist[:pool_cap]) - 1, 0, c.shape[0] - 1)
    start = incl[j] - c[j]
    live = q < incl[-1]
    idx = jnp.where(live, jnp.minimum(q - start, rec.shape[1] - 1), 0)
    return jnp.where(live[:, None], rec[j, idx], 0)


def _raster_extract_latents(model, params, p_notes, u_notes, mode, bpm, instf,
                            lengths, cmask, umask, *, B, Cb, Rb, T,
                            has_unpitched):
    """On-device rasterization of both note families + the latent extractor
    for a batch of B songs — the traced body of ModelBundle.fn("raster_extract")
    and the extraction stage of the fully-fused transfer program."""
    from mst_tpu.ops.device_raster import segment_rasterize
    from mst_tpu.ops.precision import storage_dtype

    # scatter the rasters straight at the active storage dtype: under a bf16
    # extraction policy the (B,Cb,Rb,T,10,56,5) buffer lands in HBM at half
    # width (bit-identical to fp32-scatter-then-cast; see segment_rasterize)
    n_rows_p = B * Cb * Rb * T * 10
    flat_p = segment_rasterize(*p_notes, n_rows_p, 56, 5,
                               out_dtype=storage_dtype())
    # NF-fused handoff: split only the LEADING row dim here (free — row-major
    # majors) and keep (note, feature) fused in the minor axis; the model
    # entry splits NF inside its first fusion (ops.shapes.split_note_features).
    # Splitting the minor axis at this boundary instead materialized a
    # standalone relayout of the whole raster — 4.2 ms/song of the 27.9 ms
    # device time on the v5e transfer trace (reshape.53 + copy.796, the
    # minor-dim-5 tiling), the same cost the train path killed in round 4.
    pitched = flat_p.reshape(B, Cb, Rb, T, 10, 56 * 5)
    unpitched = None
    if has_unpitched:
        n_rows_u = B * Rb * T * 10
        flat_u = segment_rasterize(*u_notes, n_rows_u, 47, 2,
                                   out_dtype=storage_dtype())
        unpitched = flat_u.reshape(B, 1, Rb, T, 10, 47 * 2)
    return model.apply(
        params, mode, bpm, pitched, instf, unpitched,
        bar_lengths=lengths, channel_mask=cmask,
        uchannel_mask=umask if has_unpitched else None,
        method=StyleTransferModel.extract_style)


def _fused_transfer_full(model, feature_table, params, extract_args,
                         style_idx, comp_idx, n_instruments, bar_lengths,
                         tpb, *, B, Cb, Rb, T, has_unpitched, capacity,
                         max_channels, dense_compaction=False,
                         extract_storage=None, pool=None):
    """The WHOLE transfer device side as ONE program: on-device rasterization
    + latent extraction of the B ingested songs, then the batched style
    application of every job (_fused_transfer_apply) on the just-computed
    latents. A transfer request whose songs share one extraction bucket pays
    exactly one jit dispatch + one fetch total — on a remote-attached chip
    the per-dispatch transport round-trip dominates single-request latency,
    and real serving deployments see the same effect at smaller scale."""
    # the extraction stage may run at a narrower activation storage dtype
    # (extract_storage); the apply stage below always traces at fp32 storage
    # (pinned by _wrap_precision's explicit default — never inherited from
    # the process global), keeping the packed wire formats byte-identical to
    # the proven path
    from mst_tpu.ops.precision import compute_dtype, precision
    with precision(compute_dtype(), storage=("float32" if extract_storage
                                              is None else extract_storage)):
        style, melody, rhythm = _raster_extract_latents(
            model, params, *extract_args, B=B, Cb=Cb, Rb=Rb, T=T,
            has_unpitched=has_unpitched)
    return _fused_transfer_apply(
        model, feature_table, params, style, melody, rhythm, style_idx,
        comp_idx, n_instruments, bar_lengths, tpb, capacity=capacity,
        max_channels=max_channels, dense_compaction=dense_compaction,
        pool=pool)


def _fused_transfer_apply(model, feature_table, params, style, melody, rhythm,
                          style_idx, comp_idx, n_instruments, bar_lengths,
                          tpb, *, capacity, max_channels,
                          dense_compaction=False, pool=None):
    """ONE device program for the whole style application of a BATCH of B
    jobs: latent gathers, song-info prediction, on-device instrument pick +
    feature gather, both appliers, packing, and sparse compaction — results
    flattened into a single (B, bufsize) uint32 buffer so the host pays
    exactly one jit dispatch and one fetch for all B jobs.

    Each job b pairs ``style[style_idx[b]]`` with the composition latents
    ``melody[comp_idx[b]]``/``rhythm[comp_idx[b]]`` (gathered ON DEVICE — the
    style-transfer cross product never materializes host-side slices).
    ``n_instruments`` (B,) int32; ``bar_lengths`` (B,) per-job real bar
    counts; ``tpb`` (B,) float32 ticks-per-beat.

    Per-job buffer layout (uint32, ``pool=None``): [header(8) |
    picked(max_channels) | pitched records (capacity*2) | unpitched records
    ((capacity//4)*2)]. With ``pool=(POOL_P, POOL_U)`` the result is ONE flat
    uint32 array [B*(8+max_channels) headers | POOL_P*2 pitched pool |
    POOL_U*2 unpitched pool] with every job's records packed contiguously
    (_pack_pool) — same records, a fraction of the fetched bytes.
    """
    style = style[style_idx]
    melody = melody[comp_idx]
    rhythm = rhythm[comp_idx]
    B = style.shape[0]
    inst_logits, mode_pred, bpm_pred = model.apply(
        params, style, rhythm, bar_lengths=bar_lengths,
        method=StyleTransferModel.predict_song_info)
    picked, n_picked, has_unpitched = jax.vmap(
        lambda lg, n: _device_pick_instruments(lg, n, max_channels))(
            inst_logits, n_instruments)
    instf = jnp.where((picked >= 0)[..., None],
                      feature_table[jnp.maximum(picked, 0)], 0.0)  # (B, C, 51)

    x_p, x_u = model.apply(params, style, melody, rhythm, instf, True,
                           method=StyleTransferModel.apply_style)
    tpb_b = tpb.reshape((B,) + (1,) * 5)
    word_p = _pack_word(x_p, tpb_b)
    word_u = _pack_word(x_u, tpb_b)
    blocks_p, blocks_u = _block_capacities(capacity)
    cap_u = capacity // 4
    if dense_compaction:
        def compact_p(w, nc, nb):
            return _compact_song_dense(w, nc, nb, capacity)

        def compact_u(w, nc, nb):
            return _compact_song_dense(w, nc, nb, cap_u)
    else:
        def compact_p(w, nc, nb):
            return _compact_song(w, nc, nb, capacity, blocks_p)

        def compact_u(w, nc, nb):
            return _compact_song(w, nc, nb, cap_u, blocks_u)
    count_p, live_p, rec_p = jax.vmap(compact_p)(
        word_p, n_picked, bar_lengths)
    count_u, live_u, rec_u = jax.vmap(compact_u)(
        word_u, jnp.where(has_unpitched, 1, 0), bar_lengths)

    header = jnp.stack([
        jnp.round(bpm_pred).astype(jnp.uint32),
        jnp.argmax(mode_pred, axis=-1).astype(jnp.uint32),
        n_picked.astype(jnp.uint32),
        has_unpitched.astype(jnp.uint32),
        count_p, count_u, live_p, live_u], axis=1)
    # picked may contain -1 padding: transported as uint32, viewed back signed
    if pool is None:
        return jnp.concatenate([header, picked.astype(jnp.uint32),
                                rec_p.reshape(B, -1), rec_u.reshape(B, -1)],
                               axis=1)
    pool_p, pool_u = pool
    hdr = jnp.concatenate([header, picked.astype(jnp.uint32)],
                          axis=1).reshape(-1)
    return jnp.concatenate([
        hdr, _pack_pool(rec_p, count_p, pool_p).reshape(-1),
        _pack_pool(rec_u, count_u, pool_u).reshape(-1)])


# Shape buckets: channel/bar counts are padded up to these so jit compiles
# amortize across songs (TPU-first; outputs at padded cells are masked or
# sliced away, and the padding-equivalence of the masked model is tested).
# The bar ladder is deliberately finer than powers of two: every grid-scale
# stage (rasterize, encoders, appliers, packing) scales ~linearly in Rb, so
# padding 135 real bars to 256 would nearly double the device time of the
# whole request. Compiles are per-actually-used bucket and served from the
# persistent on-disk executable cache, so the finer ladder costs nothing
# after the first encounter of each shape.
CHANNEL_BUCKETS = (8, 16, 32)
BAR_BUCKETS = (64, 96, 128, 160, 192, 256, 320, 384, 512, 768, 1024)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def _pool_from_key(rest) -> Optional[Tuple[int, int]]:
    """Parse the optional ``pool=PP,PU`` segment of a fused-program key."""
    for r in rest:
        if r.startswith("pool="):
            pp, pu = r[5:].split(",")
            return int(pp), int(pu)
    return None


@dataclasses.dataclass
class ModelBundle:
    """Model + params (+ optional device mesh).

    With ``mesh`` set, params are replicated across it and every batched
    transfer stage (extraction, fused apply) shards its batch axis over the
    ``data`` mesh axis — the batch is padded up to a multiple of the axis
    size, each device runs its slice of the songs, and XLA inserts the
    gathers for the style/composition cross product. Multi-chip inference
    throughput thus scales with the mesh; semantics are unchanged (tested
    identical output files on a virtual device mesh)."""

    model: StyleTransferModel
    params: dict
    mesh: Optional[object] = None  # jax.sharding.Mesh
    capacity_hint: int = 0  # sticky: smallest compaction tier known to fit
    # sticky record-pool sizing (meshless fetch path): last observed batch
    # record SUMS; the next request starts on _pick_pool_tier of these
    pool_hint_p: int = 0
    pool_hint_u: int = 0
    # fetch apply results through the packed-record pool (False pins the
    # per-job row layout; a mesh implies False — see POOL_TIERS)
    use_record_pool: bool = True
    # fuse extraction+apply into ONE device program when a request's songs
    # share an extraction bucket (transfer_styles); False forces the
    # two-dispatch pipeline (also the output-equivalence test's toggle)
    fuse_requests: bool = True
    # set to a list to record every device dispatch as (key, args, kwargs) —
    # bench.py replays the log through runtime.flops to account the transfer
    # path's matmul FLOPs (zero overhead when None)
    call_log: Optional[list] = None
    # activation storage dtype for the EXTRACTION stage only ("bfloat16"
    # halves the on-device raster + encoder-grid HBM traffic; the apply
    # stage and its packed wire formats always run at fp32 storage —
    # tools/ab_extract_storage.py is the measured A/B behind the default)
    extract_storage_dtype: Optional[str] = None
    # note-grid tail formulation for these (forward-only) programs; the
    # default avoids materializing the applier grid to HBM (bit-identical
    # outputs — ops.pallas_grid._tail_unrolled). "checkpoint" restores the
    # training lowering.
    tail_mode: str = "unrolled"
    _jitted: dict = dataclasses.field(default_factory=dict)
    _raw: dict = dataclasses.field(default_factory=dict)  # key -> pre-jit fn

    def __post_init__(self):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.params = jax.device_put(
                self.params, NamedSharding(self.mesh, P()))

    def data_axis_size(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape["data"]

    def shard_rows(self, x):
        """Commit a batch-axis array to the mesh (rows over ``data``)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _wrap_precision(self, f, storage=None):
        """Trace ``f`` under the model config's compute dtype (bf16 matmuls
        when ModelConfig.compute_dtype="bfloat16"; outputs stay fp32).
        ``storage``: activation storage dtype override for this program;
        None pins EXPLICIT float32 storage — transfer programs must never
        inherit a process-global storage dtype someone set for training
        (``precision(storage=None)`` would), or the apply stage's proven
        fp32 packed wire format silently narrows.

        Every bundle program is forward-only, so the applier's note-grid
        tail traces under the bundle's ``tail_mode`` (default "unrolled" —
        bit-identical to the checkpoint form, fuses away the grid's HBM
        round trip; see ops.pallas_grid._tail_unrolled)."""
        from mst_tpu.ops.pallas_grid import jnp_tail
        from mst_tpu.ops.precision import precision
        dtype = self.model.config.compute_dtype

        def wrapped(*args, **kwargs):
            with precision(dtype, storage=("float32" if storage is None
                                           else storage)), \
                    jnp_tail(self.tail_mode):
                return f(*args, **kwargs)
        return wrapped

    def fn(self, key: str):
        """Cached jitted model methods (compiled once per input shape)."""
        if key not in self._jitted:
            if key == "apply":
                def apply_packed(params, style, melody, rhythm, instf,
                                 tpb, *, unpitched):
                    x_p, x_u = self.model.apply(
                        params, style, melody, rhythm, instf, unpitched,
                        method=StyleTransferModel.apply_style)
                    packed_p = _pack_output(x_p, tpb)
                    packed_u = _pack_output(x_u, tpb) if unpitched else None
                    return packed_p, packed_u
                self._raw[key] = apply_packed
                self._jitted[key] = jax.jit(
                    self._wrap_precision(apply_packed),
                    static_argnames=("unpitched",))
            elif key.startswith("raster_extract"):
                # one dispatch: on-device rasterization of both note families
                # + the latent extractor, for a whole batch of B songs
                raw = functools.partial(_raster_extract_latents, self.model)
                self._raw[key] = raw
                self._jitted[key] = jax.jit(
                    self._wrap_precision(
                        raw, storage=self.extract_storage_dtype),
                    static_argnames=("B", "Cb", "Rb", "T", "has_unpitched"))
            elif key.startswith("transfer_fused"):
                # the whole request in ONE program: extraction AND apply
                _, cap, cba, *rest = key.split(":")
                from mst_tpu.data.taxonomy import category_feature_table
                table = jnp.asarray(category_feature_table())
                raw = functools.partial(
                    _fused_transfer_full, self.model, table,
                    capacity=int(cap), max_channels=int(cba),
                    dense_compaction="dense" in rest,
                    pool=_pool_from_key(rest),
                    extract_storage=self.extract_storage_dtype)
                self._raw[key] = raw
                self._jitted[key] = jax.jit(
                    self._wrap_precision(raw),
                    static_argnames=("B", "Cb", "Rb", "T", "has_unpitched"))
            elif key.startswith("fused"):
                _, cap, cb, *rest = key.split(":")
                from mst_tpu.data.taxonomy import category_feature_table
                table = jnp.asarray(category_feature_table())
                raw = functools.partial(
                    _fused_transfer_apply, self.model, table,
                    capacity=int(cap), max_channels=int(cb),
                    dense_compaction="dense" in rest,
                    pool=_pool_from_key(rest))
                self._raw[key] = raw
                self._jitted[key] = jax.jit(self._wrap_precision(raw))
            else:
                method = {
                    "extract": StyleTransferModel.extract_style,
                    "predict": StyleTransferModel.predict_song_info,
                }[key]
                raw = (lambda params, *a, **kw: self.model.apply(
                    params, *a, method=method, **kw))
                self._raw[key] = raw
                self._jitted[key] = jax.jit(self._wrap_precision(raw))
        if self.call_log is None:
            return self._jitted[key]
        jitted = self._jitted[key]

        def logged(*args, **kwargs):
            self.call_log.append((key, args, kwargs))
            return jitted(*args, **kwargs)
        return logged


def sparsify_velocity_bias(params: dict) -> dict:
    """Push the appliers' final-layer velocity bias negative so hard_output
    yields a realistically sparse roll from UNTRAINED params. A raw init puts
    every velocity above the 0.01 threshold, so a long song's dense output
    (potentially > the largest compaction capacity) would overflow the packed
    decode. In-place on the passed (already-copied) dict; returns it."""
    for name in ("pitched_style_applier", "unpitched_style_applier"):
        layer = params["params"][name]["linear"]
        layer["bias"] = layer["bias"].at[1].set(-5.0)
    return params


def demo_params(model: StyleTransferModel, seed: int = 0):
    """Freshly initialized params with the appliers' velocity bias sparsified
    (see sparsify_velocity_bias), for structure demos without a trained
    snapshot. Initializes on the host CPU backend (un-jitted init dispatches
    hundreds of tiny ops — pathological over a remote-accelerator
    transport)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.array([[1.0, 0.0]]),
            jnp.array([120.0]), jnp.zeros((1, 1, 4, 4, 10, 56, 5)),
            jnp.zeros((1, 1, 51)).at[0, 0, 0].set(1.0),
            jnp.zeros((1, 1, 4, 4, 10, 47, 2)))
        params = sparsify_velocity_bias(dict(params))
    return params


def ingest_map(fn, paths):
    """Map ingestion over paths: threaded when the host has cores to spare
    (parsing/quantization release the GIL inside numpy and the C++ codec),
    plain iteration on a single-core host — pool scheduling there measured
    ~35% SLOWER than a straight loop (60 vs 91 songs/sec), since every
    submit/result handoff forces a context switch on the one core."""
    paths = list(paths)
    if (os.cpu_count() or 1) <= 1 or len(paths) <= 1:
        return [fn(p) for p in paths]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, len(paths))) as pool:
        return list(pool.map(fn, paths))


def get_model_input(path) -> Optional[Tuple[str, Song]]:
    """Parity: style_transfer.py:57-64."""
    mid = load_midi_from_file(path)
    if mid is None:
        return None
    channels, info = read_midi(mid)
    allowed = set([-1, *INCLUDED_INSTRUMENTS])
    channels = [c for c in channels if c["instrument_id"] in allowed]
    song = get_input(channels, info)
    song.path = str(path)
    return str(path), song


@dataclasses.dataclass
class LatentBatch:
    """Batched latents for B songs sharing one (Cb, Rb, T) bucket. Kept as
    whole device arrays — per-song host slicing would cost an eager dispatch
    per slice over the remote link; downstream gathers happen inside the
    fused apply program instead."""

    style: jnp.ndarray    # (B, S)
    melody: jnp.ndarray   # (B, Rb, T, 10, 56, melody_size)
    rhythm: jnp.ndarray   # (B, Rb, T, 10, rhythm_size)
    n_bars: List[int]     # per-song real bar count


def extract_style(bundle: ModelBundle, song: Song):
    """Parity: style_transfer.py:67-74 (max_n_bars = 1000 // n_channels).

    TPU-first data path: only the SoA note records travel to the device; the
    dense bucket-padded raster is materialized on-chip and fed straight into
    the latent extractor within the SAME jit dispatch (compiled once per
    bucket). Latents at valid cells are identical to the reference's unpadded
    forward (tested). Returns (style, melody, rhythm, real_bar_count)."""
    batch = _extract_group(bundle, [song], song.info.n_beats,
                           song.unpitched_shape is not None)
    return batch.style, batch.melody, batch.rhythm, batch.n_bars[0]


def extract_styles(bundle: ModelBundle, songs: Sequence[Song]):
    """Batched latent extraction: songs are grouped by (beats-per-bar,
    percussion presence), each group bucket-padded and run as ONE on-device
    rasterization + extraction dispatch. Returns (batches, locators): a list
    of LatentBatch plus, per input song, its (batch_index, row) locator."""
    group_keys = {}
    group_members = []
    locators = [None] * len(songs)
    for i, song in enumerate(songs):
        key = (song.info.n_beats, song.unpitched_shape is not None)
        if key not in group_keys:
            group_keys[key] = len(group_members)
            group_members.append([])
        group_members[group_keys[key]].append(i)
    batches = []
    for key, members in zip(group_keys, group_members):
        T, has_unpitched = key
        batch = _extract_group(bundle, [songs[i] for i in members], T,
                               has_unpitched)
        for row, i in enumerate(members):
            locators[i] = (len(batches), row)
        batches.append(batch)
    return batches, locators


def _extract_group(bundle: ModelBundle, songs: Sequence[Song], T: int,
                   has_unpitched: bool) -> LatentBatch:
    """One extraction dispatch for B songs sharing beats-per-bar ``T`` and
    percussion presence (see _extract_inputs for the batching scheme)."""
    args, statics, Rs = _extract_inputs(bundle, songs, T, has_unpitched)
    style, melody, rhythm = bundle.fn("raster_extract")(
        bundle.params, *args, **statics)
    return LatentBatch(style=style, melody=melody, rhythm=rhythm, n_bars=Rs)


def _extract_inputs(bundle: ModelBundle, songs: Sequence[Song], T: int,
                    has_unpitched: bool):
    """Build the device inputs of the batched raster+extract program: every
    song's quantized note records are offset into one flat row space (song b =
    channel block b*Cb..), so a single on-device scatter materializes the
    whole (B, Cb, Rb, ...) raster batch feeding the extractor. Returns
    (positional args, static kwargs, per-song real bar counts)."""
    from mst_tpu.ops.device_raster import concat_and_pad, encode_notes

    B_real = len(songs)
    # pad the batch up to the data-axis size so rows shard evenly; pad rows
    # are all-zero songs whose latents are never referenced
    n_data = bundle.data_axis_size()
    B = -(-B_real // n_data) * n_data
    caps = [1000 // s.n_channels for s in songs]
    Cs = [s.pitched_shape[0] for s in songs]
    Rs = [min(s.pitched_shape[1], cap) for s, cap in zip(songs, caps)]
    Cb = _bucket(max(Cs), CHANNEL_BUCKETS)
    Rb = _bucket(max(Rs), BAR_BUCKETS)

    def records(pitched):
        parts = []
        for b, song in enumerate(songs):
            rasterizer = Rasterizer(song.info)
            note_arrays = (song.pitched_notes if pitched
                           else song.unpitched_notes)
            n_channels = Cb if pitched else 1
            for c, n in enumerate(note_arrays[:n_channels]):
                q = rasterizer.quantize(n, pitched)
                parts.append(encode_notes(
                    rasterizer, q, b * n_channels + c, pitched,
                    B * n_channels, Rb, valid_bars=Rs[b]))
        dn = concat_and_pad(parts)
        return tuple(jnp.asarray(a) for a in
                     (dn.row, dn.note_idx, dn.acc, dn.duration, dn.velocity,
                      dn.valid))

    p_notes = records(True)
    instf_pad = np.zeros((B, Cb, songs[0].instruments_features.shape[-1]),
                         np.float32)
    cmask = np.zeros((B, Cb), np.float32)
    mode = np.zeros((B, 2), np.float32)
    bpm = np.full((B,), 120.0, np.float32)
    for b, song in enumerate(songs):
        instf_pad[b, :Cs[b]] = song.instruments_features
        cmask[b, :Cs[b]] = 1.0
        mode[b] = [0.0, 1.0] if song.info.scale.is_minor else [1.0, 0.0]
        bpm[b] = song.info.bpm
    lengths = np.asarray(Rs + [1] * (B - B_real), np.int32)
    # parity: prepare_input passes percussion whenever present, even all-zero
    # (style_transfer.py:70-73; only the train loop drops silent percussion)
    if has_unpitched:
        u_notes = records(False)
        umask = bundle.shard_rows(jnp.ones((B, 1), jnp.float32))
    else:
        u_notes = tuple(jnp.zeros((0,)) for _ in range(6))
        umask = None

    args = (p_notes, u_notes,
            bundle.shard_rows(jnp.asarray(mode)),
            bundle.shard_rows(jnp.asarray(bpm)),
            bundle.shard_rows(jnp.asarray(instf_pad)),
            bundle.shard_rows(jnp.asarray(lengths)),
            bundle.shard_rows(jnp.asarray(cmask)),
            umask)
    statics = dict(B=B, Cb=Cb, Rb=Rb, T=T, has_unpitched=has_unpitched)
    return args, statics, Rs


def _mode_one_hot(song: Song) -> np.ndarray:
    is_minor = song.info.scale.is_minor
    return np.array([[0.0, 1.0]] if is_minor else [[1.0, 0.0]], np.float32)


def _hard_output_np(x: np.ndarray) -> np.ndarray:
    """Host-side hard_output (same semantics as ops.losses.hard_output,
    parity model.py:818-832) — numpy, in-place on a copy, so decode never
    round-trips the device."""
    out = np.array(x, dtype=np.float32, copy=True)
    v = out[..., 1]
    v *= v > 0.01
    if out.shape[-1] > 2:
        acc = out[..., 2:]
        hard = acc == acc.max(axis=-1, keepdims=True)
        hard &= acc > 0.1
        out[..., 2:] = hard
    return out


def _free_channels(n: int) -> List[int]:
    """First n non-percussion MIDI channel ids (parity: style_transfer.py:78-80)."""
    return [i for i in range(16) if i != 9][:n]


def save_channels(rasterizer: Rasterizer, pitched_channels, unpitched_channels,
                  instruments: Sequence[int], save_path: str) -> None:
    """Decode dense channel tensors to a .mid file (parity:
    style_transfer.py:77-98 + decode_midi :145-158, create_midi max_delta_time=1).

    ``pitched_channels``: (C, bar, beat, frac, 56, 5) or batched (1, C, ...).
    """
    # float32 throughout: the reference decodes through torch float32 tensors
    # (style_transfer.py:91-97), so float32 duration/velocity truncation is the
    # parity behavior, and it halves host bandwidth
    pitched = np.asarray(pitched_channels, dtype=np.float32)
    if pitched.ndim == 7:
        pitched = pitched[0]
    unpitched = None
    if unpitched_channels is not None:
        unpitched = np.asarray(unpitched_channels, dtype=np.float32)
        if unpitched.ndim == 7:
            unpitched = unpitched[0]

    # decode_midi always thresholds, including originals
    # (style_transfer.py:147) — fused sparsely into the derasterize gather
    # (hard=True) so the dense tensor is never copied
    instruments_data = []
    channel_ids = _free_channels(pitched.shape[0])
    for idx, instrument_id in zip(range(pitched.shape[0]), instruments):
        messages = rasterizer.messages_from_raster(pitched[idx], pitched=True,
                                                   hard=True)
        instruments_data.append({
            "channel_id": channel_ids[idx],
            "instrument_id": int(instrument_id),
            "messages": messages,
        })
    if unpitched is not None:
        messages = rasterizer.messages_from_raster(unpitched[0],
                                                   pitched=False, hard=True)
        instruments_data.append({
            "channel_id": 9, "instrument_id": -1, "messages": messages,
        })

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    mid = create_midi(rasterizer.info.as_create_midi_info(),
                      *instruments_data, max_delta_time=1)
    native.write_midi_file(save_path, mid)


def save_packed_channels(rasterizer: Rasterizer, packed_p, packed_u,
                         instruments: Sequence[int], save_path: str) -> None:
    """Decode packed device output ((C,R,T,F10,N) uint arrays) to a .mid."""
    dur, vel, acc = packed_p
    instruments_data = []
    channel_ids = _free_channels(dur.shape[0])
    for idx, instrument_id in zip(range(dur.shape[0]), instruments):
        q = rasterizer.derasterize_packed(dur[idx], vel[idx], acc[idx],
                                          pitched=True)
        instruments_data.append({
            "channel_id": channel_ids[idx],
            "instrument_id": int(instrument_id),
            "messages": rasterizer.qnotes_to_messages(q, pitched=True),
        })
    if packed_u is not None:
        du, vu, au = packed_u
        q = rasterizer.derasterize_packed(du[0], vu[0], au[0], pitched=False)
        instruments_data.append({
            "channel_id": 9, "instrument_id": -1,
            "messages": rasterizer.qnotes_to_messages(q, pitched=False),
        })
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    mid = create_midi(rasterizer.info.as_create_midi_info(),
                      *instruments_data, max_delta_time=1)
    native.write_midi_file(save_path, mid)


def apply_style(bundle: ModelBundle, info: SongInfo, style, melody, rhythm,
                n_instruments: int, save_path: str,
                n_bars: Optional[int] = None) -> None:
    """Predict song info, pick top-k instruments, decode and save
    (parity: style_transfer.py:101-131 — incl. the predicted-mode scale
    overwrite :118-122 and the percussion-only top-2 escalation :107-108).
    ``n_bars``: real bar count when the latents are bucket-padded."""
    R = rhythm.shape[1] if n_bars is None else n_bars
    apply_styles(bundle, [info], [style], [melody], [rhythm], [n_instruments],
                 [save_path], [R])


def apply_styles(bundle: ModelBundle, infos: Sequence[SongInfo], styles,
                 melodies, rhythms, n_instruments_list: Sequence[int],
                 save_paths: Sequence[str], n_bars_list: Sequence[int]
                 ) -> None:
    """Batched apply_style: B songs whose latents share one (Rb, T) bucket.

    The entire device side (prediction, instrument picks, appliers, packing,
    sparse compaction) for ALL B songs is ONE fused jit call returning one
    (B, bufsize) uint32 buffer — a single dispatch + single fetch over the
    (high-latency) host<->TPU link, amortized across the batch.
    """
    style = jnp.concatenate([jnp.asarray(s) for s in styles], axis=0)
    melody = jnp.concatenate([jnp.asarray(m) for m in melodies], axis=0)
    rhythm = jnp.concatenate([jnp.asarray(r) for r in rhythms], axis=0)
    idx = np.arange(len(infos), dtype=np.int32)
    _apply_batch(bundle, infos, style, melody, rhythm, idx, idx,
                 n_instruments_list, save_paths, n_bars_list)


def _fits(capacity: int, count_p: int, count_u: int, live_p: int,
          live_u: int) -> bool:
    """Do the observed record counts AND live-block routing counts fit a
    compaction tier?"""
    blocks_p, blocks_u = _block_capacities(capacity)
    return (count_p <= capacity and count_u <= capacity // 4
            and live_p <= blocks_p and live_u <= blocks_u)


def _header_table(buf: np.ndarray, B: int, Cb: int, pool) -> np.ndarray:
    """The (B, 8) per-job header rows of a fetched fused-apply buffer."""
    if pool is None:
        return buf[:B, :_HDR]
    return buf[:B * (_HDR + Cb)].reshape(B, _HDR + Cb)[:, :_HDR]


def unpack_job_records(buf: np.ndarray, B: int, Cb: int, capacity: int, pool):
    """Split a fetched fused-apply buffer into B per-job views
    ``(header (8,), picked (Cb,) int32, rec_p (count_p, 2), rec_u
    (count_u, 2))`` — the wire-layout inverse of _fused_transfer_apply for
    both the per-job-row and the packed-pool layouts."""
    out = []
    if pool is None:
        base = _HDR + Cb
        for b in range(B):
            row = buf[b]
            hdr = row[:_HDR]
            picked = np.ascontiguousarray(row[_HDR:_HDR + Cb]).view(np.int32)
            cp, cu = int(hdr[4]), int(hdr[5])
            out.append((hdr, picked,
                        row[base:base + capacity * 2].reshape(-1, 2)[:cp],
                        row[base + capacity * 2:].reshape(-1, 2)[:cu]))
        return out
    hdrs = buf[:B * (_HDR + Cb)].reshape(B, _HDR + Cb)
    rec_base = B * (_HDR + Cb)
    rec_p = buf[rec_base:rec_base + pool[0] * 2].reshape(-1, 2)
    rec_u = buf[rec_base + pool[0] * 2:].reshape(-1, 2)
    off_p = off_u = 0
    for b in range(B):
        hdr = hdrs[b, :_HDR]
        picked = np.ascontiguousarray(hdrs[b, _HDR:]).view(np.int32)
        cp, cu = int(hdr[4]), int(hdr[5])
        out.append((hdr, picked, rec_p[off_p:off_p + cp],
                    rec_u[off_u:off_u + cu]))
        off_p += cp
        off_u += cu
    return out


def run_fused_jobs(bundle: ModelBundle, infos, style_mat, melody_mat,
                   rhythm_mat, style_idx, comp_idx, n_instruments_list,
                   n_bars_list, Cb: int, host_work=None, dispatch=None):
    """Dispatch the fused apply program for B (style row, composition row)
    jobs, escalating through the compaction capacity ladder (and the dense
    escape hatch) until every job's output fits. Returns the fetched
    ``(buf (B, bufsize) uint32, capacity)`` ready for _decode_packed_buffer.

    ``host_work``: optional callable run AFTER the device program is
    dispatched but BEFORE its result is fetched — host-side work (e.g.
    decoding the original .mid files) overlaps the device compute instead of
    serializing with it.

    ``dispatch``: optional ``(job_rows, capacity, dense, pool) -> device
    buffer`` override — the fully-fused single-dispatch path substitutes the
    program that also computes the latents; the ladder/hint/escape-hatch
    logic here is the single source of truth for BOTH paths.

    Returns ``(buf, capacity, pool)``; decode the buffer with
    ``unpack_job_records(buf, B, Cb, capacity, pool)``."""
    B = len(infos)

    def rows(values, dtype):
        # pad the job list by repeating the last job so rows shard evenly
        # over the mesh (pad outputs are never decoded)
        n_data = bundle.data_axis_size()
        Bp = -(-B // n_data) * n_data
        arr = np.asarray(list(values) + [values[-1]] * (Bp - B), dtype)
        return bundle.shard_rows(jnp.asarray(arr))

    tpb = rows([i.ticks_per_beat for i in infos], np.float32)
    n_inst = rows(list(n_instruments_list), np.int32)
    bars = rows(list(n_bars_list), np.int32)
    style_idx = rows(list(style_idx), np.int32)
    comp_idx = rows(list(comp_idx), np.int32)
    job_rows = (style_idx, comp_idx, n_inst, bars, tpb)
    if dispatch is None:
        def dispatch(job_rows, capacity, dense, pool):
            suffix = ":dense" if dense else ""
            if pool is not None:
                suffix += f":pool={pool[0]},{pool[1]}"
            return bundle.fn(f"fused:{capacity}:{Cb}{suffix}")(
                bundle.params, style_mat, melody_mat, rhythm_mat, *job_rows)
    # meshless requests fetch through the packed-record pool (bytes scale
    # with observed totals); sharded meshes keep the per-job row layout so
    # every shard's output rows stream from their own chip (see POOL_TIERS)
    use_pool = bundle.mesh is None and bundle.use_record_pool

    def pools_for(sum_p, sum_u):
        if max(sum_p, sum_u) > POOL_TIERS[-1]:
            return None  # beyond the top tier: fall back to per-job rows
        return (_pick_pool_tier(max(sum_p, 1)),
                _pick_pool_tier(max(sum_u, 1)))

    pool = pools_for(bundle.pool_hint_p or B * 2048,
                     bundle.pool_hint_u or B * 512) if use_pool else None
    # start at the sticky hint: once a batch needed a bigger tier, later
    # batches skip the doomed small-tier dispatch (escalation re-runs the
    # whole program, so a wrong guess costs a full round trip)
    ladder = [c for c in COMPACT_CAPACITIES if c >= bundle.capacity_hint] \
        or [COMPACT_CAPACITIES[-1]]
    for capacity in ladder:
        while True:
            buf_dev = dispatch(job_rows, capacity, False, pool)
            if host_work is not None:
                host_work()      # overlaps the async device dispatch above
                host_work = None
            buf = np.asarray(buf_dev)
            hdr = _header_table(buf, B, Cb, pool)
            count_p, count_u = int(hdr[:, 4].max()), int(hdr[:, 5].max())
            live_p, live_u = int(hdr[:, 6].max()), int(hdr[:, 7].max())
            sum_p, sum_u = int(hdr[:, 4].sum()), int(hdr[:, 5].sum())
            if not _fits(capacity, count_p, count_u, live_p, live_u):
                break            # escalate the capacity tier
            if pool is not None and (sum_p > pool[0] or sum_u > pool[1]):
                # records fit the routing capacity but overflowed the fetch
                # pool; the header sums are exact, so one re-dispatch at the
                # right tier always succeeds
                pool = pools_for(sum_p, sum_u)
                continue
            # remember the smallest tier the observed counts FIT in (not the
            # tier used): the hint may step back down, so one dense batch
            # doesn't permanently inflate every later fetch to the top tier
            # (a too-small guess costs one extra dispatch; a too-big sticky
            # hint would cost every future fetch)
            bundle.capacity_hint = next(
                c for c in COMPACT_CAPACITIES
                if _fits(c, count_p, count_u, live_p, live_u))
            if use_pool:
                bundle.pool_hint_p, bundle.pool_hint_u = sum_p, sum_u
            return buf, capacity, pool
    capacity = COMPACT_CAPACITIES[-1]
    if count_p <= capacity and count_u <= capacity // 4:
        # records fit but the live-BLOCK routing table overflowed (a
        # pathologically spread roll: ~1 note per 128-cell block); run
        # the density-independent dense-compaction escape hatch
        while True:
            buf = np.asarray(dispatch(job_rows, capacity, True, pool))
            # an overflowed routing table TRUNCATES the block ladder's
            # reported counts (the live-block prefix under-reports), so the
            # pre-dense check above is optimistic; the dense compaction's
            # header carries the TRUE counts — re-check them so the decode's
            # [:count] slice can never silently cap at capacity (and so the
            # pool, sized from under-reported sums, grows to the real total)
            hdr = _header_table(buf, B, Cb, pool)
            count_p, count_u = int(hdr[:, 4].max()), int(hdr[:, 5].max())
            sum_p, sum_u = int(hdr[:, 4].sum()), int(hdr[:, 5].sum())
            if pool is None or (sum_p <= pool[0] and sum_u <= pool[1]):
                break
            pool = pools_for(sum_p, sum_u)
    if count_p > capacity or count_u > capacity // 4:
        raise OverflowError(
            f"style application produced {count_p} pitched / {count_u} "
            f"unpitched notes, beyond the largest compaction capacity "
            f"{COMPACT_CAPACITIES[-1]}; the device compaction already "
            f"dropped records, so decoding would silently lose notes")
    if use_pool and pool is not None:
        bundle.pool_hint_p, bundle.pool_hint_u = sum_p, sum_u
    return buf, capacity, pool


def _apply_batch(bundle: ModelBundle, infos, style_mat, melody_mat,
                 rhythm_mat, style_idx, comp_idx, n_instruments_list,
                 save_paths, n_bars_list, host_work=None) -> None:
    """Run the fused apply program for B jobs and decode each returned buffer
    to its .mid file."""
    Rb, T = rhythm_mat.shape[1], rhythm_mat.shape[2]
    Cb = _bucket(max(max(n_instruments_list), 1), CHANNEL_BUCKETS)
    buf, capacity, pool = run_fused_jobs(
        bundle, infos, style_mat, melody_mat, rhythm_mat, style_idx, comp_idx,
        n_instruments_list, n_bars_list, Cb, host_work=host_work)
    views = unpack_job_records(buf, len(infos), Cb, capacity, pool)
    for b, view in enumerate(views):
        _decode_packed_job(infos[b], *view, Cb, Rb, T, save_paths[b])


def _apply_batch_fused(bundle: ModelBundle, infos, ext_args, ext_statics,
                       style_idx, comp_idx, n_instruments_list, save_paths,
                       n_bars_list, host_work=None) -> None:
    """Single-dispatch variant of _apply_batch: the device program computes
    the latents (raster + extract) AND the batched apply in one jit call
    (_fused_transfer_full). Shares run_fused_jobs' escalation ladder via the
    dispatch override, so capacity hints and the dense escape hatch behave
    identically to the two-dispatch path."""
    Rb, T = ext_statics["Rb"], ext_statics["T"]
    CbA = _bucket(max(max(n_instruments_list), 1), CHANNEL_BUCKETS)

    def dispatch(job_rows, capacity, dense, pool):
        suffix = ":dense" if dense else ""
        if pool is not None:
            suffix += f":pool={pool[0]},{pool[1]}"
        return bundle.fn(f"transfer_fused:{capacity}:{CbA}{suffix}")(
            bundle.params, ext_args, *job_rows, **ext_statics)

    buf, capacity, pool = run_fused_jobs(
        bundle, infos, None, None, None, style_idx, comp_idx,
        n_instruments_list, n_bars_list, CbA, host_work=host_work,
        dispatch=dispatch)
    views = unpack_job_records(buf, len(infos), CbA, capacity, pool)
    for b, view in enumerate(views):
        _decode_packed_job(infos[b], *view, CbA, Rb, T, save_paths[b])


def _decode_packed_job(info: SongInfo, header: np.ndarray, picked_all,
                       rec_p: np.ndarray, rec_u: np.ndarray, Cb: int, Rb: int,
                       T: int, save_path: str) -> None:
    """Decode one job's fused-apply records (one ``unpack_job_records`` view)
    to a .mid file."""
    from mst_tpu.ops.rasterize import QNotes

    info.tempo = bpm2tempo(int(header[0]))
    info.scale = Scale(tonic=info.scale.tonic, is_minor=bool(header[1] == 1))
    rasterizer = Rasterizer(info)
    n_picked = int(header[2])
    has_unpitched = bool(header[3])
    picked = picked_all[:n_picked]
    instruments = [category_instrument(int(i)) for i in picked]

    def unpack(recs, shape, n_channels):
        c, bar, beat, frac, note = np.unravel_index(
            recs[:, 0].astype(np.int64), shape)
        dur = (recs[:, 1] >> 16) & 0xFFFF
        vel = (recs[:, 1] >> 8) & 0xFF
        acc = recs[:, 1] & 0xFF
        out = []
        for ci in range(n_channels):
            sel = c == ci
            out.append(QNotes(
                bar=bar[sel].astype(np.int64),
                beat=beat[sel].astype(np.int64),
                frac_idx=frac[sel].astype(np.int32),
                note_idx=note[sel].astype(np.int32),
                duration=dur[sel].astype(np.int64),
                velocity=vel[sel].astype(np.float64) / 127.0,
                acc=acc[sel].astype(np.int32)))
        return out

    qnotes_p = unpack(rec_p, (Cb, Rb, T, 10, 56), n_picked)
    instruments_data = []
    channel_ids = _free_channels(n_picked)
    for c in range(n_picked):
        instruments_data.append({
            "channel_id": channel_ids[c],
            "instrument_id": int(instruments[c]),
            "messages": rasterizer.qnotes_to_messages(qnotes_p[c], True),
        })
    if has_unpitched:
        qnotes_u = unpack(rec_u, (1, Rb, T, 10, 47), 1)
        instruments_data.append({
            "channel_id": 9, "instrument_id": -1,
            "messages": rasterizer.qnotes_to_messages(qnotes_u[0], False),
        })
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    mid = create_midi(rasterizer.info.as_create_midi_info(),
                      *instruments_data, max_delta_time=1)
    native.write_midi_file(save_path, mid)


def combine_info(style_info: SongInfo, melody_info: SongInfo) -> SongInfo:
    """Melody song's timing + style song's scale/tempo
    (parity: style_transfer.py:134-142 — the combined info has no duration, so
    decode falls back to last-message-time + one bar)."""
    return dataclasses.replace(melody_info, tempo=style_info.tempo,
                               scale=style_info.scale, duration=None)


def transfer_and_evaluate(bundle: ModelBundle, composition_path, style_paths,
                          output_path) -> dict:
    """End-to-end transfer + rendered-audio spectral eval (BASELINE.json
    configs[4]): run transfer_style, render every output natively, and score
    each generated file's log-mel similarity against both its composition and
    its style source. Returns {output_path: {"vs_composition": s,
    "vs_style": s}} for the generated (non-original) files."""
    from mst_tpu.audio import spectral_similarity_midi

    written = transfer_style(bundle, composition_path, style_paths,
                             output_path)
    comp_data = load_midi_from_file(composition_path)
    style_data = {os.path.splitext(os.path.basename(str(p)))[0]:
                  load_midi_from_file(p) for p in style_paths}
    from mst_tpu.exceptions import MidiFormatError

    def score(a, b):
        try:
            return spectral_similarity_midi(a, b)
        except MidiFormatError:  # a silent output renders no audio
            return None

    scores = {}
    for path in written:
        if os.sep + "original" + os.sep in path:
            continue
        data = load_midi_from_file(path)
        entry = {"vs_composition": score(comp_data, data)}
        for name, sdata in style_data.items():
            if f"({name} style)" in os.path.basename(path):
                entry["vs_style"] = score(sdata, data)
        scores[path] = entry
    return scores


def transfer_style(bundle: ModelBundle, composition_path, style_paths,
                   output_path) -> List[str]:
    """Parity: style_transfer.py:22-54. Returns the written file paths."""
    return transfer_styles(bundle, [composition_path], style_paths,
                           output_path)


def transfer_styles(bundle: ModelBundle, composition_paths, style_paths,
                    output_path) -> List[str]:
    """Batched transfer_style over many compositions (same per-song outputs
    and file layout, identical semantics per style_transfer.py:22-54).

    TPU-first batching: ALL compositions and style songs are latent-extracted
    in grouped batched dispatches, and all (reconstructed + styled) apply jobs
    of a shape group run as ONE fused device program + one fetch — the
    per-song dispatch overhead of the remote link is amortized across the
    whole workload."""
    all_paths = list(composition_paths) + list(style_paths)
    if not all_paths:
        return []
    loaded = list(ingest_map(get_model_input, all_paths))
    bad = [p for p, s in zip(all_paths, loaded) if s is None]
    if bad:
        raise MidiFormatError(
            f"could not load {len(bad)} input file(s): {bad}")
    songs = [s for _, s in loaded]
    comps = songs[:len(composition_paths)]
    style_songs = songs[len(composition_paths):]
    group_keys = {(s.info.n_beats, s.unpitched_shape is not None) for s in songs}
    # when every song shares one extraction bucket, the WHOLE request runs as
    # a single device program (extraction + apply, _fused_transfer_full): one
    # dispatch + one fetch total instead of one extraction dispatch plus the
    # apply dispatch — the dominant cost of small/single-song requests is the
    # per-dispatch round trip, not compute
    fuse = bundle.fuse_requests and len(group_keys) == 1
    if fuse:
        T, has_unpitched = next(iter(group_keys))
        ext_args, ext_statics, Rs = _extract_inputs(
            bundle, songs, T, has_unpitched)
        batches = None
        comp_loc = [(0, i) for i in range(len(comps))]
        style_loc = [(0, len(comps) + j) for j in range(len(style_songs))]

        def style_row(loc):
            return loc[1]

        def bars_of(g, row):
            return Rs[row]
    else:
        batches, locators = extract_styles(bundle, comps + style_songs)
        comp_loc = locators[:len(comps)]
        style_loc = locators[len(comps):]

        # global style-vector matrix: batch g's rows start at style_offset[g]
        style_offset = np.cumsum([0] + [b.style.shape[0] for b in batches])
        style_mat = (batches[0].style if len(batches) == 1 else
                     jnp.concatenate([b.style for b in batches], axis=0))

        def style_row(loc):
            return int(style_offset[loc[0]]) + loc[1]

        def bars_of(g, row):
            return batches[g].n_bars[row]

    written_per_comp = [[] for _ in comps]
    names = [os.path.splitext(os.path.basename(str(p)))[0]
             for p in composition_paths]
    style_names = [os.path.splitext(os.path.basename(str(p)))[0]
                   for p in style_paths]

    def decode_originals():
        """Host-side decode of the ingested tensors to the original/ files —
        deferred so it overlaps the fused apply's device compute."""
        style_original_bytes = [None] * len(style_songs)
        for i, comp in enumerate(comps):
            out_dir = os.path.join(str(output_path), names[i])
            original = os.path.join(out_dir, f"original/{names[i]}.mid")
            save_channels(Rasterizer(comp.info), comp.pitched, comp.unpitched,
                          comp.instruments, original)
            for j, style_song in enumerate(style_songs):
                path = os.path.join(out_dir, f"original/{style_names[j]}.mid")
                if style_original_bytes[j] is None:
                    # decode each style original ONCE; later comps copy bytes
                    save_channels(Rasterizer(style_song.info),
                                  style_song.pitched, style_song.unpitched,
                                  style_song.instruments, path)
                    with open(path, "rb") as fh:
                        style_original_bytes[j] = fh.read()
                else:
                    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                    with open(path, "wb") as fh:
                        fh.write(style_original_bytes[j])

    for i in range(len(comps)):
        written_per_comp[i].append(os.path.join(
            str(output_path), names[i], f"original/{names[i]}.mid"))

    # apply jobs, grouped by the composition's latent batch (shared Rb/T)
    jobs_per_group = {}
    for i, comp in enumerate(comps):
        g, row = comp_loc[i]
        out_dir = os.path.join(str(output_path), names[i])
        jobs = jobs_per_group.setdefault(g, [])
        reconstructed = os.path.join(out_dir,
                                     f"{names[i]} (reconstructed).mid")
        jobs.append((style_row(comp_loc[i]), row, comp.info,
                     len(comp.instruments), bars_of(g, row),
                     reconstructed))
        written_per_comp[i].append(reconstructed)
        for j, style_song in enumerate(style_songs):
            info = combine_info(style_info=style_song.info,
                                melody_info=comp.info)
            path = os.path.join(
                out_dir, f"{names[i]} ({style_names[j]} style).mid")
            jobs.append((style_row(style_loc[j]), row, info,
                         len(style_song.instruments),
                         bars_of(g, row), path))
            written_per_comp[i].append(
                os.path.join(out_dir, f"original/{style_names[j]}.mid"))
            written_per_comp[i].append(path)

    host_work = decode_originals
    for g, jobs in jobs_per_group.items():
        s_idx, c_idx, infos, n_inst, bars, paths = zip(*jobs)
        if fuse:
            _apply_batch_fused(bundle, list(infos), ext_args, ext_statics,
                               list(s_idx), list(c_idx), list(n_inst),
                               list(paths), list(bars), host_work=host_work)
        else:
            _apply_batch(bundle, list(infos), style_mat, batches[g].melody,
                         batches[g].rhythm, list(s_idx), list(c_idx),
                         list(n_inst), list(paths), list(bars),
                         host_work=host_work)
        host_work = None
    if host_work is not None:  # no apply jobs at all
        host_work()
    return [p for per_comp in written_per_comp for p in per_comp]
