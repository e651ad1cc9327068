"""On-device rasterization: SoA note coords -> dense piano-roll, on the chip.

The north-star data path (BASELINE.json): the host parses/quantizes MIDI
(exact float64 grid math, mst_tpu.ops.quantize) and ships only the quantized
note records — (cell row, note index, accidental, duration, velocity), a few
hundred KB — while the dense (channel, bar, beat, fraction, note, feature)
tensor is materialized **on device**. This removes the dominant host->HBM
transfer (a full song's padded raster is ~46 MB; its notes are ~100 KB).

Two implementations with identical semantics (scatter-max, zero base):

- :func:`segment_rasterize` — pure jnp via ``.at[].max`` scatter; jit/vmap
  friendly; the default off-TPU and the correctness reference.
- :func:`pallas_rasterize` — a Pallas TPU kernel (mst_tpu.ops.pallas_raster)
  that keeps a row-chunk of the raster in VMEM and applies each note as a
  full-lane vector max; notes are pre-sorted by row so each grid program
  touches only its chunk's notes (scalar-prefetched boundaries). The TPU
  default: device-profiled ~2x faster than the jnp scatter at train shapes
  (see :func:`_rasterize_flat`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops.rasterize import QNotes, Rasterizer


@dataclasses.dataclass
class DeviceNotes:
    """Host-prepared note records for device rasterization (all (N,) arrays,
    padded to a static length with ``valid``)."""

    row: np.ndarray       # int32, flattened (channel, bar, beat, frac) cell
    note_idx: np.ndarray  # int32, raster note row (0..n_notes)
    acc: np.ndarray       # int32, accidental code (pitched) or 0
    duration: np.ndarray  # float32, beats
    velocity: np.ndarray  # float32
    valid: np.ndarray     # bool

    def __len__(self):
        return self.row.shape[0]


def _pad_to(n: int, buckets=(512, 2048, 8192, 32768, 131072)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def encode_notes(rasterizer: Rasterizer, q: QNotes, channel_index: int,
                 pitched: bool, n_channels: int, n_bars: int,
                 valid_bars: Optional[int] = None,
                 sort: bool = True) -> DeviceNotes:
    """QNotes (one channel) -> flattened device records.

    Cell row = ((c * n_bars + bar) * n_beats + beat) * n_fractions + frac.
    ``n_bars`` is the (possibly padded) raster layout; ``valid_bars`` caps the
    bars actually written (the reference's prepare_input truncation,
    style/data.py:136-143). Out-of-range notes (the reference's ValueError
    skip, midi_conversion.py:495-498) are marked invalid.
    """
    T = rasterizer.info.n_beats
    F10 = rasterizer.grid.n_fractions
    n_notes = rasterizer.n_notes(pitched)
    valid = (q.note_idx >= 0) & (q.note_idx < n_notes)
    valid &= (q.bar >= 0) & (q.bar < min(n_bars, valid_bars if valid_bars
                                         is not None else n_bars))
    row = ((channel_index * n_bars + q.bar) * T + q.beat) * F10 + q.frac_idx
    # invalid notes get a sentinel row: they sort to the end and fall outside
    # every Pallas row-chunk range
    row = np.where(valid, row, 2 ** 30)
    duration = (q.duration / rasterizer.info.ticks_per_beat).astype(np.float32)
    out = DeviceNotes(
        row=row.astype(np.int32), note_idx=q.note_idx.astype(np.int32),
        acc=q.acc.astype(np.int32), duration=duration,
        velocity=q.velocity.astype(np.float32), valid=np.asarray(valid))
    if sort:
        order = np.argsort(out.row, kind="stable")
        out = DeviceNotes(*(a[order] for a in
                            (out.row, out.note_idx, out.acc, out.duration,
                             out.velocity, out.valid)))
    return out


def concat_and_pad(parts, pad_len: Optional[int] = None) -> DeviceNotes:
    """Concatenate per-channel DeviceNotes and pad to a bucketed static length."""
    row = np.concatenate([p.row for p in parts]) if parts else np.zeros(0, np.int32)
    note = np.concatenate([p.note_idx for p in parts]) if parts else row
    acc = np.concatenate([p.acc for p in parts]) if parts else row
    dur = np.concatenate([p.duration for p in parts]) if parts else \
        np.zeros(0, np.float32)
    vel = np.concatenate([p.velocity for p in parts]) if parts else dur
    valid = np.concatenate([p.valid for p in parts]) if parts else \
        np.zeros(0, bool)
    order = np.argsort(row, kind="stable")
    row, note, acc, dur, vel, valid = (a[order] for a in
                                       (row, note, acc, dur, vel, valid))
    n = _pad_to(len(row)) if pad_len is None else pad_len
    pad = n - len(row)
    if pad < 0:
        raise ValueError("pad_len smaller than note count")
    return DeviceNotes(
        row=np.pad(row, (0, pad), constant_values=2 ** 30).astype(np.int32),
        note_idx=np.pad(note, (0, pad)).astype(np.int32),
        acc=np.pad(acc, (0, pad)).astype(np.int32),
        duration=np.pad(dur, (0, pad)).astype(np.float32),
        velocity=np.pad(vel, (0, pad)).astype(np.float32),
        valid=np.pad(valid, (0, pad)),
    )


def segment_rasterize(row, note_idx, acc, duration, velocity, valid,
                      n_rows: int, n_notes: int, n_feat: int,
                      out_dtype=jnp.float32):
    """jnp scatter-max rasterization -> (n_rows, n_notes * n_feat).

    Semantics identical to the host Rasterizer.rasterize scatter
    (midi_conversion.py:490-516): zero base, elementwise max on collision,
    accidental one-hot for pitched (n_feat == 5).

    ``out_dtype``: raster element type. Scattering directly at the training
    storage dtype (bfloat16) halves the raster's HBM write AND the train
    step's read of it; because round-to-nearest is monotone, casting the
    values before the max equals casting the fp32 scatter's result — the
    training path sees bit-identical tensors either way. The transfer path
    keeps fp32 (its packed wire formats are proven against the fp32 raster).
    """
    out_dtype = jnp.dtype(out_dtype)
    lane0 = note_idx * n_feat
    neg = jnp.asarray(-jnp.inf, out_dtype)
    vmask = valid

    def scatter(col, val):
        val = jnp.where(vmask, val.astype(out_dtype), neg)
        col = jnp.where(vmask, col, 0)
        r = jnp.where(vmask, row, 0)
        return (r, col), val

    out = jnp.zeros((n_rows, n_notes * n_feat), out_dtype)
    (r, c), v = scatter(lane0, duration)
    out = out.at[r, c].max(v)
    (r, c), v = scatter(lane0 + 1, velocity)
    out = out.at[r, c].max(v)
    if n_feat == 5:
        (r, c), v = scatter(lane0 + 2 + acc, jnp.ones_like(duration))
        out = out.at[r, c].max(v)
    return out


def device_rasterize_song(rasterizer: Rasterizer, note_arrays, pitched: bool,
                          n_channels: int, n_bars: Optional[int] = None,
                          valid_bars: Optional[int] = None,
                          use_pallas: Optional[bool] = None,
                          out_dtype=jnp.float32,
                          fuse_nf: bool = False) -> jnp.ndarray:
    """Full device-side rasterization of a song's channels.

    ``note_arrays``: list of (channel NoteArray) pairs already merged per
    instrument. Returns a device array (C, n_bars, T, F10, n_notes, F).
    ``n_bars`` defaults to the rasterizer's n_bars+1 (the quantization spill
    bar, parity midi_conversion.py:492-493).

    ``fuse_nf``: keep the (note, feature) axes fused as one (n_notes*n_feat,)
    minor axis — (C, n_bars, T, F10, NF). The reshape to either shape happens
    INSIDE the jitted raster program (a leading-dim split of the scatter's
    (rows, lanes) output, free); materializing the 7-axis layout used to run
    as a standalone eager reshape costing ~1.8 ms of relayout per build on
    the v5e. Consumers split NF back lazily via ops.shapes.split_note_features
    inside their own programs.
    """
    T = rasterizer.info.n_beats
    F10 = rasterizer.grid.n_fractions
    n_notes = rasterizer.n_notes(pitched)
    n_feat = rasterizer.n_features(pitched)
    if n_bars is None:
        n_bars = rasterizer.n_bars + 1
    parts = []
    for c, notes in enumerate(note_arrays):
        q = rasterizer.quantize(notes, pitched)
        parts.append(encode_notes(rasterizer, q, c, pitched, n_channels,
                                  n_bars, valid_bars))
    dn = concat_and_pad(parts)
    n_rows = n_channels * n_bars * T * F10

    tail = (n_notes * n_feat,) if fuse_nf else (n_notes, n_feat)
    return _rasterize_flat(dn, n_rows, n_notes, n_feat, use_pallas, out_dtype,
                           out_shape=(n_channels, n_bars, T, F10) + tail)


def device_rasterize_batch(rasterizers, note_arrays_per_song, pitched: bool,
                           n_channels: int, n_bars: int,
                           valid_bars, use_pallas: Optional[bool] = None,
                           out_dtype=jnp.float32,
                           fuse_nf: bool = False) -> jnp.ndarray:
    """Batched device rasterization: B songs' channels in ONE scatter dispatch.

    Each song keeps its own Rasterizer (its own tick grid / scale); batch index
    b folds into the flattened cell row as ``b * n_channels + c`` leading
    channel blocks, so a single (B*C*R*T*F10)-row scatter materializes the
    whole (B, C, R, T, F10, N, F) batch on device. All songs must share the
    beats-per-bar count (the batch tensor has one T axis; the caller groups by
    time signature). ``valid_bars``: per-song bar caps.
    """
    B = len(rasterizers)
    T = rasterizers[0].info.n_beats
    assert all(r.info.n_beats == T for r in rasterizers), \
        "batched songs must share beats-per-bar"
    F10 = rasterizers[0].grid.n_fractions
    n_notes = rasterizers[0].n_notes(pitched)
    n_feat = rasterizers[0].n_features(pitched)
    parts = []
    for b, (rast, note_arrays) in enumerate(zip(rasterizers,
                                                note_arrays_per_song)):
        for c, notes in enumerate(note_arrays[:n_channels]):
            q = rast.quantize(notes, pitched)
            parts.append(encode_notes(rast, q, b * n_channels + c, pitched,
                                      B * n_channels, n_bars, valid_bars[b]))
    dn = concat_and_pad(parts)
    n_rows = B * n_channels * n_bars * T * F10

    tail = (n_notes * n_feat,) if fuse_nf else (n_notes, n_feat)
    return _rasterize_flat(dn, n_rows, n_notes, n_feat, use_pallas, out_dtype,
                           out_shape=(B, n_channels, n_bars, T, F10) + tail)


def device_rasterize_batch_sharded(mesh, rasterizers, note_arrays_per_song,
                                   pitched: bool, n_channels: int,
                                   n_bars: int, valid_bars,
                                   use_pallas: Optional[bool] = None,
                                   out_dtype=jnp.float32,
                                   fuse_nf: bool = False,
                                   data_axis: str = "data") -> jnp.ndarray:
    """device_rasterize_batch where the raster is BORN sharded over the mesh's
    ``data`` axis: each device scatters only its local songs' notes via a
    shard_map'd kernel (Pallas on TPU, jnp scatter elsewhere), so a multi-chip
    batch never materializes on one chip and never crosses ICI.

    Semantics identical to device_rasterize_batch (bit-equal output,
    tests/test_train_parallel.py); requires ``len(songs) %
    mesh.shape[data_axis] == 0``. Other mesh axes (seq) receive replicated
    inputs and compute replicated outputs."""
    from mst_tpu.ops.pallas_raster import (
        MAX_PALLAS_NOTES, ROW_CHUNK, SENTINEL_ROW, _pallas_call, _round_up)
    from jax.sharding import PartitionSpec as P

    ndev = mesh.shape[data_axis]
    B = len(rasterizers)
    if B % ndev != 0:
        raise ValueError(f"batch {B} not divisible by {data_axis}={ndev}")
    B_loc = B // ndev
    T = rasterizers[0].info.n_beats
    assert all(r.info.n_beats == T for r in rasterizers), \
        "batched songs must share beats-per-bar"
    F10 = rasterizers[0].grid.n_fractions
    n_notes = rasterizers[0].n_notes(pitched)
    n_feat = rasterizers[0].n_features(pitched)

    shard_parts = []
    for s in range(ndev):
        parts = []
        for b in range(B_loc):
            g = s * B_loc + b
            for c, notes in enumerate(note_arrays_per_song[g][:n_channels]):
                q = rasterizers[g].quantize(notes, pitched)
                parts.append(encode_notes(
                    rasterizers[g], q, b * n_channels + c, pitched,
                    B_loc * n_channels, n_bars, valid_bars[g]))
        shard_parts.append(parts)
    pad_len = _pad_to(max((sum(len(p) for p in parts)
                           for parts in shard_parts), default=0))
    shards = [concat_and_pad(parts, pad_len) for parts in shard_parts]

    n_rows_loc = B_loc * n_channels * n_bars * T * F10
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and pad_len <= MAX_PALLAS_NOTES)
    interpret = jax.default_backend() == "cpu"

    # host-side preprocessing per shard (exactly pallas_rasterize's), stacked
    # to a leading device axis the shard_map splits
    rows = np.stack([np.where(d.valid, d.row, SENTINEL_ROW).astype(np.int32)
                     for d in shards])
    lane0 = np.stack([(d.note_idx * n_feat).astype(np.int32) for d in shards])
    acc_lane = (lane0 + 2 + np.stack([d.acc for d in shards])
                ).astype(np.int32) if n_feat == 5 else \
        np.full_like(lane0, -1)
    note_idx = np.stack([d.note_idx.astype(np.int32) for d in shards])
    acc = np.stack([d.acc.astype(np.int32) for d in shards])
    dur = np.stack([np.asarray(d.duration, np.float32) for d in shards])
    vel = np.stack([np.asarray(d.velocity, np.float32) for d in shards])
    valid = np.stack([np.asarray(d.valid) for d in shards])
    padded_rows = _round_up(max(n_rows_loc, 1), ROW_CHUNK)
    edges = np.arange(0, padded_rows + 1, ROW_CHUNK)
    bounds = np.stack([np.searchsorted(r, edges, side="left").astype(np.int32)
                       for r in rows])

    tail = (n_notes * n_feat,) if fuse_nf else (n_notes, n_feat)
    local_shape = (B_loc, n_channels, n_bars, T, F10) + tail
    out_dtype = jnp.dtype(out_dtype)

    def local(bounds_, rows_, lane0_, accl_, note_, acc_, dur_, vel_, valid_):
        a = [x[0] for x in (bounds_, rows_, lane0_, accl_, note_, acc_,
                            dur_, vel_, valid_)]
        if use_pallas:
            return _pallas_call(a[0], a[1], a[2], a[3], a[6], a[7],
                                n_rows=n_rows_loc, n_notes=n_notes,
                                n_feat=n_feat, interpret=interpret,
                                out_dtype=out_dtype,
                                out_shape=local_shape)[None]
        out = segment_rasterize(a[1], a[4], a[5], a[6], a[7], a[8],
                                n_rows_loc, n_notes, n_feat, out_dtype)
        return out.reshape(local_shape)[None]

    # the leading stacked axis IS the data axis: each shard sees a (1, …)
    # block, computes its (1, B_loc, …) raster slice, and the outputs
    # concatenate into (ndev, B_loc, …) — reshaped to the global batch below
    in_spec = P(data_axis, None)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec,) * 9,
        out_specs=P(data_axis, *([None] * len(local_shape))),
        check_vma=False)
    out = fn(jnp.asarray(bounds), jnp.asarray(rows), jnp.asarray(lane0),
             jnp.asarray(acc_lane), jnp.asarray(note_idx), jnp.asarray(acc),
             jnp.asarray(dur), jnp.asarray(vel), jnp.asarray(valid))
    return out.reshape((B,) + local_shape[1:])


def _rasterize_flat(dn, n_rows: int, n_notes: int, n_feat: int,
                    use_pallas: Optional[bool],
                    out_dtype=jnp.float32,
                    out_shape: Optional[tuple] = None) -> jnp.ndarray:
    """Route to the Pallas kernel (TPU, note count within its VMEM budget) or
    the bit-identical jnp scatter path. The Pallas kernel's (n, 1) VMEM note
    blocks lane-pad 128x (Mosaic supports dynamic indexing only on sublanes),
    so beyond MAX_PALLAS_NOTES it compile-time-OOMs the 16 MB scoped VMEM —
    big note batches take the scatter, whose cost scales with n anyway.

    Measurement note (v5e, 2026-08, jax.profiler — wall-clock timing through
    this container's tunnel measures enqueue, not the device): at the bench
    bucket (2048-note pad, rows=41280, bf16) the kernel's device time is
    0.17 ms vs the jnp scatter's 0.33 ms, so the kernel stays the TPU
    default. The dominant cost of a raster build is neither — it was the
    EAGER reshape of the program's (rows, lanes) output into the dense
    7-axis layout (1.8 ms of relayout), which is why the reshape now happens
    inside the program (``out_shape``) and batch producers keep the (note,
    feature) axes fused (``fuse_nf``)."""
    from mst_tpu.ops.pallas_raster import MAX_PALLAS_NOTES, pallas_rasterize

    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and dn.row.shape[0] <= MAX_PALLAS_NOTES)
    if use_pallas:
        return pallas_rasterize(dn, n_rows, n_notes, n_feat,
                                out_dtype=out_dtype, out_shape=out_shape)
    return _jit_segment(dn.row, dn.note_idx, dn.acc, dn.duration,
                        dn.velocity, dn.valid, n_rows, n_notes, n_feat,
                        jnp.dtype(out_dtype), out_shape)


from functools import partial


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _jit_segment(row, note_idx, acc, duration, velocity, valid,
                 n_rows, n_notes, n_feat, out_dtype=jnp.float32,
                 out_shape=None):
    out = segment_rasterize(
        jnp.asarray(row), jnp.asarray(note_idx), jnp.asarray(acc),
        jnp.asarray(duration), jnp.asarray(velocity), jnp.asarray(valid),
        n_rows, n_notes, n_feat, out_dtype)
    return out if out_shape is None else out.reshape(out_shape)
