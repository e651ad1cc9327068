"""Pallas TPU kernel: scatter-max rasterization of note records.

The dense piano-roll lives in HBM as (rows, lanes) = (channel*bar*beat*frac,
note*feature padded to 128); the kernel processes one CHUNK of rows per grid
program with that chunk resident in VMEM, applying each note as a single
full-lane vector max (VPU-friendly — no per-element scatter):

    vec = where(lane == lane0,     duration,
          where(lane == lane0 + 1, velocity,
          where(lane == acc_lane,  1.0, -inf)))
    out[row] = max(out[row], vec)

Notes arrive sorted by row; per-chunk note ranges are scalar-prefetched so a
program only loops over its own notes (PrefetchScalarGridSpec). Padding/invalid
notes carry a sentinel row beyond every chunk and are never touched.

The note arrays live in VMEM as (n, 1) blocks: Mosaic only supports dynamic
indexing on sublanes, so the minor (lane) dim must stay 1 — which VMEM pads
1 -> 128 (128x). That caps the note count the kernel can hold: above
``MAX_PALLAS_NOTES`` the scoped-VMEM budget blows (compile-time OOM at 32k
notes on the v5e) and callers route to the bit-identical jnp scatter path
(ops.device_raster.segment_rasterize) instead.

Measured head-to-head on the v5e (2026-08, jax.profiler device timeline —
wall-clock through this container's tunnel measures enqueue, not device):
at the train bucket (2048-note pad, rows=41280, bf16) this kernel runs in
0.17 ms vs 0.33 ms for XLA's scatter-max lowering, so it stays the TPU
default (ops.device_raster._rasterize_flat routes here).

Collision semantics are identical to the host scatter
(midi_conversion.py:490-516) and to ops.device_raster.segment_rasterize, which
is the cross-checked reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_CHUNK = 512
SENTINEL_ROW = 2 ** 30
# (n,1) VMEM blocks lane-pad 128x (a 16384-note array = ~8.4 MB). The cap is
# EMPIRICAL: 16384 notes compile and run on the v5e (shipped in the round-2
# training campaigns); 32768 fails compile with a coalesced 32 MB scoped-VMEM
# stack allocation against a 16 MB limit — the compiler evidently does not
# keep all five buffers resident at once, so don't retune this from
# first-principles budget math; bisect on hardware instead.
MAX_PALLAS_NOTES = 16384


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(bounds_ref, rows_ref, lane0_ref, accl_ref, dur_ref, vel_ref,
            out_ref, acc_ref):
    j = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    start = bounds_ref[j]
    end = bounds_ref[j + 1]
    lanes = acc_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    base = j * ROW_CHUNK
    neg = jnp.float32(-jnp.inf)

    def body(i, _):
        row = rows_ref[i, 0] - base
        l0 = lane0_ref[i, 0]
        la = accl_ref[i, 0]
        d = dur_ref[i, 0]
        v = vel_ref[i, 0]
        vec = jnp.where(lane == l0, d,
                        jnp.where(lane == l0 + 1, v,
                                  jnp.where(lane == la, 1.0, neg)))
        cur = acc_ref[pl.ds(row, 1), :]
        acc_ref[pl.ds(row, 1), :] = jnp.maximum(cur, vec)
        return 0

    jax.lax.fori_loop(start, end, body, 0)
    # accumulate in an fp32 VMEM scratch and cast ONCE on the full-block
    # write: Mosaic rejects dynamic sublane stores into a bf16 block (it
    # cannot prove the 8-sublane alignment a packed dtype needs), and
    # fp32-max-then-cast is exactly the semantics segment_rasterize proves
    # equal to casting before the max
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "n_notes", "n_feat",
                                    "interpret", "out_dtype", "out_shape"))
def _pallas_call(bounds, rows, lane0, acc_lane, duration, velocity,
                 n_rows: int, n_notes: int, n_feat: int,
                 interpret: bool = False, out_dtype=jnp.float32,
                 out_shape=None):
    lanes = _round_up(n_notes * n_feat, 128)
    padded_rows = _round_up(max(n_rows, 1), ROW_CHUNK)
    n_chunks = padded_rows // ROW_CHUNK
    n = rows.shape[0]

    note_spec = pl.BlockSpec((n, 1), lambda j, b: (0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[note_spec] * 5,
        out_specs=pl.BlockSpec((ROW_CHUNK, lanes), lambda j, b: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROW_CHUNK, lanes), jnp.float32)],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_rows, lanes),
                                       jnp.dtype(out_dtype)),
        interpret=interpret,
    )(bounds, rows.reshape(-1, 1), lane0.reshape(-1, 1),
      acc_lane.reshape(-1, 1), duration.reshape(-1, 1),
      velocity.reshape(-1, 1))
    out = out[:n_rows, :n_notes * n_feat]
    return out if out_shape is None else out.reshape(out_shape)


def pallas_rasterize(device_notes, n_rows: int, n_notes: int, n_feat: int,
                     interpret: bool = None,
                     out_dtype=jnp.float32, out_shape=None) -> jnp.ndarray:
    """DeviceNotes (sorted by row, sentinel-rowed padding) -> (n_rows,
    n_notes*n_feat) raster at ``out_dtype`` (fp32 default; bfloat16 for the
    training path's storage dtype — see segment_rasterize). ``out_shape``:
    reshape the result INSIDE the jitted program (see _rasterize_flat)."""
    dn = device_notes
    rows = np.where(dn.valid, dn.row, SENTINEL_ROW).astype(np.int32)
    lane0 = (dn.note_idx * n_feat).astype(np.int32)
    if n_feat == 5:
        acc_lane = (lane0 + 2 + dn.acc).astype(np.int32)
    else:
        acc_lane = np.full_like(lane0, -1)
    duration = np.asarray(dn.duration, np.float32)
    velocity = np.asarray(dn.velocity, np.float32)
    padded_rows = _round_up(max(n_rows, 1), ROW_CHUNK)
    edges = np.arange(0, padded_rows + 1, ROW_CHUNK)
    bounds = np.searchsorted(rows, edges, side="left").astype(np.int32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _pallas_call(
        jnp.asarray(bounds), jnp.asarray(rows), jnp.asarray(lane0),
        jnp.asarray(acc_lane), jnp.asarray(duration),
        jnp.asarray(velocity), n_rows=n_rows, n_notes=n_notes,
        n_feat=n_feat, interpret=bool(interpret),
        out_dtype=jnp.dtype(out_dtype),
        out_shape=None if out_shape is None else tuple(out_shape))
