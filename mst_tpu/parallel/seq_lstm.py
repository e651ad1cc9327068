"""Sequence-parallel LSTM: scan over a bar axis sharded across the ``seq``
mesh axis, with the recurrent carry handed between shards over ICI.

The reference avoids long sequences by truncating songs to <=800 bars
(train-model.py:101, SURVEY.md §5 "long-context"); this op removes that limit
the TPU way (SURVEY.md §2.4): each device holds R/n_shards bars of activations
(memory scales down with the mesh), computes its input projection in parallel
(the MXU-heavy part), and the inherently-serial recurrence pipelines across
shards — device s scans its chunk at pipeline stage s and passes the final
(h, c) to device s+1 via ``ppermute``.

Exactness: identical results to the dense single-device scan (tested on an
8-device CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mst_tpu.ops import precision


def _local_scan(gates_x, w_hh, carry):
    """gates_x: (T_local, N, 4H) precomputed input projections.

    ``w_hh`` is expected pre-cast by the caller when a bf16 compute dtype is
    active (precision.cast_operand), so the cast collective story under
    shard_map stays unchanged."""
    def step(c, gx):
        h, cc = c
        gates = gx + precision.matmul(h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(cc)
        return (h, cc), h
    return jax.lax.scan(step, carry, gates_x)


# the row-microbatched pipeline engages when every microbatch keeps at least
# this many rows; below it the per-scan-step fixed overhead dominates and the
# (2n-1)-stage pipeline would cost MORE wall-clock than the n-stage relay
MIN_ROWS_PER_MICROBATCH = 2


def seq_sharded_scan(gates_x, w_hh, mesh: Mesh, seq_axis: str = "seq",
                     reverse: bool = False):
    """The sharded LSTM recurrence alone: ``gates_x`` (B, T, 4H) are the
    already-projected inputs (x @ W_ih + b — computed globally so XLA shards
    the matmul); only the serial carry chain runs under shard_map, pipelined
    across the ``seq`` shards with ppermute carry handoff. ``reverse`` scans
    right-to-left (for the backward half of a BiLSTM): implemented as the
    forward pipeline over globally-flipped gates.

    Two schedules, bit-identical results (each row's op sequence is the same;
    only the batching partition differs):

    - **relay** (few rows): device s scans ALL rows of its T/n chunk at stage
      s — n stages, one device busy per stage. Total recurrence wall-clock
      equals the dense scan's; the win is memory (R/n activations per device)
      and the fully-parallel input projections.
    - **row-microbatched pipeline** (``B >= n * MIN_ROWS_PER_MICROBATCH``):
      the independent row dimension (callers flatten (batch, channel) into
      it) splits into n microbatches; device s runs microbatch m at stage
      s+m, so after an n-1-stage warm-up ALL devices scan concurrently and
      the recurrence wall-clock drops toward (2n-1)/n^2 of dense (about 2/n)
      when scan-step cost scales with rows.
    """
    if reverse:
        return seq_sharded_scan(gates_x[:, ::-1], w_hh, mesh, seq_axis)[:, ::-1]
    n_shards = mesh.shape[seq_axis]
    B, T, _ = gates_x.shape
    assert T % n_shards == 0, (T, n_shards)
    if B >= n_shards * MIN_ROWS_PER_MICROBATCH:
        return seq_sharded_scan_pipelined(gates_x, w_hh, mesh, seq_axis)
    H = w_hh.shape[0]

    def shard_fn(gates_local, w_hh):
        # gates_local: (B, T/n, 4H) on each device
        gates_x = jnp.swapaxes(gates_local, 0, 1)               # (T_l, B, 4H)
        me = jax.lax.axis_index(seq_axis)

        def varying(v):
            # mark as device-varying over the seq axis so the scan carry type
            # is consistent (values actually do diverge per shard)
            return jax.lax.pcast(v, (seq_axis,), to="varying")

        dtype = gates_local.dtype
        zero = (varying(jnp.zeros((B, H), dtype)),
                varying(jnp.zeros((B, H), dtype)))
        ys0 = varying(jnp.zeros((gates_x.shape[0], B, H), dtype))
        # pcast the replicated weights to varying HERE, outside the cond-gated
        # stages: the pcast transpose is a psum, and hoisting it means every
        # device executes that collective at the same point. Left implicit
        # inside the cond branch, only the active device would reach the psum
        # and the backward pass deadlocks.
        w_hh = varying(w_hh)

        # statically unrolled pipeline (n_shards is small and static): every
        # device executes the same linear sequence of collectives, which keeps
        # forward AND transposed (backward) schedules deadlock-free. The local
        # scan itself is gated behind lax.cond so each device runs its chunk's
        # recurrence exactly ONCE (at its own stage) instead of at every stage
        # — the collectives stay outside the cond, so the schedule is still
        # identical across devices (the fori_loop variant that moved
        # collectives inside data-dependent control flow deadlocked in the
        # transpose).
        def run_stage(carry):
            return _local_scan(gates_x, w_hh, carry)

        def idle_stage(carry):
            return carry, ys0

        carry, ys = zero, ys0
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        for s in range(n_shards):
            active = me == s
            carry_out, stage_ys = jax.lax.cond(active, run_stage, idle_stage,
                                               carry)
            ys = jnp.where(active, stage_ys, ys)
            h = jax.lax.ppermute(carry_out[0], seq_axis, perm)
            c = jax.lax.ppermute(carry_out[1], seq_axis, perm)
            carry = (h, c)
        return jnp.swapaxes(ys, 0, 1)  # (B, T_l, H)

    # manual only over the seq axis (axis_names); the data axis stays under
    # jit's automatic partitioning so DP and SP compose
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, seq_axis, None), P()),
        out_specs=P(None, seq_axis, None),
        axis_names={seq_axis})
    return fn(gates_x, w_hh)


def seq_sharded_scan_pipelined(gates_x, w_hh, mesh: Mesh,
                               seq_axis: str = "seq",
                               with_activity: bool = False):
    """Row-microbatched pipeline schedule (see seq_sharded_scan).

    The rows split into n_shards microbatches; stage t (t = 0..2n-2) has
    device s scan microbatch m = t - s of its local T/n chunk, receiving m's
    carry from device s-1 via the stage's ppermute. All collectives sit
    outside the cond-gated local scans at fixed points of a statically
    unrolled schedule (every device executes the identical collective
    sequence — the deadlock-free-transpose constraint documented on the
    relay schedule).

    ``with_activity``: also return an (n_stages,) int32 per-device vector of
    rows scanned at each stage — the concurrency witness used by tests
    (stages n-1..n_stages-1 show EVERY device active at once; ppermutes
    between stages make same-stage activity concurrent by construction).
    """
    n = mesh.shape[seq_axis]
    B, T, four_h = gates_x.shape
    H = w_hh.shape[0]
    pad_rows = (-B) % n
    if pad_rows:
        gates_x = jnp.concatenate(
            [gates_x, jnp.zeros((pad_rows, T, four_h), gates_x.dtype)], 0)
    Bp = B + pad_rows
    B_mb = Bp // n
    n_stages = 2 * n - 1

    def shard_fn(gates_local, w_hh):
        # gates_local: (Bp, T/n, 4H); microbatch m = rows m*B_mb..(m+1)*B_mb
        t_l = gates_local.shape[1]
        gates_mb = gates_local.reshape(n, B_mb, t_l, four_h)
        gates_mb = jnp.swapaxes(gates_mb, 1, 2)  # (n, T_l, B_mb, 4H)
        me = jax.lax.axis_index(seq_axis)

        def varying(v):
            return jax.lax.pcast(v, (seq_axis,), to="varying")

        dtype = gates_local.dtype
        zero = (varying(jnp.zeros((B_mb, H), dtype)),
                varying(jnp.zeros((B_mb, H), dtype)))
        ys_mb0 = varying(jnp.zeros((t_l, B_mb, H), dtype))
        ys_buf = varying(jnp.zeros((n, t_l, B_mb, H), dtype))
        activity = varying(jnp.zeros((n_stages,), jnp.int32))
        # hoisted pcast: the transpose of pcast is a psum — it must sit
        # outside the cond so every device reaches it (relay-schedule note)
        w_hh_v = varying(w_hh)

        recv = zero
        perm = [(i, (i + 1) % n) for i in range(n)]
        for t in range(n_stages):
            m = t - me
            active = (m >= 0) & (m < n)
            mc = jnp.clip(m, 0, n - 1)
            gx = jax.lax.dynamic_index_in_dim(gates_mb, mc, axis=0,
                                              keepdims=False)
            # device 0 seeds every microbatch with the zero carry; others
            # consume the carry handed over at the previous stage
            carry_in = jax.tree_util.tree_map(
                lambda z, r: jnp.where(me == 0, z, r), zero, recv)

            def run_stage(carry):
                return _local_scan(gx, w_hh_v, carry)

            def idle_stage(carry):
                return carry, ys_mb0

            carry_out, ys_m = jax.lax.cond(active, run_stage, idle_stage,
                                           carry_in)
            updated = jax.lax.dynamic_update_slice_in_dim(
                ys_buf, ys_m[None], mc, axis=0)
            ys_buf = jnp.where(active, updated, ys_buf)
            activity = activity.at[t].set(jnp.where(active, B_mb, 0))
            h = jax.lax.ppermute(carry_out[0], seq_axis, perm)
            c = jax.lax.ppermute(carry_out[1], seq_axis, perm)
            recv = (h, c)
        out = jnp.swapaxes(ys_buf, 1, 2).reshape(Bp, t_l, H)
        return out, activity

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, seq_axis, None), P()),
        out_specs=(P(None, seq_axis, None), P(seq_axis)),
        axis_names={seq_axis})
    out, activity = fn(gates_x, w_hh)
    out = out[:B]
    if with_activity:
        return out, activity.reshape(n, n_stages)
    return out


def seq_sharded_lstm(x, w_ih, w_hh, b, mesh: Mesh, seq_axis: str = "seq",
                     reverse: bool = False):
    """Full seq-sharded LSTM: global input projection (XLA shards the matmul)
    + the pipelined recurrence. Numerically identical to the dense scan."""
    gates_x = precision.einsum("btd,dk->btk", x, w_ih) + b
    return seq_sharded_scan(gates_x, w_hh, mesh, seq_axis, reverse=reverse)


def dense_reference_lstm(x, w_ih, w_hh, b):
    """Single-device scan for cross-checking."""
    gates_x = precision.einsum("btd,dk->btk", x, w_ih) + b
    gates_x = jnp.swapaxes(gates_x, 0, 1)
    B = x.shape[0]
    H = w_hh.shape[0]
    zero = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, ys = _local_scan(gates_x, w_hh, zero)
    return jnp.swapaxes(ys, 0, 1)
