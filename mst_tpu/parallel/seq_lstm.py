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


def seq_sharded_scan(gates_x, w_hh, mesh: Mesh, seq_axis: str = "seq",
                     reverse: bool = False):
    """The sharded LSTM recurrence alone: ``gates_x`` (B, T, 4H) are the
    already-projected inputs (x @ W_ih + b — computed globally so XLA shards
    the matmul); only the serial carry chain runs under shard_map, pipelined
    across the ``seq`` shards with ppermute carry handoff. ``reverse`` scans
    right-to-left (for the backward half of a BiLSTM): implemented as the
    forward pipeline over globally-flipped gates.
    """
    if reverse:
        return seq_sharded_scan(gates_x[:, ::-1], w_hh, mesh, seq_axis)[:, ::-1]
    n_shards = mesh.shape[seq_axis]
    B, T, _ = gates_x.shape
    assert T % n_shards == 0, (T, n_shards)
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
