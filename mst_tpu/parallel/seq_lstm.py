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


def _local_scan(gates_x, w_hh, carry):
    """gates_x: (T_local, N, 4H) precomputed input projections."""
    def step(c, gx):
        h, cc = c
        gates = gx + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(cc)
        return (h, cc), h
    return jax.lax.scan(step, carry, gates_x)


def seq_sharded_lstm(x, w_ih, w_hh, b, mesh: Mesh, seq_axis: str = "seq"):
    """x: (B, T, D) with T divisible by the seq-axis size. Returns (B, T, H)
    outputs, numerically identical to the dense scan."""
    n_shards = mesh.shape[seq_axis]
    B, T, D = x.shape
    assert T % n_shards == 0, (T, n_shards)
    H = w_hh.shape[0]

    def shard_fn(x_local, w_ih, w_hh, b):
        # x_local: (B, T/n, D) on each device
        gates_x = jnp.einsum("btd,dk->btk", x_local, w_ih) + b  # parallel MXU
        gates_x = jnp.swapaxes(gates_x, 0, 1)                   # (T_l, B, 4H)
        me = jax.lax.axis_index(seq_axis)

        def varying(v):
            # mark as device-varying over the seq axis so the scan carry type
            # is consistent (values actually do diverge per shard)
            return jax.lax.pcast(v, (seq_axis,), to="varying")

        zero = (varying(jnp.zeros((B, H), x.dtype)),
                varying(jnp.zeros((B, H), x.dtype)))
        ys0 = varying(jnp.zeros((gates_x.shape[0], B, H), x.dtype))

        def stage(s, state):
            carry, ys = state

            def run(_):
                return _local_scan(gates_x, w_hh, carry)

            def skip(_):
                return carry, ys

            new_carry, new_ys = jax.lax.cond(me == s, run, skip, None)
            ys = jnp.where(me == s, new_ys, ys)
            # hand the carry to the next shard over ICI
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            h = jax.lax.ppermute(new_carry[0], seq_axis, perm)
            c = jax.lax.ppermute(new_carry[1], seq_axis, perm)
            return (h, c), ys

        (_, ys) = jax.lax.fori_loop(0, n_shards, stage, (zero, ys0))
        return jnp.swapaxes(ys, 0, 1)  # (B, T_l, H)

    from jax.experimental.shard_map import shard_map
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, seq_axis, None), P(), P(), P()),
        out_specs=P(None, seq_axis, None))
    return fn(x, w_ih, w_hh, b)


def dense_reference_lstm(x, w_ih, w_hh, b):
    """Single-device scan for cross-checking."""
    gates_x = jnp.einsum("btd,dk->btk", x, w_ih) + b
    gates_x = jnp.swapaxes(gates_x, 0, 1)
    B = x.shape[0]
    H = w_hh.shape[0]
    zero = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, ys = _local_scan(gates_x, w_hh, zero)
    return jnp.swapaxes(ys, 0, 1)
