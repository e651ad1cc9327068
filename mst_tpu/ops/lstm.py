"""Fused LSTM for TPU: one big input projection + a lean lax.scan recurrence.

Replaces the reference's nn.LSTM / TimeDistributed stacks
(style/utils/pytorch.py:19-51, used throughout style/model.py). TPU-first
design:

- the input projection ``x @ W_ih^T + b`` for *all* timesteps is one large
  matmul (MXU-friendly, batch*time rows), hoisted out of the recurrence;
- the scan body is a single (N, H) x (H, 4H) matmul plus elementwise gates —
  the minimal serial work per step;
- gate order (i, f, g, o) and parameter initialization U(-1/sqrt(H), 1/sqrt(H))
  match torch.nn.LSTM so training dynamics are comparable;
- padded sequences: final states are read at ``lengths-1``; bidirectional runs
  the backward pass over a per-row flipped valid prefix (ops.shapes.masked_flip)
  so padding never leaks into the backward carry.

The "Distributed" pattern (apply over flattened leading dims) is a reshape —
callers flatten (batch, channel, bar) themselves, exactly like the reference's
wrapper but with zero module machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.ops import precision
from mst_tpu.ops.shapes import masked_flip, masked_last


_warned_fallbacks = set()


def _warn_dense_fallback(t: int, n_shards: int) -> None:
    """Surface (once per shape) that an active sequence-sharding request fell
    back to the dense single-device recurrence — a 100-bar bucket under
    --seq-parallel 8 would otherwise silently get no sharding."""
    key = (t, n_shards)
    if key not in _warned_fallbacks:
        _warned_fallbacks.add(key)
        import warnings
        from mst_tpu.ops.seq_context import MIN_SEQ_LEN
        warnings.warn(
            f"sequence sharding requested but the time axis ({t}) is "
            f"{'shorter than MIN_SEQ_LEN=%d' % MIN_SEQ_LEN if t < MIN_SEQ_LEN else 'not divisible by the shard count'} "
            f"({n_shards} shards); running the dense single-device recurrence",
            stacklevel=3)


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class LSTMCellParams(nn.Module):
    """Parameter container for one direction: W_ih (D,4H), W_hh (H,4H), b (4H)."""

    features: int
    input_size: int

    @nn.compact
    def __call__(self):
        h = self.features
        bound = 1.0 / (h ** 0.5)
        w_ih = self.param("w_ih", _uniform_init(bound), (self.input_size, 4 * h))
        w_hh = self.param("w_hh", _uniform_init(bound), (h, 4 * h))
        # torch keeps two bias vectors (b_ih + b_hh); their sum is what enters
        # the gates — a single parameter of twice the init variance is kept as
        # two for init parity
        b_ih = self.param("b_ih", _uniform_init(bound), (4 * h,))
        b_hh = self.param("b_hh", _uniform_init(bound), (4 * h,))
        return w_ih, w_hh, b_ih + b_hh


def _lstm_scan(x, w_ih, w_hh, b, reverse: bool = False,
               seq_candidate: bool = True):
    """x: (N, T, D) -> outputs (N, T, H); scan is time-major internally.

    Under an active sequence-sharding context (ops.seq_context) a long-enough
    time axis runs as the pipelined seq-sharded recurrence instead — the input
    projection is global either way. ``seq_candidate=False`` marks scans whose
    time axis is local by design (beat-axis scans: T = beats-per-bar, always
    tiny) so they never trigger the dense-fallback warning meant for bar-axis
    recurrences."""
    n, t, _ = x.shape
    h_dim = w_hh.shape[0]
    # one MXU matmul (bf16 under compute_dtype="bfloat16", fp32 accumulation)
    gates_x = precision.einsum("ntd,dk->ntk", x, w_ih) + b

    from mst_tpu.ops.seq_context import MIN_SEQ_LEN, current_seq_mesh
    ctx = current_seq_mesh()
    if ctx is not None:
        mesh, axis = ctx
        n_shards = mesh.shape[axis]
        if t >= MIN_SEQ_LEN and t % n_shards == 0:
            from mst_tpu.parallel.seq_lstm import seq_sharded_scan
            return seq_sharded_scan(gates_x, w_hh, mesh, axis,
                                    reverse=reverse)
        if seq_candidate:
            _warn_dense_fallback(t, n_shards)

    gates_x = jnp.swapaxes(gates_x, 0, 1)  # (T, N, 4H)
    if reverse:
        gates_x = gates_x[::-1]
    # cast the recurrent weights ONCE outside the scan; the carry h is cast
    # per step (elementwise, fuses into the gate math)
    w_hh_c = precision.cast_operand(w_hh)

    def step(carry, gx):
        h, c = carry
        gates = gx + precision.matmul(h, w_hh_c)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # carries follow the GATE dtype (fp32 even when x arrives at a bf16
    # storage dtype — the input projection promotes): the serial recurrence
    # keeps full precision regardless of the activation storage policy
    init = (jnp.zeros((n, h_dim), gates_x.dtype),
            jnp.zeros((n, h_dim), gates_x.dtype))
    _, outputs = jax.lax.scan(step, init, gates_x)
    if reverse:
        outputs = outputs[::-1]
    return jnp.swapaxes(outputs, 0, 1)  # (N, T, H)


class LSTM(nn.Module):
    """Unidirectional batch-first LSTM returning full outputs.

    Equivalent to the reference's LSTM wrapper (utils/pytorch.py:19-25); the
    final hidden state is ``outputs[:, -1]`` (or ``masked_last`` with lengths).

    ``seq_candidate``: set False on scans whose time axis is local by design
    (beat-axis scans) so a dense fallback under sequence sharding stays silent.
    """

    features: int
    seq_candidate: bool = True

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None):
        w_ih, w_hh, b = LSTMCellParams(self.features, x.shape[-1],
                                       name="cell")()
        out = _lstm_scan(x, w_ih, w_hh, b, seq_candidate=self.seq_candidate)
        if lengths is None:
            last = out[:, -1]
        else:
            last = masked_last(out, lengths)
        return out, last


def _bilstm_merged_scan(x_fwd, x_bwd, params_fwd, params_bwd):
    """BOTH directions of a BiLSTM as ONE lax.scan.

    The two directions are independent recurrences over the same time length;
    running them as separate scans doubles the serial while-loop iterations —
    the dominant cost of the bar-axis recurrences at small row counts
    (profiled ~7 ms/step of a 40 ms step). Here the direction becomes a
    block-batch axis: carry (2, N, H), per-step recurrent matmul
    ``einsum('knh,khg->kng')`` with the per-direction weights stacked — the
    same per-row math (each batch element of a batched dot is reduced
    independently), half the scan steps.

    ``x_bwd`` must already be time-flipped by the caller; its outputs return
    un-flipped (scan order).
    """
    w_ih_f, w_hh_f, b_f = params_fwd
    w_ih_b, w_hh_b, b_b = params_bwd
    n, t, _ = x_fwd.shape
    h_dim = w_hh_f.shape[0]
    gates_f = precision.einsum("ntd,dk->ntk", x_fwd, w_ih_f) + b_f
    gates_b = precision.einsum("ntd,dk->ntk", x_bwd, w_ih_b) + b_b
    gates = jnp.stack([gates_f, gates_b], axis=0)     # (2, N, T, 4H)
    gates = jnp.moveaxis(gates, 2, 0)                 # (T, 2, N, 4H)
    w2 = precision.cast_operand(jnp.stack([w_hh_f, w_hh_b], axis=0))

    def step(carry, gx):
        h, c = carry                                  # (2, N, H)
        if w2.dtype != h.dtype:
            gates = gx + jnp.einsum("knh,khg->kng", h.astype(w2.dtype), w2,
                                    preferred_element_type=h.dtype)
        else:
            gates = gx + jnp.einsum("knh,khg->kng", h, w2)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    # fp32 carries under any storage dtype (see _lstm_scan)
    init = (jnp.zeros((2, n, h_dim), gates.dtype),
            jnp.zeros((2, n, h_dim), gates.dtype))
    _, ys = jax.lax.scan(step, init, gates)           # (T, 2, N, H)
    fwd = jnp.swapaxes(ys[:, 0], 0, 1)                # (N, T, H)
    bwd = jnp.swapaxes(ys[:, 1], 0, 1)
    return fwd, bwd


class BiLSTM(nn.Module):
    """Bidirectional batch-first LSTM; output feature dim = 2*features.

    With ``lengths``, the backward direction scans the flipped valid prefix so
    each row's backward pass starts at its own last valid step (equivalent to
    the reference's behavior on unpadded batch=1 inputs).

    Off the sequence-sharding path, both directions run as ONE merged scan
    (_bilstm_merged_scan) — identical math, half the serial steps.
    """

    features: int
    seq_candidate: bool = True

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None):
        w_ih_f, w_hh_f, b_f = LSTMCellParams(self.features, x.shape[-1],
                                             name="fwd")()
        w_ih_b, w_hh_b, b_b = LSTMCellParams(self.features, x.shape[-1],
                                             name="bwd")()
        sc = self.seq_candidate

        from mst_tpu.ops.seq_context import MIN_SEQ_LEN, current_seq_mesh
        t = x.shape[1]
        ctx = current_seq_mesh()
        sharded = (ctx is not None and t >= MIN_SEQ_LEN
                   and t % ctx[0].shape[ctx[1]] == 0)
        if sharded:
            # bar-axis sharding active: each direction runs as its own
            # seq-sharded pipelined recurrence (through _lstm_scan)
            fwd = _lstm_scan(x, w_ih_f, w_hh_f, b_f, seq_candidate=sc)
            if lengths is None:
                bwd = _lstm_scan(x, w_ih_b, w_hh_b, b_b, reverse=True,
                                 seq_candidate=sc)
            else:
                flipped = masked_flip(x, lengths)
                bwd = masked_flip(_lstm_scan(flipped, w_ih_b, w_hh_b, b_b,
                                             seq_candidate=sc), lengths)
            return jnp.concatenate([fwd, bwd], axis=-1)

        if ctx is not None and sc:
            _warn_dense_fallback(t, ctx[0].shape[ctx[1]])
        if lengths is None:
            flipped = x[:, ::-1]
            fwd, bwd_raw = _bilstm_merged_scan(
                x, flipped, (w_ih_f, w_hh_f, b_f), (w_ih_b, w_hh_b, b_b))
            bwd = bwd_raw[:, ::-1]
        else:
            flipped = masked_flip(x, lengths)
            fwd, bwd_raw = _bilstm_merged_scan(
                x, flipped, (w_ih_f, w_hh_f, b_f), (w_ih_b, w_hh_b, b_b))
            bwd = masked_flip(bwd_raw, lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)
