"""Encoder modules: channels -> (beats, bars) -> style / melody / rhythm.

Parity targets (architecture, widths, activation placement — cited per class):
style/model.py:36-141 (channel encoders), :144-200 (style), :203-297 (melody),
:301-443 (rhythm). TPU-first deviations:

- TimeDistributed wrappers become plain reshapes feeding the fused lax.scan
  LSTM (mst_tpu.ops.lstm) whose input projection is one large MXU matmul;
- channel pooling (``combine``) and final-step reads accept padding masks /
  lengths so songs batch with static shapes (identical math when unpadded).

Tensor layout throughout: pitched channels (B, C, R, T, F10, N, F) =
(batch, channel, bar, beat, beat_fraction, note, note_features).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.models.layers import Conv1d, Dense, leaky_relu, mean_size
from mst_tpu.ops.lstm import LSTM, BiLSTM
from mst_tpu.ops.shapes import (
    cat_with_broadcast, combine, masked_last, squash_dims)

N_OCTAVES = 8
N_SCALE_DEGREES = 7
N_BEAT_FRACTIONS = 10
N_PITCHED_FEATURES = 5
N_UNPITCHED_FEATURES = 2
N_UNPITCHED_NOTES = 47
N_MODES = 2


def _flatten_call(module, x, keep: int):
    """Apply a (batch, time, feat) module over flattened leading dims
    (the reference's Distributed wrapper, utils/pytorch.py:28-51)."""
    lead = x.shape[:keep]
    flat = x.reshape((-1,) + x.shape[keep:])
    out = module(flat)
    if isinstance(out, tuple):
        return tuple(o.reshape(lead + o.shape[1:]) for o in out)
    return out.reshape(lead + out.shape[1:])


class PitchedChannelsEncoder(nn.Module):
    """Parity: style/model.py:36-99."""

    beat_size: int = 64
    bar_size: int = 128

    @nn.compact
    def __call__(self, channels, instruments_features,
                 bar_lengths: Optional[jnp.ndarray] = None,
                 channel_mask: Optional[jnp.ndarray] = None):
        assert self.bar_size % 2 == 0
        conv_in = N_BEAT_FRACTIONS * N_PITCHED_FEATURES
        conv_out = mean_size(conv_in, self.beat_size)

        B, C, R, T = channels.shape[:4]
        # (B,C,R,T,10,56,5) -> swap note/features -> merge (fraction, feature)
        # into conv channels: (B*C*R*T, 50, 56)   (parity: model.py:78-81)
        x = jnp.swapaxes(channels, -1, -2)
        x = x.reshape(B * C * R * T, conv_in, x.shape[-1])
        x = Conv1d(conv_out, kernel_size=2 * N_SCALE_DEGREES,
                   stride=N_SCALE_DEGREES, padding=4, name="beats_conv")(x)
        x = leaky_relu(x)
        x1 = x.reshape(B, C, R, T, conv_out * N_OCTAVES)

        x = Dense(mean_size(instruments_features.shape[-1], self.beat_size),
                  name="instruments_linear")(instruments_features)
        x = leaky_relu(x)
        x2 = x[:, :, None, None, :]

        x = cat_with_broadcast([x1, jnp.broadcast_to(
            x2, (B, C, R, T, x2.shape[-1]))], -1)
        x = Dense(self.beat_size, name="linear")(x)
        x = leaky_relu(x)
        beats = _flatten_call(
            lambda y: LSTM(self.beat_size, name="beats_lstm",
                           seq_candidate=False)(y)[0], x, keep=3)

        x = beats[:, :, :, -1]                        # last beat per bar
        x = combine(x, axis=1, mask=channel_mask)      # pool channels
        bars = BiLSTM(self.bar_size // 2, name="bars_lstm")(x, bar_lengths)
        return beats, bars


class UnpitchedChannelsEncoder(nn.Module):
    """Parity: style/model.py:102-141."""

    beat_size: int = 64
    bar_size: int = 128

    @nn.compact
    def __call__(self, channels, bar_lengths: Optional[jnp.ndarray] = None,
                 channel_mask: Optional[jnp.ndarray] = None):
        assert self.bar_size % 2 == 0
        B, C, R, T = channels.shape[:4]
        x = jnp.swapaxes(channels, -1, -2)
        x = x.reshape(B, C, R, T, -1)  # merge (fraction, feature, note)
        x = Dense(self.beat_size, name="linear")(x)
        x = leaky_relu(x)
        beats = _flatten_call(
            lambda y: LSTM(self.beat_size, name="beats_lstm",
                           seq_candidate=False)(y)[0], x, keep=3)

        x = beats[:, :, :, -1]
        x = combine(x, axis=1, mask=channel_mask)
        bars = BiLSTM(self.bar_size // 2, name="bars_lstm")(x, bar_lengths)
        return beats, bars


class StyleEncoder(nn.Module):
    """Parity: style/model.py:144-200."""

    style_size: int = 256
    bar_size: int = 128

    @nn.compact
    def __call__(self, bars, instruments_features, mode, bpm,
                 bar_lengths: Optional[jnp.ndarray] = None,
                 channel_mask: Optional[jnp.ndarray] = None):
        s = self.style_size
        out, _ = LSTM(mean_size(self.bar_size, s), name="bars_lstm")(bars)
        x = out[:, -1] if bar_lengths is None else masked_last(out, bar_lengths)
        x1 = x[:, None, :]                              # (B, 1, F)

        x = Dense(mean_size(instruments_features.shape[-1], s, factor=0.25),
                  name="instruments_linear")(instruments_features)
        x2 = leaky_relu(x)                              # (B, C, F)

        x = Dense(mean_size(N_MODES, s, factor=0.1), name="mode_linear")(mode)
        x3 = leaky_relu(x)[:, None, :]

        x = Dense(mean_size(s, 1, factor=0.05), name="bpm_linear")(
            bpm[:, None])
        x4 = leaky_relu(x)[:, None, :]

        x = cat_with_broadcast([x1, x2, x3, x4], -1)    # (B, C, F_total)
        x = Dense(s, name="linear")(x)
        x = leaky_relu(x)
        return combine(x, axis=1, mask=channel_mask)    # (B, style)


class MelodyEncoder(nn.Module):
    """Parity: style/model.py:203-297 — the octave (+) scale-degree
    "note generating submodule" builds the 56-note axis by broadcast-adding an
    (octave, k) and a (scale_degree, k) embedding grid.

    NOTE: this tail deliberately keeps the dense cat+Dense formulation. A
    fused multiply-reduce variant (as in the pitched applier's tail) was
    measured on the v5e: 5-10x faster in isolation but +16 ms/step in the
    full training program (41 -> 57 ms) — the checkpointed recompute
    interacts badly with the surrounding fusion here, unlike in the applier
    where the same rewrite is neutral-time and saves the grid residual."""

    melody_size: int = 8
    beat_size: int = 64
    bar_size: int = 128

    @nn.compact
    def __call__(self, beats, bars, channels, instruments,
                 channel_mask: Optional[jnp.ndarray] = None):
        m = self.melody_size
        x = Dense(mean_size(self.beat_size, m), name="beats_linear")(beats)
        x = leaky_relu(x)
        x1 = x[:, :, :, :, None, :]                     # + fraction axis

        x = Dense(mean_size(self.bar_size, m), name="bars_linear")(bars)
        x = leaky_relu(x)
        x2 = x[:, None, :, None, None, :]               # (B,1,R,1,1,F)

        x = Dense(mean_size(instruments.shape[-1], m, factor=0.25),
                  name="instruments_linear")(instruments)
        x = leaky_relu(x)
        x3 = x[:, :, None, None, None, :]               # (B,C,1,1,1,F)

        y = cat_with_broadcast([
            jnp.broadcast_to(x1, x1.shape[:4] + (N_BEAT_FRACTIONS,
                                                 x1.shape[-1])),
            x2, x3], -1)                                # (B,C,R,T,F10,F)

        x = Dense(m * N_OCTAVES, name="octave_linear")(y)
        x = x.reshape(x.shape[:-1] + (N_OCTAVES, m))
        x1 = leaky_relu(x)[..., :, None, :]

        x = Dense(m * N_SCALE_DEGREES, name="scale_degree_linear")(y)
        x = x.reshape(x.shape[:-1] + (N_SCALE_DEGREES, m))
        x2 = leaky_relu(x)[..., None, :, :]

        x = leaky_relu(x1 + x2)
        x1 = squash_dims(x, 5, 7)

        x = Dense(mean_size(N_PITCHED_FEATURES, m), name="channels_linear")(
            channels)
        x2 = leaky_relu(x)

        x = cat_with_broadcast([x1, x2], -1)
        x = Dense(m, name="linear")(x)
        x = leaky_relu(x)
        return combine(x, axis=1, mask=channel_mask)


class PitchedRhythmEncoder(nn.Module):
    """Parity: style/model.py:301-381."""

    rhythm_size: int = 32
    beat_size: int = 64
    bar_size: int = 128

    @nn.compact
    def __call__(self, beats, bars, channels, instruments_features, mode, bpm,
                 channel_mask: Optional[jnp.ndarray] = None):
        r = self.rhythm_size
        x = Dense(mean_size(self.beat_size, r), name="beats_linear")(beats)
        x = leaky_relu(x)
        x1 = x[:, :, :, :, None, :]

        x = Dense(mean_size(self.bar_size, r, factor=0.5),
                  name="bars_linear")(bars)
        x = leaky_relu(x)
        x2 = x[:, None, :, None, None, :]

        x = squash_dims(channels, -2)                   # (B,C,R,T,F10,280)
        x = Dense(mean_size(56 * N_PITCHED_FEATURES, r, factor=0.1),
                  name="channels_linear")(x)
        x3 = leaky_relu(x)

        x = Dense(mean_size(instruments_features.shape[-1], r, factor=0.5),
                  name="instruments_linear")(instruments_features)
        x = leaky_relu(x)
        x4 = x[:, :, None, None, None, :]

        x = Dense(mean_size(N_MODES, r, factor=0.25), name="mode_linear")(mode)
        x = leaky_relu(x)
        x5 = x[:, None, None, None, None, :]

        x = Dense(mean_size(1, r, factor=0.25), name="bpm_linear")(bpm[:, None])
        x = leaky_relu(x)
        x6 = x[:, None, None, None, None, :]

        x = cat_with_broadcast([
            jnp.broadcast_to(x1, x3.shape[:5] + (x1.shape[-1],)),
            x2, x3, x4, x5, x6], -1)
        x = Dense(r, name="linear")(x)
        x = leaky_relu(x)
        return combine(x, axis=1, mask=channel_mask)    # (B,R,T,F10,r)


class UnpitchedRhythmEncoder(nn.Module):
    """Parity: style/model.py:384-443."""

    rhythm_size: int = 32
    beat_size: int = 64
    bar_size: int = 128

    @nn.compact
    def __call__(self, beats, bars, channels, bpm,
                 channel_mask: Optional[jnp.ndarray] = None):
        r = self.rhythm_size
        x = Dense(mean_size(self.beat_size, r), name="beats_linear")(beats)
        x = leaky_relu(x)
        x1 = x[:, :, :, :, None, :]

        x = Dense(mean_size(self.bar_size, r, factor=0.5),
                  name="bars_linear")(bars)
        x = leaky_relu(x)
        x2 = x[:, None, :, None, None, :]

        x = squash_dims(channels, -2)
        x = Dense(mean_size(N_UNPITCHED_NOTES * N_UNPITCHED_FEATURES, r,
                            factor=0.25), name="channels_linear")(x)
        x3 = leaky_relu(x)

        x = Dense(mean_size(1, r, factor=0.25), name="bpm_linear")(bpm[:, None])
        x = leaky_relu(x)
        x4 = x[:, None, None, None, None, :]

        x = cat_with_broadcast([
            jnp.broadcast_to(x1, x3.shape[:5] + (x1.shape[-1],)),
            x2, x3, x4], -1)
        x = Dense(r, name="linear")(x)
        x = leaky_relu(x)
        return combine(x, axis=1, mask=channel_mask)
