"""SongInfoModel: predict (instruments, mode, bpm) from style + rhythm latents.

Parity: style/model.py:446-562 — hierarchical LSTMs over the rhythm grid
(beats within bars, then bars), three two-branch heads, bpm squashed to
[min_bpm, max_bpm] by a sigmoid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.models.layers import Dense, leaky_relu, mean_size
from mst_tpu.ops.lstm import LSTM
from mst_tpu.ops.shapes import cat_with_broadcast, masked_last, squash_dims

N_BEAT_FRACTIONS = 10
N_MODES = 2
MIN_BPM = 50.0
BPM_RANGE = 150.0


class SongInfoModel(nn.Module):
    n_rhythm_features: int = 8
    style_size: int = 256
    rhythm_size: int = 32
    n_instruments: int = 41

    def _head(self, style, rhythm_features, style_size, rhythm_size,
              out_size, prefix):
        x1 = leaky_relu(Dense(style_size, name=f"style_{prefix}_linear")(style))
        x2 = leaky_relu(Dense(rhythm_size, name=f"rhythm_{prefix}_linear")(
            rhythm_features))
        x = cat_with_broadcast([x1, x2], -1)
        return Dense(out_size, name=f"{prefix}_linear")(x)

    @nn.compact
    def __call__(self, style, rhythm,
                 bar_lengths: Optional[jnp.ndarray] = None):
        s, r = self.style_size, self.rhythm_size
        # rhythm features (parity :513-519): (B,R,T,F10,r) -> flatten fractions
        x = squash_dims(rhythm, -2)                       # (B,R,T,F10*r)
        B, R = x.shape[:2]
        beats_size = mean_size(N_BEAT_FRACTIONS * r, self.n_rhythm_features,
                               factor=0.05)
        flat = x.reshape((B * R,) + x.shape[2:])
        out, _ = LSTM(beats_size, name="beats_lstm",
                      seq_candidate=False)(flat)
        x = out.reshape((B, R) + out.shape[1:])[:, :, -1]  # last beat
        out, _ = LSTM(self.n_rhythm_features, name="bars_lstm")(x)
        rhythm_features = (out[:, -1] if bar_lengths is None
                           else masked_last(out, bar_lengths))

        instruments = self._head(
            style, rhythm_features,
            mean_size(s, self.n_instruments, factor=0.05),
            mean_size(r, self.n_instruments, factor=0.25),
            self.n_instruments, "instruments")
        mode = self._head(
            style, rhythm_features,
            mean_size(s, N_MODES, factor=0.01),
            mean_size(r, N_MODES, factor=0.1),
            N_MODES, "mode")
        bpm = self._head(
            style, rhythm_features,
            mean_size(s, 1, factor=0.01),
            mean_size(r, 1, factor=0.1),
            1, "bpm")[:, 0]
        bpm = jax.nn.sigmoid(bpm) * BPM_RANGE + MIN_BPM  # parity :553-555
        return instruments, mode, bpm
