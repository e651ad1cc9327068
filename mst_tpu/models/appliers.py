"""Style appliers: latents -> dense note tensors.

Parity: style/model.py:565-724. Output activations: duration = 6*sigmoid,
velocity = sigmoid, accidentals = sigmoid (:565-579).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.models.layers import (ConcatDense, Dense, DenseParams,
                                   leaky_relu, mean_size)
from mst_tpu.ops import precision
from mst_tpu.ops.pallas_grid import fused_grid_tail

N_OCTAVES = 8
N_SCALE_DEGREES = 7
N_BEAT_FRACTIONS = 10
N_PITCHED_FEATURES = 5
N_UNPITCHED_FEATURES = 2
N_UNPITCHED_NOTES = 47
MAX_DURATION = 6.0


class PitchedStyleApplier(nn.Module):
    """Parity: style/model.py:582-675."""

    style_size: int = 256
    melody_size: int = 8
    rhythm_size: int = 32

    @nn.compact
    def __call__(self, style, melody, rhythm, instruments):
        p = N_PITCHED_FEATURES
        linears_out = p * 6

        x = Dense(mean_size(self.style_size, p, factor=0.5),
                  name="style_linear")(style)
        x = leaky_relu(x)
        x1 = x[:, None, None, None, None, :]            # (B,1,1,1,1,F)

        x = Dense(mean_size(self.rhythm_size, p, factor=0.5),
                  name="rhythm_linear")(rhythm)         # (B,R,T,F10,F)
        x = leaky_relu(x)
        x2 = x[:, None, :, :, :, :]                     # (B,1,R,T,F10,F)

        x = Dense(mean_size(instruments.shape[-1], p, factor=0.4),
                  name="instruments_linear")(instruments)
        x = leaky_relu(x)
        x3 = x[:, :, None, None, None, :]               # (B,C,1,1,1,F)

        # the octave/degree linears distribute over the implicit concat of
        # (x1, x2, x3): each part's matmul runs pre-broadcast (the channel-
        # independent parts never expand over C) and the (B,C,R,T,F10,88)
        # concat input of the reference formulation is never materialized
        parts = [x1, x2, x3]
        xo = ConcatDense(linears_out * N_OCTAVES, name="octave_linear")(parts)
        xo = xo.reshape(xo.shape[:-1] + (N_OCTAVES, linears_out))

        xd = ConcatDense(linears_out * N_SCALE_DEGREES,
                         name="scale_degree_linear")(parts)
        xd = xd.reshape(xd.shape[:-1] + (N_SCALE_DEGREES, linears_out))

        x = Dense(mean_size(self.melody_size, p, factor=3),
                  name="melody_linear")(melody)         # (B,R,T,F10,56,20)
        mel = leaky_relu(x)

        # the final linear distributes over its [note-grid(30), melody(20)]
        # concat: the melody part contributes at (B,R,T,F10,56,.) and only
        # its 5-feature output broadcasts over C, while the note-grid part
        # fuses into the checkpointed grid contraction (ops/pallas_grid.py —
        # XLA's fused lowering of that formulation beat the hand-written
        # Pallas VMEM kernel 2.7x on the v5e, so the kernel is kept gated
        # off as the validated fallback)
        kernel, bias = DenseParams(linears_out + mel.shape[-1], p,
                                   name="linear")()
        mel_c = precision.matmul(mel, kernel[linears_out:])[:, None]

        # duration = 6*sigmoid, velocity/accidentals = sigmoid
        # (model.py:565-579) — one fused scale instead of slice+concat over
        # the full output tensor (values identical). xo/xd and the output are
        # the step's largest tensors: store them at the storage dtype.
        out = fused_grid_tail(precision.cast_storage(xo),
                              precision.cast_storage(xd),
                              kernel[:linears_out], mel_c + bias,
                              (MAX_DURATION, 1.0, 1.0, 1.0, 1.0))
        return precision.cast_storage(out)


class UnpitchedStyleApplier(nn.Module):
    """Parity: style/model.py:678-724 — a single percussion channel."""

    style_size: int = 256
    rhythm_size: int = 32

    @nn.compact
    def __call__(self, style, rhythm):
        u = N_UNPITCHED_FEATURES
        style_linear_size = mean_size(self.style_size, u, factor=0.5)
        notes_linear_size = u * 4

        x = Dense(N_BEAT_FRACTIONS * style_linear_size,
                  name="style_linear")(style)
        x = leaky_relu(x)
        x1 = x.reshape(x.shape[0], 1, 1, N_BEAT_FRACTIONS, style_linear_size)

        x = Dense(mean_size(self.rhythm_size, u, factor=1.0),
                  name="rhythm_linear")(rhythm)          # (B,R,T,F10,F)
        x2 = leaky_relu(x)

        # distributed concat: the per-song style part multiplies once per
        # beat fraction, not per (bar, beat) cell
        x = ConcatDense(N_UNPITCHED_NOTES * notes_linear_size,
                        name="notes_linear")([x1, x2])   # (B,R,T,F10,.)
        x = leaky_relu(x)
        x = x.reshape(x.shape[:4] + (N_UNPITCHED_NOTES, notes_linear_size))
        x = Dense(u, name="linear")(x)                   # (B,R,T,F10,47,2)

        # duration = 6*sigmoid, velocity = sigmoid — fused scale, see above
        scale = jnp.asarray([MAX_DURATION, 1.0], x.dtype)
        x = precision.cast_storage(jax.nn.sigmoid(x) * scale)
        return x[:, None]                                # (B,1,R,T,F10,47,2)
