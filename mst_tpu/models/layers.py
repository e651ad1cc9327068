"""Shared building blocks: torch-initialized Dense/Conv and the size formula.

The reference derives every hidden width from ``get_mean_size``
(style/model.py:31-33: ceil(mean(values) * factor)); layer parameters follow
torch defaults (U(-1/sqrt(fan_in), +1/sqrt(fan_in))) so training dynamics are
comparable even though the RNG streams differ.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mst_tpu.ops import precision


def mean_size(*values, factor: float = 1.0) -> int:
    """Parity: style/model.py:31-33."""
    return math.ceil(float(np.mean(values)) * factor)


def _uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Dense(nn.Module):
    """nn.Linear with torch-default init (weight and bias U(+-1/sqrt(fan_in)))."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform(bound), (fan_in, self.features))
        bias = self.param("bias", _uniform(bound), (self.features,))
        return precision.matmul(x, kernel) + bias


class ConcatDense(nn.Module):
    """Dense over an implicit concat of broadcast-aligned parts.

    Computes ``sum_i broadcast(part_i @ kernel_rows_i) + bias`` — the exact
    distribution of ``Dense(cat_with_broadcast(parts, -1))`` over the concat —
    WITHOUT materializing the broadcast-concatenated input. TPU-first: parts
    that lack an axis (e.g. the channel axis) run their matmul at pre-
    broadcast size (C-fold fewer MXU FLOPs) and only the small outputs
    broadcast in the sum, so the dominant forward transients of the per-note
    feature stack never exist.

    Parameters are identical to the Dense it replaces (same "kernel"/"bias"
    names, shapes, and torch-default init, with fan_in = sum of part widths),
    so checkpoints are interchangeable; outputs differ from the concat
    formulation only by float summation order.
    """

    features: int

    @nn.compact
    def __call__(self, parts):
        dims = [p.shape[-1] for p in parts]
        fan_in = sum(dims)
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform(bound),
                            (fan_in, self.features))
        bias = self.param("bias", _uniform(bound), (self.features,))
        total = None
        offset = 0
        for part, d in zip(parts, dims):
            y = precision.matmul(part, kernel[offset:offset + d])
            offset += d
            total = y if total is None else total + y
        return total + bias


class DenseParams(nn.Module):
    """Owns the kernel/bias of a Dense without applying them.

    Same param names, shapes, and torch-default init as ``Dense(features)``
    applied to a ``fan_in``-wide input, so checkpoints are interchangeable.
    Used where the matmul itself is fused into a custom contraction (e.g. the
    note-grid tails in models/appliers.py and models/encoders.py) that must
    not lower to a ``dot`` — on TPU, XLA materializes dot operands to HBM,
    and the whole point of those tails is that the (…, octave, degree, k)
    operand never exists in memory.
    """

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        bound = 1.0 / math.sqrt(self.fan_in)
        kernel = self.param("kernel", _uniform(bound),
                            (self.fan_in, self.features))
        bias = self.param("bias", _uniform(bound), (self.features,))
        return kernel, bias


class Conv1d(nn.Module):
    """1-D convolution over the trailing spatial axis of (N, C_in, W) inputs,
    with torch-default init (parity target: the note->octave pooling conv,
    style/model.py:46-53: kernel 14, stride 7, pad 4)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-2] * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform(bound),
                            (self.features, x.shape[-2], self.kernel_size))
        bias = self.param("bias", _uniform(bound), (self.features,))
        out = precision.conv_general_dilated(
            x, kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NCW", "OIW", "NCW"),
        )
        return out + bias[None, :, None]


def leaky_relu(x):
    """torch F.leaky_relu default slope 0.01 (used everywhere in model.py).

    Every grid-scale activation in this model passes through here, so this is
    THE storage-dtype chokepoint: under storage_dtype="bfloat16" the output
    (and, via dtype-following cotangents, its backward buffer) materializes
    to HBM at half width. No-op under the fp32 default."""
    return precision.cast_storage(jax.nn.leaky_relu(x, negative_slope=0.01))


# NOTE: the "note generating submodule" grid contraction
# (style/model.py:203-297, 582-675) lives in ops/pallas_grid.py — a Pallas
# TPU kernel with a custom VJP (jnp fallback off-TPU) that keeps the
# (…, octave, degree, k) grid out of HBM in BOTH directions; at training
# shapes that grid is the model's single largest tensor (~GBs) and the step
# is HBM-bandwidth-bound.
