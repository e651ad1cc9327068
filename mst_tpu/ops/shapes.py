"""Tensor-shape ops: squash, broadcast-concat, norm-weighted channel pooling.

Parity target: style/utils/pytorch.py (squash_dims :7, cat_with_broadcast :54)
and style/model.py:796-815 (combine). All are pure jnp functions; ``combine``
additionally supports a channel mask — the batched-training generalization the
reference (batch=1, ragged channels) never needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def squash_dims(x, dim_begin: int, dim_end: Optional[int] = None):
    """Merge dims [dim_begin, dim_end) into one (parity: utils/pytorch.py:7-16)."""
    shape = x.shape
    if dim_end is None:
        dim_end = len(shape)
    if dim_begin < 0:
        dim_begin += len(shape)
        dim_end += len(shape)
    merged = int(np.prod(shape[dim_begin:dim_end]))
    return x.reshape(*shape[:dim_begin], merged, *shape[dim_end:])


def split_note_features(x, n_feat: int):
    """NF-fused raster (…, N*F) -> (…, N, F); 7-D input passes through.

    The on-device rasterizer emits its dense output with the (note, feature)
    axes FUSED into one minor axis: materializing the 7-D (…, N, F) layout as
    a standalone program costs ~1.8 ms of relayout per raster build on the
    v5e (the minor-dim-5 tiling), while splitting inside the consuming jit
    program lets XLA fold the same reshape into the first fusion for free.
    Model entry points and the loss builder accept either layout through this
    helper; ``None`` passes through (optional unpitched raster)."""
    if x is None or x.ndim == 7:
        return x
    nf = x.shape[-1]
    assert nf % n_feat == 0, (x.shape, n_feat)
    return x.reshape(*x.shape[:-1], nf // n_feat, n_feat)


def cat_with_broadcast(tensors: Sequence, axis: int = 0):
    """Broadcast all tensors to the elementwise-max shape (except ``axis``)
    then concatenate (parity: utils/pytorch.py:54-65)."""
    assert tensors
    rank = len(tensors[0].shape)
    assert all(len(t.shape) == rank for t in tensors)
    shapes = np.array([t.shape for t in tensors])
    target = shapes.max(axis=0)
    expanded = []
    for t in tensors:
        shape = target.copy()
        shape[axis] = t.shape[axis]
        expanded.append(jnp.broadcast_to(t, tuple(shape)))
    return jnp.concatenate(expanded, axis=axis)


def combine(x, axis: int = 1, mask=None, safe: bool = True):
    """Norm-weighted mean across ``axis`` (parity: style/model.py:796-815).

    Each slice along ``axis`` is weighted by ``sqrt(1 + ||slice||^2)`` (norm
    over all non-batch, non-axis dims) and the weighted sum is divided by the
    per-batch total of the weights. At batch=1 this is numerically identical to
    the reference, whose norm/denominator reductions also swallowed the
    singleton batch dim.

    ``mask``: optional (batch, n_axis) 0/1 array marking valid slices — masked
    slices contribute nothing to numerator or denominator (padding support).
    """
    norm_axes = tuple(i for i in range(x.ndim) if i not in (0, axis))
    # norms/denominators always accumulate in float32: under a bfloat16
    # storage dtype the inputs may arrive half-width, but a million-element
    # sum of squares in bf16 would lose the low bits that distinguish the
    # channel weights (the converts fuse into the reduce — no extra traffic)
    xf = x.astype(jnp.float32)
    sq = (xf * xf).sum(axis=norm_axes, keepdims=True)
    if safe:
        norm = jnp.sqrt(1.0 + sq)
    else:
        norm = jnp.sqrt(sq)
    if mask is not None:
        mask_shape = [1] * x.ndim
        mask_shape[0] = mask.shape[0]
        mask_shape[axis] = mask.shape[1]
        m = mask.reshape(mask_shape).astype(x.dtype)
        norm = norm * m
        x = x * m
    num = (x * norm).sum(axis=axis)
    denom = norm.sum(axis=tuple(range(1, x.ndim)))  # per-batch scalar
    if mask is not None:
        # a fully-masked row (no valid slices at all) yields a zero embedding
        # rather than 0/0
        denom = jnp.where(denom > 0, denom, 1.0)
    denom_shape = [denom.shape[0]] + [1] * (num.ndim - 1)
    return num / denom.reshape(denom_shape)


def combine_pair(a, b, b_mask=None):
    """combine() of two stacked tensors (parity: model.py:796-804 with
    ``combine(t1, t2)`` — stack on a new axis 0, norms per (tensor, batch)).

    ``b_mask``: optional (B,) validity of ``b`` per batch row. Masked rows
    return ``a`` exactly — in a mixed batch, a song without percussion must
    see only its pitched embedding, as the reference (which never feeds an
    absent tensor) would."""
    x = jnp.stack([a, b])  # (2, B, ...)
    if b_mask is not None:
        b_m = b_mask.astype(a.dtype)
        gate = jnp.stack([jnp.ones_like(b_m), b_m])  # (2, B)
        x = x * gate.reshape(gate.shape + (1,) * (x.ndim - 2))
    norm_axes = tuple(range(2, x.ndim))
    sq = (x * x).sum(axis=norm_axes, keepdims=True)
    norm = jnp.sqrt(1.0 + sq)
    if b_mask is not None:
        norm = norm * gate.reshape(gate.shape + (1,) * (norm.ndim - 2))
    num = (x * norm).sum(axis=0)
    denom = norm.sum(axis=(0,) + tuple(range(2, x.ndim)))  # (B,1,..)? -> (B,)
    denom = denom.reshape([num.shape[0]] + [1] * (num.ndim - 1))
    return num / denom


def masked_last(x, lengths):
    """x[:, length-1] per batch row: the final valid step of a padded sequence
    (replaces the reference's x[:, -1] once sequences are padded)."""
    idx = jnp.maximum(lengths - 1, 0).astype(jnp.int32)
    return jnp.take_along_axis(
        x, idx.reshape(-1, *([1] * (x.ndim - 1))), axis=1).squeeze(1)


def masked_flip(x, lengths):
    """Reverse each row's valid prefix in place: out[:, j] = x[:, len-1-j] for
    j < len, padding untouched. Used for the backward direction of
    bidirectional LSTMs over padded sequences."""
    T = x.shape[1]
    pos = jnp.arange(T)
    src = jnp.where(pos[None, :] < lengths[:, None],
                    lengths[:, None] - 1 - pos[None, :], pos[None, :])
    return jnp.take_along_axis(
        x, src.reshape(src.shape[0], T, *([1] * (x.ndim - 2))), axis=1)
