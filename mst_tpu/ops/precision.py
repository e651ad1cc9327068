"""Numeric policy: matmul compute dtype and activation STORAGE dtype.

Two independent knobs, both trace-time state:

- ``ModelConfig.compute_dtype`` — with "bfloat16", the *operands* of matmuls
  / convs are cast to bf16 and accumulation is forced back to float32 via
  ``preferred_element_type``. On a v5e the MXU's bf16 throughput is ~2x fp32.
  Measured NEUTRAL for this model family (README): the feature dims (5..64)
  leave the MXU ~2% utilized — the step is HBM-bandwidth-bound, not
  FLOPs-bound.
- ``ModelConfig.storage_dtype`` — with "bfloat16", the big ACTIVATION buffers
  (every post-``leaky_relu`` tensor, the applier outputs, the dense raster
  fed to model + losses) materialize to HBM as bf16: the committed v5e
  profile shows the step moves ~10.8 GB/step of fp32 activations at the HBM
  roofline, so halving the bytes of the grid-scale tensors attacks the actual
  bottleneck. Parameters, optimizer state, gradients, LSTM carries, loss
  reductions and ``combine``'s norm accumulations all stay float32 (the
  converts fuse into the adjacent producers/reductions — no extra traffic).

The reference trains in torch float32 throughout (style/model.py:28 — no AMP
anywhere); both knobs are TPU-first additions with no reference analogue.

The active dtypes must be set (via the setters or the :func:`precision`
context manager) while a ``jit`` function is being *traced*. Entry points
that own a config (``runtime.train.make_train_step``,
``transfer.ModelBundle``) wrap their traced bodies in ``precision(...)`` so
callers never touch the globals. jit caches do not key on these globals —
code that flips a dtype mid-process must use fresh jitted callables (the
wrappers above re-enter the context on every trace, so per-shape re-traces
always see the owner's dtypes).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32
_STORAGE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    """Set the process-wide matmul compute dtype ("float32"/"bfloat16")."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


def set_storage_dtype(dtype) -> None:
    """Set the process-wide activation storage dtype ("float32"/"bfloat16")."""
    global _STORAGE_DTYPE
    _STORAGE_DTYPE = jnp.dtype(dtype)


def storage_dtype():
    return _STORAGE_DTYPE


@contextlib.contextmanager
def precision(dtype, storage=None):
    """Scoped numeric policy — active for any tracing that happens inside.

    ``dtype``: the matmul compute dtype. ``storage``: the activation storage
    dtype; ``None`` leaves the current storage dtype untouched (existing
    compute-only call sites keep their exact behavior)."""
    global _COMPUTE_DTYPE, _STORAGE_DTYPE
    prev = _COMPUTE_DTYPE
    prev_storage = _STORAGE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)
    if storage is not None:
        _STORAGE_DTYPE = jnp.dtype(storage)
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev
        _STORAGE_DTYPE = prev_storage


def cast_storage(x):
    """Round one activation tensor to the active storage dtype (no-op fp32).

    Apply at the points where a grid-scale tensor is PRODUCED (activation
    outputs, raster materialization): the convert fuses into the producing
    op, the HBM buffer lands at half width, and — because cotangent dtypes
    follow primal dtypes — the matching backward buffer does too."""
    if _STORAGE_DTYPE == jnp.float32 or x.dtype != jnp.float32:
        return x
    return x.astype(_STORAGE_DTYPE)


def cast_operand(x):
    """Cast one matmul operand to the active compute dtype (no-op on fp32)."""
    if _COMPUTE_DTYPE == jnp.float32:
        return x
    return x.astype(_COMPUTE_DTYPE)


def matmul(x, w):
    """``x @ w`` under the active compute dtype, accumulating in float32."""
    if _COMPUTE_DTYPE == jnp.float32:
        return x @ w
    return jnp.matmul(x.astype(_COMPUTE_DTYPE), w.astype(_COMPUTE_DTYPE),
                      preferred_element_type=jnp.float32)


def einsum(spec, *operands):
    """``jnp.einsum`` under the active compute dtype, accumulating in fp32."""
    if _COMPUTE_DTYPE == jnp.float32:
        return jnp.einsum(spec, *operands)
    return jnp.einsum(spec, *(o.astype(_COMPUTE_DTYPE) for o in operands),
                      preferred_element_type=jnp.float32)


def conv_general_dilated(x, kernel, **kwargs):
    """``lax.conv_general_dilated`` under the active compute dtype.

    Unlike dot_general, conv's transpose rule requires BOTH operands to share
    a dtype (a float32 ``preferred_element_type`` output would feed a float32
    cotangent against the bfloat16 kernel and fail under grad), so the conv
    runs wholly in bf16 and the output is cast back — the TPU MXU still
    accumulates in fp32 internally; only the result rounds to bf16."""
    if _COMPUTE_DTYPE == jnp.float32:
        # lax.conv requires matching operand dtypes — under a bf16 storage
        # dtype the input raster arrives half-width against fp32 kernels
        if x.dtype != kernel.dtype:
            x = x.astype(kernel.dtype)
        return jax.lax.conv_general_dilated(x, kernel, **kwargs)
    out = jax.lax.conv_general_dilated(
        x.astype(_COMPUTE_DTYPE), kernel.astype(_COMPUTE_DTYPE), **kwargs)
    return out.astype(jnp.float32)
