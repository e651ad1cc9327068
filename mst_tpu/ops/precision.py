"""Numeric policy for matmuls: optionally run MXU contractions in bfloat16.

``ModelConfig.compute_dtype`` selects the policy. Parameters, activations and
all elementwise math stay float32 — only the *operands* of matmuls / convs are
cast, and accumulation is forced back to float32 via
``preferred_element_type``. On a v5e the MXU's bf16 throughput is ~2x fp32
with fp32 accumulation, so this is pure throughput headroom wherever the
matmul (not the serial scan chain or the transport) is the bottleneck.

The reference trains in torch float32 throughout (style/model.py:28 — no AMP
anywhere); this knob is a TPU-first addition with no reference analogue.

The active dtype is trace-time state: it must be set (via
:func:`set_compute_dtype` or the :func:`precision` context manager) while a
``jit`` function is being *traced*. Entry points that own a config
(``runtime.train.make_train_step``, ``transfer.ModelBundle``) wrap their
traced bodies in ``precision(...)`` so callers never touch the global. jit
caches do not key on this global — code that flips the dtype mid-process must
use fresh jitted callables (the wrappers above re-enter the context on every
trace, so per-shape re-traces always see the owner's dtype).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    """Set the process-wide matmul compute dtype ("float32"/"bfloat16")."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


@contextlib.contextmanager
def precision(dtype):
    """Scoped compute dtype — active for any tracing that happens inside."""
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev


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
        return jax.lax.conv_general_dilated(x, kernel, **kwargs)
    out = jax.lax.conv_general_dilated(
        x.astype(_COMPUTE_DTYPE), kernel.astype(_COMPUTE_DTYPE), **kwargs)
    return out.astype(jnp.float32)
