"""Analytic matmul-FLOP accounting for MFU numbers.

The reference publishes no performance numbers at all (BASELINE.md), so the
build carries its own utilization accounting: how many useful matmul/conv
FLOPs a program executes per step, and what fraction of the chip's peak that
wall-clock implies (MFU). The counter walks the *traced jaxpr* — every
``dot_general`` / ``conv_general_dilated``, including inside ``scan`` bodies
(multiplied by trip count), ``cond`` branches (max), grad transposes and
remat — so it is exact for the program actually staged, with no hand-derived
per-layer formulas to rot.

Convention: 1 MAC = 2 FLOPs; elementwise/VPU work is excluded (standard MFU
numerator). Peak numbers are the chip's dense-matmul peaks.
"""

from __future__ import annotations

import jax


# Dense-matmul peak FLOP/s (per chip). v5e: 197 TFLOP/s bf16; fp32 matmuls
# decompose on the bf16 MXU at roughly half throughput.
PEAK_FLOPS = {
    ("tpu v5e", "bfloat16"): 197e12,
    ("tpu v5e", "float32"): 98.5e12,
}


def device_peak_flops(compute_dtype: str = "bfloat16",
                      device=None) -> float:
    """Best-effort peak for the default device; falls back to v5e numbers
    (the target chip) when the platform string is unrecognized."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for (k, d), peak in PEAK_FLOPS.items():
        if d == compute_dtype and (k in kind or kind in k):
            return peak
    return PEAK_FLOPS[("tpu v5e", compute_dtype)]


def _dot_general_flops(eqn) -> float:
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = 1
    for d in lhs_b:
        batch *= lhs[d]
    k = 1
    for d in lhs_c:
        k *= lhs[d]
    m = 1
    for i, s in enumerate(lhs):
        if i not in lhs_c and i not in lhs_b:
            m *= s
    n = 1
    for i, s in enumerate(rhs):
        if i not in rhs_c and i not in rhs_b:
            n *= s
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    out_elems = 1.0
    for s in out:
        out_elems *= s
    # MACs per output element = (in_features / groups) * prod(kernel spatial)
    kernel_macs = 1.0
    for i, s in enumerate(rhs):
        if i != dn.rhs_spec[0]:  # all kernel dims except the out-feature dim
            kernel_macs *= s
    groups = eqn.params.get("feature_group_count", 1)
    return 2.0 * out_elems * kernel_macs / groups


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_flops(
                eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # no static trip count: count one body iteration (not used on
            # the model's hot paths, which are scan-based)
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(_jaxpr_flops(b.jaxpr)
                         for b in eqn.params["branches"])
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += _jaxpr_flops(
                        sub.jaxpr if hasattr(sub, "jaxpr") else sub)
                    break
    return total


def count_matmul_flops(fn, *args, **kwargs) -> float:
    """Matmul/conv FLOPs of one call of ``fn`` (trace-only; nothing runs).

    Pass the SAME function you jit (a grad-of-loss counts forward AND
    backward dots; a train step additionally counts the optimizer's —
    negligible — work)."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _jaxpr_flops(jaxpr.jaxpr)


def _is_array(x) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def _leaf_sig(x):
    """Hashable shape/dtype signature of an arbitrary pytree argument."""
    leaves, treedef = jax.tree_util.tree_flatten(x)
    return (str(treedef),
            tuple((tuple(l.shape), str(l.dtype)) if _is_array(l) else l
                  for l in leaves))


def replay_log_flops(raw_fns: dict, call_log) -> float:
    """Total matmul FLOPs of a ModelBundle.call_log (list of
    ``(key, args, kwargs)`` dispatches). Non-array kwargs are bound
    statically (they shape the trace, e.g. bucket sizes); array args trace as
    operands. Traces once per distinct (key, signature)."""
    import functools

    cache = {}
    total = 0.0
    for key, args, kwargs in call_log:
        static = {k: v for k, v in kwargs.items() if not _is_array(v)
                  and v is not None}
        dyn = {k: v for k, v in kwargs.items() if _is_array(v) or v is None}
        sig = (key, tuple(_leaf_sig(a) for a in args),
               tuple(sorted((k, _leaf_sig(v)) for k, v in dyn.items())),
               tuple(sorted(static.items())))
        if sig not in cache:
            fn = raw_fns[key]
            if static:
                fn = functools.partial(fn, **static)
            cache[sig] = count_matmul_flops(fn, *args, **dyn)
        total += cache[sig]
    return total


def mfu(flops_per_step: float, seconds_per_step: float,
        compute_dtype: str = "bfloat16", device=None) -> float:
    """Model FLOP utilization: achieved matmul FLOP/s over the chip peak."""
    peak = device_peak_flops(compute_dtype, device)
    return flops_per_step / seconds_per_step / peak
