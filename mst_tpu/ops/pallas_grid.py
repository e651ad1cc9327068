"""Pallas TPU kernel for the note-grid tail of the pitched style applier.

The "note generating submodule" (style/model.py:582-675, thesis fig) forms a
(…, octave, degree, k) broadcast grid from an octave embedding ``xo`` and a
scale-degree embedding ``xd``, contracts it with a (k, F) weight, adds the
melody contribution and squashes through sigmoids:

    out = sigmoid(LR(LR(xo)[…,o,None,k] + LR(xd)[…,None,d,k]) @ w + rest) * scale

This tail is the training step's single largest cost center on the v5e
(committed profile: ~4.7 ms and ~4 GB of HBM traffic per step at the bench
bucket, fwd+bwd). The XLA formulation (ops of models/layers.grid_times_w under
``jax.checkpoint``) avoids materializing the grid in the FORWARD pass, but the
backward's grid-shaped cotangent feeds three different reductions (d/xo, d/xd,
d/w), so XLA materializes grid-scale intermediates to HBM — ~1 GB per pass at
training shapes. The step is HBM-bandwidth-bound, so that traffic IS the cost.

This kernel computes the whole tail — and, via ``jax.custom_vjp``, all four
cotangents — with the grid resident only in VMEM, one lane-tile of rows at a
time. Nothing grid-shaped ever touches HBM; per step the kernel reads the
embeddings + cotangent once and writes the outputs once.

Layout: every row-indexed operand is processed TRANSPOSED, features on
sublanes and the flattened row dimension on lanes — the feature axes here
(O*K=240, D*K=210, O*D*F=280) are far below the 128-lane width, so putting
them on lanes would waste ~4x VPU throughput; rows are the only axis long
enough to fill lanes. The host-side transposes surrounding the kernel are
plain HBM-bandwidth copies that XLA fuses with the adjacent (un)flattens.

The jnp fallback (`_tail_jnp`) is the exact reference formulation and is used
on non-TPU backends (tests force CPU; Pallas-vs-jnp equivalence is pinned by
tests/test_pallas_grid.py in interpret mode). A bare pallas_call is an opaque
custom call the SPMD partitioner cannot split; under a ``set_mesh`` mesh the
kernel path therefore shard_maps itself (batch over ``data``, bars over
``seq``) so each device runs the kernel on its local shard — multi-chip
meshes keep the kernel (tests/test_fused_tails.py pins shard_map-kernel ==
dense-kernel == jnp bit-level agreement on the virtual mesh).
"""

from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
_SLOPE = 0.01

# Trace-time gate. Two reasons it is off: (a) like every pallas_call, the
# kernel is an opaque custom call the SPMD partitioner cannot split, so a
# >1-device mesh must trace the jnp path (mst_tpu.parallel.create_mesh flips
# the gate; CPU meshes already dispatch to jnp below); (b) MEASURED on the
# v5e (tools/microbench_grid.py --tail, bench bucket): the Mosaic lowering
# compiles and matches the jnp path to fp32 tolerance but runs 2.7x SLOWER
# (fwd 9.93 vs 2.24 ms, fwd+bwd 16.25 vs 6.00 ms) — the per-feature VPU
# loops here lose to XLA's fused lowering of the checkpointed formulation,
# unlike ops.pallas_raster where the scatter has no good XLA form. The
# kernel stays as the validated fallback recipe for chips/shapes where the
# balance flips; semantics are identical either way.
_ENABLED = False

# Which jnp formulation carries the tail when the Pallas kernel is off:
# "checkpoint" (default) = jax.checkpoint autodiff; "vjp" = the hand-written
# fused backward below. MEASURED on the v5e (K=16 scan trace, bench bucket,
# bf16 storage): checkpoint's applier bwd = 2.72 ms / 2.23 GB per step;
# the vjp variant as three barrier-separated single-reduce chains = 3.36 ms
# / 2.96 GB (rank-9 virtual products defeat the fusion emitters), and a
# rank-5 relayout of the same chains = 29.6 ms busy (the swapaxes needed to
# make the reduce axes minor-most materialize as full relayouts). XLA's
# scheduling of the checkpointed formulation is the best known lowering;
# the vjp path stays for future compiler generations (flip with
# set_jnp_tail) and as executable documentation of the negative result.
_JNP_TAIL = "checkpoint"

# Mesh over which an ENABLED kernel path shard_maps itself: each device runs
# the pallas_call on its local (batch/bar) shard, so the kernel no longer has
# to be disabled on multi-chip meshes (the SPMD partitioner cannot split a
# bare pallas_call, but a shard_map'd one it never sees). None = single-device.
_MESH = None

# Test/dryrun override: force the KERNEL path (interpret mode) on the CPU
# backend, where the dispatch below would otherwise always take jnp — how the
# virtual-mesh tests and dryrun_multichip exercise the shard_map'd kernel
# without TPU hardware.
_FORCE_INTERPRET = False


def set_enabled(enabled: bool) -> None:
    """Trace-time gate: route fused_grid_tail to the jnp path when False."""
    global _ENABLED
    _ENABLED = bool(enabled)


def set_mesh(mesh) -> None:
    """Shard_map the kernel path over ``mesh`` (axes named data/seq honored
    when the lead dims divide; unmentioned axes replicate). Applies only when
    the kernel is enabled — the jnp path partitions under plain pjit."""
    global _MESH
    _MESH = mesh


def set_force_interpret(force: bool) -> None:
    """Route fused_grid_tail to the kernel (interpret mode) even on CPU."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(force)


def set_jnp_tail(mode: str) -> None:
    """Select the jnp tail implementation: "vjp", "checkpoint" or
    "unrolled" (forward-only programs; see _tail_unrolled)."""
    # not an assert: must survive -O
    if mode not in ("vjp", "checkpoint", "unrolled"):
        raise ValueError(f"unknown jnp tail mode: {mode!r}")
    global _JNP_TAIL
    _JNP_TAIL = mode


@contextlib.contextmanager
def jnp_tail(mode: str):
    """Scoped set_jnp_tail — the trace-time gate for programs that want a
    specific tail lowering (e.g. the transfer serving path traces its
    forward-only programs under "unrolled")."""
    global _JNP_TAIL
    prev = _JNP_TAIL
    set_jnp_tail(mode)
    try:
        yield
    finally:
        _JNP_TAIL = prev


def _leaky(x):
    return jnp.where(x >= 0, x, _SLOPE * x)


def _dleaky_mul(x, ct):
    """d(leaky)(x) * ct without materializing the derivative mask."""
    return jnp.where(x >= 0, ct, _SLOPE * ct)


def _scale_cols(scale, O, D):
    """(O*D*F, 1) per-row output scale and its reciprocal, as host arrays —
    Pallas kernels cannot capture array constants, so these ride as inputs."""
    col = np.tile(np.asarray(scale, np.float32), O * D).reshape(-1, 1)
    return jnp.asarray(col), jnp.asarray(1.0 / col)


def _fwd_kernel(xoT_ref, xdT_ref, restT_ref, w_ref, sc_ref, outT_ref,
                *, O, D, K, F):
    tn = xoT_ref.shape[-1]
    a_o = _leaky(xoT_ref[:].reshape(O, K, tn))
    a_d = _leaky(xdT_ref[:].reshape(D, K, tn))
    g = _leaky(a_o[:, None] + a_d[None])              # (O, D, K, tn) in VMEM
    w = w_ref[:]                                      # (K, F)
    parts = [(g * w[:, f:f + 1].reshape(1, 1, K, 1)).sum(axis=2)
             for f in range(F)]                       # F x (O, D, tn)
    y = jnp.stack(parts, axis=2).reshape(O * D * F, tn)
    outT_ref[:] = jax.nn.sigmoid(y + restT_ref[:]) * sc_ref[:]


def _bwd_kernel(xoT_ref, xdT_ref, outT_ref, ctT_ref, w_ref, sc_ref,
                inv_sc_ref, ct_xoT_ref, ct_xdT_ref, ct_yT_ref, ct_w_ref,
                *, O, D, K, F):
    tn = xoT_ref.shape[-1]
    s = outT_ref[:] * inv_sc_ref[:]
    ct_y = ctT_ref[:] * (sc_ref[:] * s * (1.0 - s))   # d sigmoid
    ct_yT_ref[:] = ct_y                               # == d rest (pre C-sum)
    ct_y4 = ct_y.reshape(O, D, F, tn)

    xo = xoT_ref[:]
    xd = xdT_ref[:]
    a_o = _leaky(xo.reshape(O, K, tn))
    a_d = _leaky(xd.reshape(D, K, tn))
    gp = a_o[:, None] + a_d[None]                     # (O, D, K, tn)
    w = w_ref[:]

    ct_G = ct_y4[:, :, 0, :][:, :, None, :] * w[:, 0:1].reshape(1, 1, K, 1)
    for f in range(1, F):
        ct_G = ct_G + (ct_y4[:, :, f, :][:, :, None, :]
                       * w[:, f:f + 1].reshape(1, 1, K, 1))
    ct_gp = _dleaky_mul(gp, ct_G)
    ct_xoT_ref[:] = _dleaky_mul(xo, ct_gp.sum(axis=1).reshape(O * K, tn))
    ct_xdT_ref[:] = _dleaky_mul(xd, ct_gp.sum(axis=0).reshape(D * K, tn))

    g = _leaky(gp)
    cols = [(g * ct_y4[:, :, f, :][:, :, None, :]).sum(axis=(0, 1))
            .sum(axis=1, keepdims=True) for f in range(F)]   # F x (K, 1)
    ct_w_ref[0] = jnp.concatenate(cols, axis=1)              # (K, F)


def _col_spec(rows):
    return pl.BlockSpec((rows, TILE_N), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _compiler_params():
    return pltpu.CompilerParams(dimension_semantics=("parallel",))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tail_t(static, xoT, xdT, restT, w):
    out, _ = _tail_t_fwd(static, xoT, xdT, restT, w)
    return out


def _small_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _tail_t_fwd(static, xoT, xdT, restT, w):
    O, D, K, F, scale, interpret = static
    n_pad = xoT.shape[-1]
    sc, _ = _scale_cols(scale, O, D)
    outT = pl.pallas_call(
        functools.partial(_fwd_kernel, O=O, D=D, K=K, F=F),
        grid=(n_pad // TILE_N,),
        in_specs=[_col_spec(O * K), _col_spec(D * K), _col_spec(O * D * F),
                  _small_spec((K, F)), _small_spec((O * D * F, 1))],
        out_specs=_col_spec(O * D * F),
        out_shape=jax.ShapeDtypeStruct((O * D * F, n_pad), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xoT, xdT, restT, w, sc)
    return outT, (xoT, xdT, outT, w)


def _tail_t_bwd(static, res, ctT):
    O, D, K, F, scale, interpret = static
    xoT, xdT, outT, w = res
    n_pad = xoT.shape[-1]
    n_tiles = n_pad // TILE_N
    sc, inv_sc = _scale_cols(scale, O, D)
    ct_xoT, ct_xdT, ct_yT, ct_w_parts = pl.pallas_call(
        functools.partial(_bwd_kernel, O=O, D=D, K=K, F=F),
        grid=(n_tiles,),
        in_specs=[_col_spec(O * K), _col_spec(D * K), _col_spec(O * D * F),
                  _col_spec(O * D * F), _small_spec((K, F)),
                  _small_spec((O * D * F, 1)), _small_spec((O * D * F, 1))],
        out_specs=[_col_spec(O * K), _col_spec(D * K), _col_spec(O * D * F),
                   pl.BlockSpec((1, K, F), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((O * K, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((D * K, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((O * D * F, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, F), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xoT, xdT, outT, ctT, w, sc, inv_sc)
    return ct_xoT, ct_xdT, ct_yT, ct_w_parts.sum(axis=0)


_tail_t.defvjp(_tail_t_fwd, _tail_t_bwd)


def _tail_plain(xo, xd, w, rest, scale):
    """The un-checkpointed forward expression shared by every jnp variant —
    op-for-op the formulation XLA fuses without materializing the grid."""
    x1 = _leaky(xo)[..., :, None, :, None]            # (…, O, 1, k, 1)
    x2 = _leaky(xd)[..., None, :, :, None]            # (…, 1, D, k, 1)
    grid = _leaky(x1 + x2)                            # (…, O, D, k, 1)
    y = (grid * w).sum(axis=-2)                       # (…, O, D, F)
    y = y.reshape(y.shape[:-3] + (-1, y.shape[-1]))
    sc = jnp.asarray(scale, y.dtype)
    return jax.nn.sigmoid(y + rest) * sc


def _tail_jnp(xo, xd, w, rest, scale):
    """Checkpointed autodiff formulation — the original jnp path, kept as the
    numerics oracle for the other two."""
    tail = jax.checkpoint(
        lambda xo, xd, w, rest: _tail_plain(xo, xd, w, rest, scale))
    return tail(xo, xd, w, rest)


def _tail_unrolled(xo, xd, w, rest, scale):
    """Forward-optimized formulation for NO-GRAD programs (transfer serving):
    the K-contraction is unrolled over the F output features so each feature
    is ONE elementwise→reduce fusion that RECOMPUTES the leaky grid from the
    small xo/xd embeddings instead of reading a materialized grid.

    Why: XLA's lowering of ``(grid * w).sum(-2)`` materializes the
    (…, O, D, K) grid to HBM once (the grid element is reused F times, so
    the fusion cost model declines to duplicate the producer into the
    reduce) — measured 6.11 ms / 4.05 GB per call at the v5e transfer apply
    bucket (B=12, C=8, R=128), ~81% of HBM peak, i.e. the bytes ARE the
    cost. Per-feature unrolling trades those grid bytes for F recomputes of
    x1+x2+leaky (VPU work, free under an HBM-bound roofline).

    Values: the per-(o,d,f) sum reduces over the same K elements in the same
    ascending order as the broadcast form; bit-equality with _tail_plain is
    asserted on hardware by tools/ab_tail_unrolled.py and pinned by
    tests/test_fused_tails.py on CPU. Gradients: autodiff works but nothing
    guarantees the backward's HBM behavior — training keeps "checkpoint"."""
    x1 = _leaky(xo)[..., :, None, :]                  # (…, O, 1, K)
    x2 = _leaky(xd)[..., None, :, :]                  # (…, 1, D, K)
    parts = [(_leaky(x1 + x2) * w[:, f]).sum(axis=-1)
             for f in range(w.shape[-1])]
    y = jnp.stack(parts, axis=-1)                     # (…, O, D, F)
    y = y.reshape(y.shape[:-3] + (-1, y.shape[-1]))
    sc = jnp.asarray(scale, y.dtype)
    return jax.nn.sigmoid(y + rest) * sc


def _unbroadcast(ct, shape):
    """Reduce a cotangent back to a broadcast operand's ``shape``."""
    if ct.shape == tuple(shape):
        return ct
    lead = ct.ndim - len(shape)
    axes = tuple(range(lead)) + tuple(
        i + lead for i, d in enumerate(shape) if d == 1 and ct.shape[i + lead] != 1)
    return ct.sum(axis=axes).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tail_v(static, xo, xd, w, rest):
    scale, _, _ = static
    return _tail_plain(xo, xd, w, rest, scale)


def _tail_v_fwd(static, xo, xd, w, rest):
    scale, _, _ = static
    out = _tail_plain(xo, xd, w, rest, scale)
    return out, (xo, xd, w, out)


def _tail_v_bwd(static, res, ct):
    """Each cotangent is its own recompute chain: inputs pass through a
    per-chain ``optimization_barrier`` (operand orders differ, so CSE cannot
    merge the chains), and each chain is a pure elementwise→reduce expression
    XLA fuses into ONE kernel whose grid-scale intermediates live only in
    registers. ``jax.checkpoint``'s rematerialized grid instead feeds three
    different reductions from one barrier-guarded subgraph, which XLA
    schedules by materializing grid-scale buffers to HBM (committed v5e
    profile: 2.7 ms / 2.2 GB per step for the applier bwd alone); here the
    backward reads xo/xd/ct and writes the four cotangents — nothing else."""
    scale, rest_shape, rest_dtype = static
    xo, xd, w, out = res
    *lead, O, K = xo.shape
    D = xd.shape[-2]
    F = w.shape[-1]
    n = math.prod(lead) if lead else 1
    sc = jnp.asarray(scale, jnp.float32)
    s = out.astype(jnp.float32) / sc
    ct_y = ct.astype(jnp.float32) * (sc * s * (1.0 - s))     # (…, O*D, F)

    ct_rest = _unbroadcast(ct_y, rest_shape).astype(rest_dtype)

    # Lead dims flatten to n (free reshape of contiguous majors); each chain
    # is ONE multi-axis reduce over a virtual (n, O, D, K, F) product —
    # chained reduces would make the (n, O, D, K) intermediate a fusion
    # boundary and spill grid-scale fp32 to HBM. Variants MEASURED on the
    # v5e (see _JNP_TAIL note): this structure = 3.36 ms / 2.96 GB applier
    # bwd; a rank-5 relayout putting each chain's reduce axes minor-most =
    # 29.6 ms (the swapaxes materialize as relayouts); checkpoint autodiff
    # = 2.72 ms / 2.23 GB and stays the default.
    xo3 = xo.reshape(n, O, K)
    xd3 = xd.reshape(n, D, K)
    cty = ct_y.reshape(n, O, D, F)

    def grid_prod(xo_, xd_, cty_, for_w):
        gp = _leaky(xo_)[:, :, None, :] + _leaky(xd_)[:, None, :, :]
        if for_w:   # d y/d w[k,f] = leaky(gp)[…,k]
            return _leaky(gp)[..., :, None] * cty_[..., None, :]
        # d y[…,f]/d gp[…,k] = dleaky(gp) * w[k,f]
        return _dleaky_mul(gp, 1.0)[..., :, None] * (cty_[..., None, :] * w)

    xo1, xd1, cty1 = jax.lax.optimization_barrier((xo3, xd3, cty))
    t = grid_prod(xo1, xd1, cty1, False).sum(axis=(-3, -1))  # Σ D,F → (n,O,K)
    ct_xo = _dleaky_mul(xo1, t).astype(xo.dtype)

    xd2, xo2, cty2 = jax.lax.optimization_barrier((xd3, xo3, cty))
    t = grid_prod(xo2, xd2, cty2, False).sum(axis=(-4, -1))  # Σ O,F → (n,D,K)
    ct_xd = _dleaky_mul(xd2, t).astype(xd.dtype)

    cty3, xo4, xd4 = jax.lax.optimization_barrier((cty, xo3, xd3))
    prod = grid_prod(xo4, xd4, cty3, True)                   # (n, O, D, K, F)
    ct_w = prod.sum(axis=(0, 1, 2)).astype(w.dtype)

    return (ct_xo.reshape(xo.shape), ct_xd.reshape(xd.shape), ct_w, ct_rest)


_tail_v.defvjp(_tail_v_fwd, _tail_v_bwd)


def _tail_vjp(xo, xd, w, rest, scale):
    """jnp tail with the hand-written fused backward above. Forward numerics
    are op-identical to ``_tail_jnp``; gradients equal autodiff's up to
    float reassociation (tests/test_fused_tails.py)."""
    static = (tuple(float(v) for v in scale), tuple(rest.shape),
              jnp.dtype(rest.dtype).name)
    return _tail_v(static, xo, xd, w, rest)


def _tail_kernel_local(static, xo, xd, rest_full, w):
    """One device's kernel dispatch: flatten the (local) lead dims to rows,
    transpose to column layout, run the custom-VJP pallas_call, unpack."""
    O, D, K, F = static[0], static[1], static[2], static[3]
    *lead, _, _ = xo.shape
    n = math.prod(lead) if lead else 1
    n_pad = -(-max(n, 1) // TILE_N) * TILE_N
    pad = [(0, 0), (0, n_pad - n)]

    def to_cols(x, width):
        return jnp.pad(x.reshape(n, width).T, pad)

    outT = _tail_t(static, to_cols(xo, O * K), to_cols(xd, D * K),
                   to_cols(rest_full, O * D * F), w)
    return outT[:, :n].T.reshape(tuple(lead) + (O * D, F))


def _lead_spec(lead, mesh):
    """PartitionSpec over the lead dims: batch (dim 0) over a ``data`` axis,
    bars (dim 2 — mst_tpu.parallel.mesh._batch_spec's bar axis) over ``seq``,
    each only when the mesh has that axis >1 and the dim divides evenly;
    everything else replicated."""
    parts = [None] * len(lead)
    shape = dict(mesh.shape)
    if lead and shape.get("data", 1) > 1 and lead[0] % shape["data"] == 0:
        parts[0] = "data"
    if len(lead) > 2 and shape.get("seq", 1) > 1 and lead[2] % shape["seq"] == 0:
        parts[2] = "seq"
    return parts


def fused_grid_tail(xo, xd, w, rest, scale, interpret=None):
    """``sigmoid(grid_contraction(xo, xd) @ w + rest) * scale`` without the
    (…, O, D, k) note grid ever reaching HBM — forward AND backward.

    ``xo``: (*L, O, K) pre-activation octave embeddings, ``xd``: (*L, D, K)
    scale-degree embeddings, ``w``: (K, F), ``rest``: broadcastable to
    (*L, O*D, F) (the melody contribution + bias; its broadcast axes get the
    usual sum-reduction under grad), ``scale``: static tuple of F per-feature
    output scales. Returns (*L, O*D, F) float32.

    On TPU backends this runs the Pallas kernel above with a custom VJP; on
    CPU (tests, CPU meshes) it runs the exact jnp formulation. Values agree
    to float32 reassociation tolerance (tests/test_pallas_grid.py). Under a
    ``set_mesh`` mesh the kernel dispatch shard_maps itself (batch over
    ``data``, bars over ``seq``) so every device runs the pallas_call on its
    local shard — multi-chip meshes keep the kernel instead of losing it to
    the partitioner's inability to split an opaque custom call."""
    *lead, O, K = xo.shape
    D = xd.shape[-2]
    F = w.shape[-1]
    if interpret is None:
        # the real chip registers as "axon" (tunneled PJRT plugin) or "tpu";
        # anything else (the CPU test/mesh backend) takes the jnp path unless
        # the interpret-mode override forces the kernel. The kernel is
        # fp32-only — under a bfloat16 storage dtype the jnp path runs (and
        # keeps the half-width HBM buffers end to end).
        on_cpu = jax.default_backend() == "cpu"
        if (not _ENABLED or xo.dtype != jnp.float32
                or (on_cpu and not _FORCE_INTERPRET)):
            if _JNP_TAIL == "vjp":
                return _tail_vjp(xo, xd, w, rest, scale)
            if _JNP_TAIL == "unrolled":
                return _tail_unrolled(xo, xd, w, rest, scale)
            return _tail_jnp(xo, xd, w, rest, scale)
        interpret = on_cpu

    rest_full = jnp.broadcast_to(rest, tuple(lead) + (O * D, F))
    static = (O, D, K, F, tuple(float(v) for v in scale), bool(interpret))
    if _MESH is not None and _MESH.size > 1:
        from jax.sharding import PartitionSpec as P
        spec = P(*_lead_spec(lead, _MESH), None, None)
        fn = jax.shard_map(
            functools.partial(_tail_kernel_local, static),
            mesh=_MESH, in_specs=(spec, spec, spec, P()), out_specs=spec,
            check_vma=False)
        return fn(xo, xd, rest_full, w)
    return _tail_kernel_local(static, xo, xd, rest_full, w)
