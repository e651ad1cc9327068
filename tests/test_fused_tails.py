"""The fused pitched-applier tail must equal the dense concat formulation.

The reference builds the 56-note axis by materializing the (…, oct, deg, k)
broadcast grid and feeding it (concatenated with the melody part) to a Linear
(style/model.py:582-675). ``ops.pallas_grid.fused_grid_tail`` computes the
same math without the grid ever reaching HBM — on TPU as a Pallas kernel with
a custom VJP, off-TPU as a checkpointed jnp multiply-reduce. These tests pin
value- and gradient-equality of BOTH paths against the naive formulation
(the Pallas path runs in interpret mode on the CPU test backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.models.layers import leaky_relu
from mst_tpu.ops.pallas_grid import fused_grid_tail
from mst_tpu.ops.shapes import squash_dims

SCALE = (6.0, 1.0, 1.0, 1.0, 1.0)


def _naive_pitched(xo, xd, w, rest):
    x1 = leaky_relu(xo)[..., :, None, :]
    x2 = leaky_relu(xd)[..., None, :, :]
    big = squash_dims(leaky_relu(x1 + x2), 5, 7)   # (…, O*D, k)
    scale = jnp.asarray(SCALE, jnp.float32)
    return jax.nn.sigmoid(big @ w + rest) * scale


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _assert_close(a, b):
    """Float32-reassociation tolerance, absolute floor scaled to b's
    magnitude (gradients here reach O(1e3); per-element rtol alone would
    demand sub-ulp agreement on near-zero entries)."""
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(a, b, rtol=1e-5,
                               atol=1e-5 + 2e-6 * np.abs(b).max())


def _inputs(rng, B, C, R, T, F10, O=8, D=7, K=30, P=5):
    return (_rand(rng, B, C, R, T, F10, O, K),
            _rand(rng, B, C, R, T, F10, D, K),
            _rand(rng, K, P),
            _rand(rng, B, 1, R, T, F10, O * D, P))


# interpret=None -> backend-dispatched (jnp on the CPU test backend);
# interpret=True -> the Pallas kernel + custom VJP, interpreted
@pytest.mark.parametrize("interpret", [None, True])
def test_fused_tail_matches_naive(interpret):
    rng = np.random.default_rng(0)
    args = _inputs(rng, B=2, C=3, R=4, T=2, F10=5)
    got = fused_grid_tail(*args, SCALE, interpret=interpret)
    want = _naive_pitched(*args)
    _assert_close(got, want)


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_tail_grad_matches_naive(interpret):
    rng = np.random.default_rng(1)
    args = _inputs(rng, B=1, C=2, R=3, T=2, F10=2)
    g1 = jax.grad(
        lambda a: (fused_grid_tail(*a, SCALE, interpret=interpret) ** 2)
        .sum())(args)
    g2 = jax.grad(lambda a: (_naive_pitched(*a) ** 2).sum())(args)
    for a, b in zip(g1, g2):
        _assert_close(a, b)


def test_fused_tail_pallas_row_padding():
    """Row counts not divisible by the 128-lane tile pad correctly: the pad
    columns must never leak into outputs or cotangents."""
    rng = np.random.default_rng(2)
    args = _inputs(rng, B=1, C=3, R=7, T=3, F10=1)   # 63 rows
    got = fused_grid_tail(*args, SCALE, interpret=True)
    want = _naive_pitched(*args)
    _assert_close(got, want)
    g1 = jax.grad(
        lambda a: (fused_grid_tail(*a, SCALE, interpret=True) ** 2).sum())(
        args)
    g2 = jax.grad(lambda a: (_naive_pitched(*a) ** 2).sum())(args)
    for a, b in zip(g1, g2):
        _assert_close(a, b)


def test_vjp_tail_forward_bitwise_vs_checkpoint():
    """The hand-written-VJP tail's FORWARD is op-identical to the
    checkpointed path — same expression, so bit-identical outputs."""
    from mst_tpu.ops.pallas_grid import _tail_jnp, _tail_vjp
    rng = np.random.default_rng(3)
    args = _inputs(rng, B=2, C=3, R=4, T=2, F10=5)
    a = jax.jit(lambda a: _tail_vjp(*a, SCALE))(args)
    b = jax.jit(lambda a: _tail_jnp(*a, SCALE))(args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unrolled_tail_forward_bitwise_vs_checkpoint():
    """The transfer serving tail (_tail_unrolled — per-feature fusions that
    recompute the leaky grid instead of materializing it to HBM) reduces
    each output element over the same K values in the same ascending order
    as the checkpointed broadcast form, so outputs are BIT-identical — the
    property that lets ModelBundle default to it without perturbing the
    packed wire bytes."""
    from mst_tpu.ops.pallas_grid import _tail_jnp, _tail_unrolled
    rng = np.random.default_rng(5)
    args = _inputs(rng, B=2, C=3, R=4, T=2, F10=5)
    a = jax.jit(lambda a: _tail_unrolled(*a, SCALE))(args)
    b = jax.jit(lambda a: _tail_jnp(*a, SCALE))(args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vjp_tail_grad_matches_naive():
    """The fused backward (per-chain optimization_barrier recompute) equals
    autodiff of the dense formulation to float32 reassociation tolerance,
    for every cotangent including the broadcast-reduced ``rest``."""
    from mst_tpu.ops.pallas_grid import _tail_vjp
    rng = np.random.default_rng(4)
    args = _inputs(rng, B=1, C=2, R=3, T=2, F10=2)
    g1 = jax.grad(lambda a: (_tail_vjp(*a, SCALE) ** 2).sum())(args)
    g2 = jax.grad(lambda a: (_naive_pitched(*a) ** 2).sum())(args)
    for a, b in zip(g1, g2):
        _assert_close(a, b)


def test_vjp_tail_bfloat16_storage_dtypes():
    """Under bf16 activation storage the embeddings arrive bf16: cotangents
    must come back in the primal dtypes (custom_vjp contract) and track the
    fp32 gradients to bf16 resolution."""
    from mst_tpu.ops.pallas_grid import _tail_vjp
    rng = np.random.default_rng(5)
    xo, xd, w, rest = _inputs(rng, B=1, C=2, R=3, T=2, F10=2)
    args16 = (xo.astype(jnp.bfloat16), xd.astype(jnp.bfloat16), w, rest)
    out = _tail_vjp(*args16, SCALE)
    g1 = jax.grad(lambda a: (_tail_vjp(*a, SCALE) ** 2).sum())(args16)
    assert g1[0].dtype == jnp.bfloat16 and g1[1].dtype == jnp.bfloat16
    assert g1[2].dtype == jnp.float32 and g1[3].dtype == jnp.float32
    g2 = jax.grad(lambda a: (_naive_pitched(*a) ** 2).sum())((xo, xd, w, rest))
    for a, b in zip(g1, g2):
        a, b = np.asarray(a, np.float32), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0.05,
                                   atol=0.05 * np.abs(b).max())
    assert not np.isnan(np.asarray(out, np.float32)).any()


def test_kernel_shard_map_on_mesh_matches_dense_kernel():
    """The shard_map'd kernel path (set_mesh + enabled, interpret mode on the
    virtual dp=4 x sp=2 CPU mesh) must BIT-match the single-device kernel
    dispatch and track the jnp tail — values and all four cotangents. This is
    the multi-chip configuration that previously fell back to jnp via
    create_mesh's set_enabled(False) escape."""
    from mst_tpu.ops import pallas_grid
    from mst_tpu.parallel import create_mesh

    rng = np.random.default_rng(6)
    # lead dims (B=4, C=2, R=2, T=2, F10=3): batch divides data=4, bars
    # divide seq=2
    args = _inputs(rng, B=4, C=2, R=2, T=2, F10=3)
    mesh = create_mesh(n_data=4, n_seq=2)
    assert dict(mesh.shape) == {"data": 4, "seq": 2}
    try:
        pallas_grid.set_enabled(True)
        pallas_grid.set_force_interpret(True)
        # create_mesh already registered the mesh (size > 1)
        sharded = fused_grid_tail(*args, SCALE)
        g_sharded = jax.grad(
            lambda a: (fused_grid_tail(*a, SCALE) ** 2).sum())(args)
    finally:
        pallas_grid.set_enabled(False)
        pallas_grid.set_force_interpret(False)
        pallas_grid.set_mesh(None)
    dense = fused_grid_tail(*args, SCALE, interpret=True)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(dense))
    _assert_close(sharded, _naive_pitched(*args))
    g_dense = jax.grad(
        lambda a: (fused_grid_tail(*a, SCALE, interpret=True) ** 2).sum())(
        args)
    g_naive = jax.grad(lambda a: (_naive_pitched(*a) ** 2).sum())(args)
    # xo/xd cotangents are row-local (no cross-shard reduction) — but in
    # INTERPRET mode the kernel body is re-fused by XLA inside each program
    # context, so the small O/D-axis sums can reassociate by 1 ulp between
    # the shard_map and dense programs (real Mosaic compiles the kernel in
    # isolation and is context-stable). w/rest cotangents additionally psum
    # across shards. Hence: forward bit-equal (asserted above), gradients to
    # float32-reassociation tolerance.
    for a, b, c in zip(g_sharded, g_dense, g_naive):
        _assert_close(a, b)
        _assert_close(a, c)
