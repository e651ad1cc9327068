"""Sequence-parallel LSTM: bar-axis sharding with ppermute carry handoff."""

import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.parallel.mesh import create_mesh
from mst_tpu.parallel.seq_lstm import dense_reference_lstm, seq_sharded_lstm


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_seq_sharded_matches_dense(n_seq):
    rng = np.random.default_rng(n_seq)
    B, T, D, H = 2, 64, 16, 24
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    w_ih = jnp.asarray(rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.1)
    mesh = create_mesh(n_data=8 // n_seq, n_seq=n_seq)
    want = np.asarray(dense_reference_lstm(x, w_ih, w_hh, b))
    got = np.asarray(seq_sharded_lstm(x, w_ih, w_hh, b, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_long_sequence_memory_layout():
    """A 1024-bar sequence shards evenly across 8 devices (128 bars each)."""
    rng = np.random.default_rng(0)
    B, T, D, H = 1, 1024, 8, 8
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    w_ih = jnp.asarray(rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    b = jnp.zeros((4 * H,), jnp.float32)
    mesh = create_mesh(n_data=1, n_seq=8)
    got = np.asarray(seq_sharded_lstm(x, w_ih, w_hh, b, mesh))
    want = np.asarray(dense_reference_lstm(x, w_ih, w_hh, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_seq_sharded_grad_matches_dense():
    """Reverse-mode through the pipelined scan == dense gradients."""
    import jax
    rng = np.random.default_rng(5)
    B, T, D, H = 2, 32, 8, 8
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    b = jnp.zeros((4 * H,), jnp.float32)
    mesh = create_mesh(n_data=1, n_seq=8)
    g = jax.jit(jax.grad(
        lambda wh: seq_sharded_lstm(x, wi, wh, b, mesh).sum()))(wh)
    gd = jax.jit(jax.grad(
        lambda wh: dense_reference_lstm(x, wi, wh, b).sum()))(wh)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=1e-4,
                               atol=1e-6)


def test_model_train_step_dp_x_sp():
    """The full train step under a (data=2, seq=4) mesh with the
    sequence_sharding context matches the dense single-device step."""
    import jax
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    from mst_tpu.config import Config
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.ops.seq_context import sequence_sharding
    from mst_tpu.parallel.mesh import replicate, shard_batch
    from mst_tpu.runtime.train import create_train_state, make_train_step

    config = Config()
    model = StyleTransferModel(config=config.model)
    batch = g._example_batch(B=2, R=32)
    state = create_train_state(model, config, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, config, has_unpitched=True)
    s1, l1 = step(state, batch)

    mesh = create_mesh(n_data=2, n_seq=4)
    state2 = replicate(
        create_train_state(model, config, batch, jax.random.PRNGKey(0)), mesh)
    sharded = shard_batch(batch, mesh, seq=True)
    step2 = make_train_step(model, config, has_unpitched=True)
    with sequence_sharding(mesh):
        s2, l2 = step2(state2, sharded)
    assert np.isclose(l1.total, l2.total, rtol=1e-4)
    a = jax.tree_util.tree_leaves(s1.accum_grads)[0]
    b = jax.tree_util.tree_leaves(s2.accum_grads)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-5)


def test_dense_fallback_warns_once():
    """An active sequence-sharding request that cannot shard (indivisible or
    short time axis) must surface a warning instead of silently running
    dense."""
    import warnings

    import jax

    from mst_tpu.ops import lstm as lstm_mod
    from mst_tpu.ops.seq_context import sequence_sharding
    from mst_tpu.parallel import create_mesh

    mesh = create_mesh(n_data=1, n_seq=4, devices=jax.devices()[:4])
    x = jnp.zeros((1, 37, 4))  # 37 % 4 != 0 -> dense fallback
    w_ih = jnp.zeros((4, 32))
    w_hh = jnp.zeros((8, 32))
    b = jnp.zeros((32,))
    lstm_mod._warned_fallbacks.clear()
    with sequence_sharding(mesh):
        with pytest.warns(UserWarning, match="dense single-device"):
            lstm_mod._lstm_scan(x, w_ih, w_hh, b)
        # second occurrence of the same shape: no repeat warning
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            lstm_mod._lstm_scan(x, w_ih, w_hh, b)
