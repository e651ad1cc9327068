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
