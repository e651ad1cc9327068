"""The bfloat16 numeric policies (ops.precision):

- ModelConfig.compute_dtype — matmul OPERAND precision. Params and outputs
  must stay float32; outputs track fp32 within bf16 rounding and training
  dynamics are preserved (loss-trajectory test).
- ModelConfig.storage_dtype — activation STORAGE precision (the HBM-traffic
  lever; README "Measured behavior"). Params, grads, optimizer state and
  loss reductions must stay float32; the loss trajectory must track fp32.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.config import Config, ModelConfig
from mst_tpu.models import StyleTransferModel
from mst_tpu.ops.precision import compute_dtype, precision


def _toy_batch(rng, B=2, C=2, R=4, T=4):
    from mst_tpu.runtime.train import Batch
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    pitched = (jax.random.uniform(k[0], (B, C, R, T, 10, 56, 5)) > 0.9
               ).astype(jnp.float32)
    pitched = pitched * jax.random.uniform(k[1], pitched.shape)
    unpitched = (jax.random.uniform(k[2], (B, 1, R, T, 10, 47, 2)) > 0.9
                 ).astype(jnp.float32)
    instf = jnp.zeros((B, C, 51)).at[:, :, 0].set(1.0)
    return Batch(
        mode=jnp.tile(jnp.array([[1.0, 0.0]]), (B, 1)),
        bpm=jnp.full((B,), 120.0),
        pitched=pitched, instruments_features=instf, unpitched=unpitched,
        used_instruments=jnp.zeros((B, 41)).at[:, 0].set(1.0),
        bar_lengths=jnp.full((B,), R, jnp.int32),
        channel_mask=jnp.ones((B, C)), uchannel_mask=jnp.ones((B, 1)))


@pytest.fixture(scope="module")
def model_and_params():
    model = StyleTransferModel()
    batch = _toy_batch(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch.mode, batch.bpm, batch.pitched,
        batch.instruments_features, batch.unpitched,
        bar_lengths=batch.bar_lengths, channel_mask=batch.channel_mask,
        uchannel_mask=batch.uchannel_mask)
    return model, params, batch


def test_bf16_forward_tracks_fp32(model_and_params):
    model, params, batch = model_and_params

    def forward(params):
        return model.apply(params, batch.mode, batch.bpm, batch.pitched,
                           batch.instruments_features, batch.unpitched,
                           bar_lengths=batch.bar_lengths,
                           channel_mask=batch.channel_mask,
                           uchannel_mask=batch.uchannel_mask)

    (_, _, _), x32, u32 = jax.jit(forward)(params)
    with precision("bfloat16"):
        (_, _, _), x16, u16 = jax.jit(forward)(params)
    # outputs stay fp32 dtype; values track within bf16 rounding of the
    # deep-ish LSTM stack
    assert x16.dtype == jnp.float32 and u16.dtype == jnp.float32
    assert jnp.isfinite(x16).all()
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x32),
                               rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(u16), np.asarray(u32),
                               rtol=0.1, atol=0.05)


def test_precision_context_restores():
    assert compute_dtype() == jnp.float32
    with precision("bfloat16"):
        assert compute_dtype() == jnp.bfloat16
    assert compute_dtype() == jnp.float32


def test_bf16_train_step_keeps_params_fp32_and_tracks_loss(model_and_params):
    """A bf16-configured train step must keep every param/grad leaf float32
    and produce a per-step loss trajectory matching fp32 within bf16 noise."""
    from mst_tpu.runtime.train import create_train_state, make_train_step
    model, _, batch = model_and_params

    def run(dtype, n=5):
        config = Config(model=ModelConfig(compute_dtype=dtype))
        state = create_train_state(model, config, batch, jax.random.PRNGKey(0))
        step = make_train_step(model, config, has_unpitched=True)
        losses = []
        for _ in range(n):
            state, l = step(state, batch)
            losses.append(l.total)
        return state, losses

    state16, losses16 = run("bfloat16")
    state32, losses32 = run("float32")
    for leaf in jax.tree_util.tree_leaves(state16.params):
        assert leaf.dtype == jnp.float32
    assert all(np.isfinite(l) for l in losses16), losses16
    np.testing.assert_allclose(losses16, losses32, rtol=0.05, atol=0.02)
    # and the loss actually goes DOWN under bf16 like it does under fp32
    assert losses16[-1] < losses16[0]


def test_storage_context_restores_and_default_is_noop():
    from mst_tpu.ops.precision import cast_storage, storage_dtype
    assert storage_dtype() == jnp.float32
    x = jnp.ones((3,), jnp.float32)
    assert cast_storage(x) is x  # fp32 default: literally a no-op
    with precision("float32", storage="bfloat16"):
        assert storage_dtype() == jnp.bfloat16
        assert compute_dtype() == jnp.float32
        assert cast_storage(x).dtype == jnp.bfloat16
        # non-fp32 inputs (int masks, already-cast tensors) pass through
        i = jnp.ones((3,), jnp.int32)
        assert cast_storage(i) is i
    assert storage_dtype() == jnp.float32


def test_bf16_storage_train_step_tracks_fp32(model_and_params):
    """Under storage_dtype="bfloat16" every param/grad/opt-state leaf stays
    float32, the losses stay finite and track the fp32 trajectory (the big
    activation buffers round to bf16, but loss reductions run fp32), and
    the loss goes down."""
    from mst_tpu.runtime.train import create_train_state, make_train_step
    model, _, batch = model_and_params

    def run(dtype, n=5):
        config = Config(model=ModelConfig(storage_dtype=dtype))
        state = create_train_state(model, config, batch, jax.random.PRNGKey(0))
        step = make_train_step(model, config, has_unpitched=True)
        losses = []
        for _ in range(n):
            state, l = step(state, batch)
            losses.append(l.total)
        return state, losses

    state16, losses16 = run("bfloat16")
    state32, losses32 = run("float32")
    for leaf in jax.tree_util.tree_leaves((state16.params, state16.opt_state,
                                           state16.accum_grads)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert all(np.isfinite(l) for l in losses16), losses16
    np.testing.assert_allclose(losses16, losses32, rtol=0.05, atol=0.02)
    assert losses16[-1] < losses16[0]


def test_seq_sharded_scan_matches_dense_under_bf16():
    """The pipelined seq-sharded recurrence and the dense scan must stay
    numerically identical under the bf16 policy too (both cast the same
    operands)."""
    from mst_tpu.parallel import create_mesh
    from mst_tpu.parallel.seq_lstm import (
        dense_reference_lstm, seq_sharded_lstm)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = create_mesh(n_data=1, n_seq=4, devices=jax.devices()[:4])
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    B, T, D, H = 2, 16, 12, 8
    x = jax.random.normal(k[0], (B, T, D))
    w_ih = jax.random.normal(k[1], (D, 4 * H)) * 0.2
    w_hh = jax.random.normal(k[2], (H, 4 * H)) * 0.2
    b = jax.random.normal(k[3], (4 * H,)) * 0.1
    with precision("bfloat16"):
        dense = jax.jit(dense_reference_lstm)(x, w_ih, w_hh, b)
        sharded = jax.jit(
            lambda *a: seq_sharded_lstm(*a, mesh=mesh))(x, w_ih, w_hh, b)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)
