"""The jaxpr matmul-FLOP counter behind bench.py's MFU lines."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.runtime.flops import count_matmul_flops, device_peak_flops, mfu


def test_plain_matmul():
    a = jnp.zeros((4, 8))
    b = jnp.zeros((8, 16))
    assert count_matmul_flops(lambda a, b: a @ b, a, b) == 2 * 4 * 16 * 8


def test_scan_multiplies_by_length():
    w = jnp.zeros((8, 8))
    xs = jnp.zeros((12, 4, 8))

    def fn(w, xs):
        def step(c, x):
            return c, x @ w
        return jax.lax.scan(step, 0.0, xs)

    assert count_matmul_flops(fn, w, xs) == 12 * 2 * 4 * 8 * 8


def test_conv_flops():
    # (N=3, C_in=5, W=20) conv kernel (O=7, I=5, K=4), stride 2, no pad
    x = jnp.zeros((3, 5, 20))
    k = jnp.zeros((7, 5, 4))

    def fn(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(2,), padding=[(0, 0)],
            dimension_numbers=("NCW", "OIW", "NCW"))

    out_w = (20 - 4) // 2 + 1  # 9
    expected = 2 * (3 * 7 * out_w) * 5 * 4
    assert count_matmul_flops(fn, x, k) == expected


def test_grad_counts_forward_and_backward():
    """value_and_grad of y = sum(x @ w) stages the forward dot plus two
    transpose dots -> ~3x the forward FLOPs."""
    x = jnp.zeros((16, 32))
    w = jnp.zeros((32, 64))

    def loss(w):
        return (x @ w).sum()

    fwd = count_matmul_flops(lambda w: x @ w, w)
    both = count_matmul_flops(jax.value_and_grad(loss), w)
    assert fwd * 2 <= both <= fwd * 3.5


def test_train_step_flops_scale_with_bars():
    """The full train step's counted FLOPs scale ~linearly in the bar axis
    (sanity against gross mis-counting of the scan-heavy program)."""
    from mst_tpu.config import Config
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.train import (Batch, create_train_state,
                                       make_train_step)

    model = StyleTransferModel()
    config = Config()

    def make_batch(R):
        B, C, T = 1, 2, 4
        return Batch(
            mode=jnp.array([[1.0, 0.0]]), bpm=jnp.array([120.0]),
            pitched=jnp.zeros((B, C, R, T, 10, 56, 5)),
            instruments_features=jnp.zeros((B, C, 51)).at[:, :, 0].set(1.0),
            unpitched=None,
            used_instruments=jnp.zeros((B, 41)).at[:, 0].set(1.0),
            bar_lengths=jnp.full((B,), R, jnp.int32),
            channel_mask=jnp.ones((B, C)), uchannel_mask=None)

    batch8 = make_batch(8)
    state = create_train_state(model, config, batch8, jax.random.PRNGKey(0))

    def flops(R):
        step = make_train_step(model, config, has_unpitched=False,
                               fetch_losses=False)
        # count the pre-jit step: __wrapped__ isn't exposed, so trace the
        # jitted callable itself (make_jaxpr stages through pjit)
        return count_matmul_flops(step, state, make_batch(R))

    f8, f16 = flops(8), flops(16)
    assert f8 > 0
    ratio = f16 / f8
    assert 1.7 < ratio < 2.2, ratio


def test_mfu_math():
    assert np.isclose(mfu(1e12, 1.0, "bfloat16"), 1e12 / 197e12)
    assert device_peak_flops("bfloat16") > device_peak_flops("float32") / 1.0
