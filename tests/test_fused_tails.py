"""The fused pitched-applier tail must equal the dense concat formulation.

The reference builds the 56-note axis by materializing the (…, oct, deg, k)
broadcast grid and feeding it (concatenated with the melody part) to a Linear
(style/model.py:582-675). The fused tail computes the same math as a
multiply-reduce that never materializes the grid; these tests pin value- and
gradient-equality against the naive formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.models.appliers import _fused_pitched_tail
from mst_tpu.models.layers import leaky_relu
from mst_tpu.ops.shapes import squash_dims


def _naive_pitched(xo, xd, w, rest, scale):
    x1 = leaky_relu(xo)[..., :, None, :]
    x2 = leaky_relu(xd)[..., None, :, :]
    big = squash_dims(leaky_relu(x1 + x2), 5, 7)   # (…, O*D, k)
    return jax.nn.sigmoid(big @ w + rest) * scale


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_fused_pitched_tail_matches_naive():
    rng = np.random.default_rng(0)
    B, C, R, T, F10, O, D, K, P = 2, 3, 4, 2, 5, 8, 7, 30, 5
    xo = _rand(rng, B, C, R, T, F10, O, K)
    xd = _rand(rng, B, C, R, T, F10, D, K)
    w = _rand(rng, K, P)
    rest = _rand(rng, B, 1, R, T, F10, O * D, P)
    scale = jnp.asarray([6.0, 1.0, 1.0, 1.0, 1.0], jnp.float32)
    got = _fused_pitched_tail(xo, xd, w, rest, scale)
    want = _naive_pitched(xo, xd, w, rest, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_pitched_tail_grad_matches_naive():
    rng = np.random.default_rng(1)
    B, C, R, T, F10, O, D, K, P = 1, 2, 3, 2, 2, 8, 7, 30, 5
    xo = _rand(rng, B, C, R, T, F10, O, K)
    xd = _rand(rng, B, C, R, T, F10, D, K)
    w = _rand(rng, K, P)
    rest = _rand(rng, B, 1, R, T, F10, O * D, P)
    scale = jnp.asarray([6.0, 1.0, 1.0, 1.0, 1.0], jnp.float32)
    g1 = jax.grad(lambda a: _fused_pitched_tail(*a, scale).sum())(
        (xo, xd, w, rest))
    g2 = jax.grad(lambda a: _naive_pitched(*a, scale).sum())(
        (xo, xd, w, rest))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
