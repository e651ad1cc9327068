"""The merged single-scan BiLSTM must equal two separate directional scans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.ops.lstm import BiLSTM, _lstm_scan
from mst_tpu.ops.shapes import masked_flip


def _separate_reference(params, x, lengths=None):
    """The pre-merge formulation: one _lstm_scan per direction."""
    p = params["params"]

    def cell(side):
        c = p[side]["cell"] if "cell" in p[side] else p[side]
        return c["w_ih"], c["w_hh"], c["b_ih"] + c["b_hh"]

    w_ih_f, w_hh_f, b_f = cell("fwd")
    w_ih_b, w_hh_b, b_b = cell("bwd")
    fwd = _lstm_scan(x, w_ih_f, w_hh_f, b_f)
    if lengths is None:
        bwd = _lstm_scan(x, w_ih_b, w_hh_b, b_b, reverse=True)
    else:
        flipped = masked_flip(x, lengths)
        bwd = masked_flip(_lstm_scan(flipped, w_ih_b, w_hh_b, b_b), lengths)
    return jnp.concatenate([fwd, bwd], axis=-1)


@pytest.mark.parametrize("with_lengths", [False, True])
def test_bilstm_merged_matches_separate_scans(with_lengths):
    rng = np.random.default_rng(3)
    N, T, D, H = 3, 12, 6, 16
    x = jnp.asarray(rng.normal(size=(N, T, D)).astype(np.float32))
    lengths = jnp.asarray([12, 7, 1]) if with_lengths else None
    model = BiLSTM(H)
    params = model.init(jax.random.PRNGKey(0), x, lengths)
    got = model.apply(params, x, lengths)
    want = _separate_reference(params, x, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_bilstm_merged_grad_matches_separate():
    rng = np.random.default_rng(4)
    N, T, D, H = 2, 8, 5, 8
    x = jnp.asarray(rng.normal(size=(N, T, D)).astype(np.float32))
    model = BiLSTM(H)
    params = model.init(jax.random.PRNGKey(1), x)
    g1 = jax.grad(lambda p: model.apply(p, x).sum())(params)
    g2 = jax.grad(lambda p: _separate_reference(p, x).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
