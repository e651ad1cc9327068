"""Model: shape/param parity, loss stack vs a torch oracle, padding exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.models import StyleTransferModel
from mst_tpu.ops import losses as L
from mst_tpu.ops.shapes import combine, combine_pair, masked_flip, masked_last
from mst_tpu.ops.lstm import LSTM, BiLSTM


def make_inputs(rng, B=1, C=2, Cu=1, R=5, T=4, seed_vals=True):
    k = jax.random.split(rng, 5)
    pitched = jax.random.uniform(k[0], (B, C, R, T, 10, 56, 5)) * \
        (jax.random.uniform(k[1], (B, C, R, T, 10, 56, 1)) > 0.9)
    unpitched = jax.random.uniform(k[2], (B, Cu, R, T, 10, 47, 2)) * \
        (jax.random.uniform(k[3], (B, Cu, R, T, 10, 47, 1)) > 0.9)
    instf = jnp.zeros((B, C, 51))
    for c in range(C):
        instf = instf.at[:, c, c].set(1.0).at[:, c, 40 + c % 11].set(1.0)
    mode = jnp.tile(jnp.array([[1.0, 0.0]]), (B, 1))
    bpm = jnp.full((B,), 120.0)
    return mode, bpm, pitched, instf, unpitched


def test_forward_shapes_and_ranges():
    model = StyleTransferModel()
    rng = jax.random.PRNGKey(0)
    mode, bpm, pitched, instf, unpitched = make_inputs(rng)
    params = model.init(rng, mode, bpm, pitched, instf, unpitched)
    (inst, mode_pred, bpm_pred), xp, xu = model.apply(
        params, mode, bpm, pitched, instf, unpitched)
    assert inst.shape == (1, 41) and mode_pred.shape == (1, 2)
    assert xp.shape == pitched.shape and xu.shape == unpitched.shape
    assert 50.0 <= float(bpm_pred[0]) <= 200.0
    # activation ranges (parity: model.py:565-579)
    assert float(xp[..., 0].max()) <= 6.0 and float(xp[..., 0].min()) >= 0.0
    assert float(xp[..., 1:].max()) <= 1.0 and float(xp[..., 1:].min()) >= 0.0


def _torch_lstm_param_count(d, h, bidirectional=False):
    per_dir = 4 * h * (d + h) + 8 * h
    return per_dir * (2 if bidirectional else 1)


def _linear(i, o):
    return (i + 1) * o


def test_param_count_matches_reference_architecture():
    """Parameter counts per submodule equal the reference's torch layer sizes
    (widths from get_mean_size — SURVEY.md §2.1)."""
    model = StyleTransferModel()
    rng = jax.random.PRNGKey(0)
    mode, bpm, pitched, instf, unpitched = make_inputs(rng)
    params = model.init(rng, mode, bpm, pitched, instf, unpitched)["params"]

    def count(tree):
        return sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(tree))

    expected = {
        "pitched_channels_encoder": (
            (50 * 14 + 1) * 57 + _linear(51, 58) + _linear(514, 64)
            + _torch_lstm_param_count(64, 64)
            + _torch_lstm_param_count(64, 64, bidirectional=True)),
        "unpitched_channels_encoder": (
            _linear(940, 64) + _torch_lstm_param_count(64, 64)
            + _torch_lstm_param_count(64, 64, bidirectional=True)),
        "style_encoder": (
            _torch_lstm_param_count(128, 192) + _linear(51, 39)
            + _linear(2, 13) + _linear(1, 7) + _linear(251, 256)),
        "melody_encoder": (
            _linear(64, 36) + _linear(128, 68) + _linear(51, 8)
            + _linear(112, 64) + _linear(112, 56) + _linear(5, 7)
            + _linear(15, 8)),
        "pitched_rhythm_encoder": (
            _linear(64, 48) + _linear(128, 40) + _linear(280, 16)
            + _linear(51, 21) + _linear(2, 5) + _linear(1, 5)
            + _linear(135, 32)),
        "unpitched_rhythm_encoder": (
            _linear(64, 48) + _linear(128, 40) + _linear(94, 16)
            + _linear(1, 5) + _linear(109, 32)),
        # head widths use rhythm_size=32 in get_mean_size even though the
        # layer inputs are n_rhythm_features=8 (model.py:447-460)
        "song_info_model": (
            _torch_lstm_param_count(320, 9) + _torch_lstm_param_count(9, 8)
            + _linear(256, 8) + _linear(8, 10) + _linear(18, 41)
            + _linear(256, 2) + _linear(8, 2) + _linear(4, 2)
            + _linear(256, 2) + _linear(8, 2) + _linear(4, 1)),
        "pitched_style_applier": (
            _linear(256, 66) + _linear(32, 10) + _linear(51, 12)
            + _linear(88, 240) + _linear(88, 210) + _linear(8, 20)
            + _linear(50, 5)),
        "unpitched_style_applier": (
            _linear(256, 650) + _linear(32, 17) + _linear(82, 376)
            + _linear(8, 2)),
    }
    for name, want in expected.items():
        got = count(params[name])
        assert got == want, (name, got, want)


def test_combine_matches_reference_formula():
    """combine == the reference's norm-weighted mean at batch=1."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 4, 5))
    got = np.asarray(combine(jnp.asarray(x), axis=1))
    # naive reference formula (model.py:796-815)
    norm = np.sqrt(1.0 + (x ** 2).sum(axis=(0, 2, 3), keepdims=True))
    want = (x * norm).sum(axis=1) / norm.sum()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_combine_pair_matches_reference_formula():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 4, 6))
    b = rng.normal(size=(1, 4, 6))
    got = np.asarray(combine_pair(jnp.asarray(a), jnp.asarray(b)))
    x = np.stack([a, b])
    norm = np.sqrt(1.0 + (x ** 2).sum(axis=(1, 2, 3), keepdims=True))
    want = (x * norm).sum(axis=0) / norm.sum()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_combine_mask_drops_padded_channels():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 5)).astype(np.float32)
    mask = np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    got = np.asarray(combine(jnp.asarray(x), axis=1, mask=jnp.asarray(mask)))
    # row 0: same as combining only first 2 channels
    want0 = np.asarray(combine(jnp.asarray(x[:1, :2]), axis=1))[0]
    np.testing.assert_allclose(got[0], want0, rtol=1e-5)
    # row 1: single channel -> x itself (weighted by its own norm / norm)
    np.testing.assert_allclose(got[1], x[1, 0], rtol=1e-5)


def test_losses_match_torch_oracle():
    """The full loss stack vs. an independent torch implementation of the
    reference's formulas (smooth-F1, masked MSEs, BCEs, quadratic-mean tree)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    B, C, R, T = 1, 2, 3, 4
    shape = (B, C, R, T, 10, 56, 5)
    target = (rng.random(shape) * (rng.random(shape[:-1] + (1,)) > 0.8)
              ).astype(np.float64)
    pred = rng.random(shape).astype(np.float64)
    pred[..., 0] *= 6
    u_shape = (B, 1, R, T, 10, 47, 2)
    u_target = (rng.random(u_shape) * (rng.random(u_shape[:-1] + (1,)) > 0.8))
    u_pred = rng.random(u_shape)
    u_pred[..., 0] *= 6
    inst_logits = rng.normal(size=(B, 41))
    inst_target = (rng.random((B, 41)) > 0.5).astype(np.float64)
    mode_logits = rng.normal(size=(B, 2))
    mode_target = np.array([[1.0, 0.0]])
    bpm_pred, bpm_target = np.array([130.0]), np.array([97.0])

    got = L.total_loss(
        jnp.asarray(inst_logits), jnp.asarray(inst_target),
        jnp.asarray(mode_logits), jnp.asarray(mode_target),
        jnp.asarray(bpm_pred), jnp.asarray(bpm_target),
        jnp.asarray(pred), jnp.asarray(target),
        jnp.asarray(u_pred), jnp.asarray(u_target), normalize=True)

    def t(x):
        return torch.tensor(x, dtype=torch.float64)

    def torch_channel_losses(inp, tgt, pitched):
        tv = tgt[..., 1]
        mask = (tv > 0).double()
        v = inp[..., 1]
        tp = torch.min(v, tv).sum()
        fp = torch.relu(v - tv).sum()
        fn = torch.relu(tv - v).sum()
        prec = tp / (tp + fp + 1e-7)
        rec = tp / (tp + fn + 1e-7)
        f1 = 2 * prec * rec / (prec + rec + 1e-7)
        notes = 1 - f1
        vel = (((tv - v) ** 2) * mask).sum() / mask.sum()
        dur = ((((inp[..., 0] - tgt[..., 0].clamp(max=6)) / 6) ** 2)
               * mask).sum() / mask.sum()
        if pitched:
            acc = F.binary_cross_entropy(inp[..., 2:], tgt[..., 2:],
                                         reduction="none")
            acc = (acc * mask.unsqueeze(-1)).sum() / (mask.sum() * 3)
            return notes, vel, dur, acc
        return notes, vel, dur

    def qmean(vals, weights=None):
        n = len(vals)
        if weights is None:
            weights = [1.0 / n] * n
        s = sum(w * v ** 2 for v, w in zip(vals, weights))
        return torch.sqrt(s)

    notes, vel, dur, acc = torch_channel_losses(t(pred), t(target), True)
    acc = torch.tanh(acc)
    notes_c = qmean([notes, vel], [notes, 1 - notes])
    pitched_total = qmean([dur, acc, notes_c])
    un, uv, ud = torch_channel_losses(t(u_pred), t(u_target), False)
    un_c = qmean([un, uv], [un, 1 - un])
    unpitched_total = qmean([ud, un_c])
    channels_total = qmean([pitched_total, unpitched_total])
    inst_loss = torch.tanh(F.binary_cross_entropy_with_logits(
        t(inst_logits), t(inst_target)))
    mode_loss = torch.tanh(F.cross_entropy(t(mode_logits),
                                           t(mode_target).argmax(1)))
    bpm_loss = ((t(bpm_pred) - t(bpm_target)) / 150.0) ** 2
    si_total = qmean([inst_loss, mode_loss, bpm_loss[0]])
    want_total = qmean([channels_total, si_total])

    assert np.isclose(float(got.pitched_notes), float(notes), rtol=1e-5)
    assert np.isclose(float(got.pitched_velocity), float(vel), rtol=1e-6)
    assert np.isclose(float(got.pitched_duration), float(dur), rtol=1e-6)
    assert np.isclose(float(got.pitched_accidentals), float(acc), rtol=1e-6)
    assert np.isclose(float(got.unpitched_total), float(unpitched_total),
                      rtol=1e-5)
    assert np.isclose(float(got.instruments), float(inst_loss), rtol=1e-6)
    assert np.isclose(float(got.mode), float(mode_loss), rtol=1e-6)
    assert np.isclose(float(got.bpm), float(bpm_loss[0]), rtol=1e-6)
    assert np.isclose(float(got.total), float(want_total), rtol=1e-5)


def test_hard_output_semantics():
    x = np.zeros((1, 1, 1, 1, 1, 3, 5))
    x[..., 0, :] = [2.0, 0.005, 0.3, 0.2, 0.1]   # tiny velocity -> zeroed
    x[..., 1, :] = [1.0, 0.5, 0.05, 0.08, 0.09]  # all acc <= .1 -> all zero
    x[..., 2, :] = [1.0, 0.5, 0.2, 0.9, 0.3]     # natural wins
    out = np.asarray(L.hard_output(jnp.asarray(x)))[0, 0, 0, 0, 0]
    assert out[0, 1] == 0.0
    np.testing.assert_array_equal(out[0, 2:], [1, 0, 0])
    np.testing.assert_array_equal(out[1, 2:], [0, 0, 0])
    np.testing.assert_array_equal(out[2, 2:], [0, 1, 0])


def test_lstm_masked_last_and_flip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)))
    lengths = jnp.array([3, 5])
    last = masked_last(x, lengths)
    np.testing.assert_allclose(last[0], x[0, 2])
    np.testing.assert_allclose(last[1], x[1, 4])
    flipped = masked_flip(x, lengths)
    np.testing.assert_allclose(flipped[0, :3], x[0, :3][::-1])
    np.testing.assert_allclose(flipped[0, 3:], x[0, 3:])
    np.testing.assert_allclose(flipped[1], x[1, ::-1])


def test_bilstm_length_equivalence():
    """BiLSTM on a padded sequence with lengths == BiLSTM on the unpadded
    prefix."""
    rng = jax.random.PRNGKey(1)
    x_full = jax.random.normal(rng, (1, 7, 6))
    lengths = jnp.array([4])
    model = BiLSTM(5)
    params = model.init(rng, x_full, lengths)
    padded = model.apply(params, x_full, lengths)
    unpadded = model.apply(params, x_full[:, :4], jnp.array([4]))
    np.testing.assert_allclose(padded[0, :4], unpadded[0], rtol=1e-5,
                               atol=1e-6)


def test_model_padding_equivalence():
    """A padded batched forward equals the unpadded forwards at valid cells."""
    model = StyleTransferModel()
    rng = jax.random.PRNGKey(2)
    mode, bpm, pitched, instf, unpitched = make_inputs(rng, C=2, R=4)
    params = model.init(rng, mode, bpm, pitched, instf, unpitched)

    (si, xp, xu) = model.apply(params, mode, bpm, pitched, instf, unpitched)

    # pad: +1 channel, +2 bars, and run with masks
    Cpad, Rpad = 3, 6
    p_pad = jnp.zeros((1, Cpad, Rpad, 4, 10, 56, 5)
                      ).at[:, :2, :4].set(pitched)
    u_pad = jnp.zeros((1, 1, Rpad, 4, 10, 47, 2)).at[:, :, :4].set(unpitched)
    i_pad = jnp.zeros((1, Cpad, 51)).at[:, :2].set(instf)
    cmask = jnp.array([[1.0, 1.0, 0.0]])
    umask = jnp.array([[1.0]])
    lengths = jnp.array([4])
    (si2, xp2, xu2) = model.apply(
        params, mode, bpm, p_pad, i_pad, u_pad,
        bar_lengths=lengths, channel_mask=cmask, uchannel_mask=umask)

    np.testing.assert_allclose(np.asarray(si2[2]), np.asarray(si[2]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(si2[0]), np.asarray(si[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xp2[:, :2, :4]), np.asarray(xp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xu2[:, :, :4]), np.asarray(xu),
                               rtol=1e-4, atol=1e-5)
