"""Weight-transplant parity against the reference's OWN executable torch model.

The strongest available parity proof: construct the actual
``style.model.StyleTransferModel`` from ``/root/reference`` (torch, CPU),
transplant its ``state_dict`` into the flax tree via
``mst_tpu.runtime.ref_checkpoint``, and assert tensor-level agreement of
``extract_style`` / ``predict_song_info`` / ``apply_style`` / ``forward`` /
``get_total_loss`` / ``hard_output`` (model.py:727-793, 818-832, 935-997) on
example-shaped inputs. Unlike tests/oracle.py (independently re-written from
the spec), a failure here means the math drifted from the reference itself.

Tolerances are fp32-scale (rtol 1e-4): the frameworks sum in different orders
(mst_tpu hoists LSTM input projections, distributes concat-Dense matmuls over
their parts, and fuses the applier grid tail), so bit-identity is not expected
— element-wise agreement to ~1e-5 relative is.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from mst_tpu.models import StyleTransferModel
from mst_tpu.ops import losses as L
from mst_tpu.runtime.ref_checkpoint import flax_params_from_torch_state_dict

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

# example-shaped inputs: 2 pitched channels + percussion, 5 bars of 4 beats
B, C, CU, R, T = 1, 2, 1, 5, 4


@pytest.fixture(scope="module")
def ref_module():
    """Import the reference package (skips when /root/reference is absent)."""
    import pathlib
    if not pathlib.Path(REFERENCE, "style", "model.py").exists():
        pytest.skip("reference checkout not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import style.model as rm
    return rm


@pytest.fixture(scope="module")
def models(ref_module):
    """(torch reference model, flax model, transplanted flax params)."""
    rm = ref_module
    torch.manual_seed(108)
    # constructor argument order: reference train-model.py:62-85
    ref = rm.StyleTransferModel(
        rm.PitchedChannelsEncoder(64, 128, 51),
        rm.UnpitchedChannelsEncoder(64, 128),
        rm.StyleEncoder(256, 128, 51),
        rm.MelodyEncoder(8, 64, 128, 51),
        rm.PitchedRhythmEncoder(32, 64, 128, 51),
        rm.UnpitchedRhythmEncoder(32, 64, 128),
        rm.SongInfoModel(8, 256, 32, 41),
        rm.PitchedStyleApplier(256, 8, 32, 51),
        rm.UnpitchedStyleApplier(256, 32),
    )
    ref.eval()

    model = StyleTransferModel()
    import jax
    rng = jax.random.PRNGKey(0)
    mode, bpm, pitched, instf, unpitched = _np_inputs()
    template = model.init(rng, jnp.asarray(mode), jnp.asarray(bpm),
                          jnp.asarray(pitched), jnp.asarray(instf),
                          jnp.asarray(unpitched))["params"]
    params, unused = flax_params_from_torch_state_dict(ref.state_dict(),
                                                       template)
    assert not unused, f"torch parameters with no flax counterpart: {unused}"
    return ref, model, {"params": params}


def _np_inputs(seed=7):
    rng = np.random.default_rng(seed)
    pitched = (rng.random((B, C, R, T, 10, 56, 5))
               * (rng.random((B, C, R, T, 10, 56, 1)) > 0.9)
               ).astype(np.float32)
    pitched[..., 0] *= 4.0  # durations in beats
    unpitched = (rng.random((B, CU, R, T, 10, 47, 2))
                 * (rng.random((B, CU, R, T, 10, 47, 1)) > 0.9)
                 ).astype(np.float32)
    unpitched[..., 0] *= 2.0
    instf = np.zeros((B, C, 51), np.float32)
    for c in range(C):
        instf[:, c, 3 * c] = 1.0
        instf[:, c, 40 + (3 * c) % 11] = 1.0
    mode = np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1))
    bpm = np.full((B,), 117.0, np.float32)
    return mode, bpm, pitched, instf, unpitched


def _t(x):
    return torch.tensor(x)


def _close(got, want, rtol=1e-4, atol=2e-5, label=""):
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=rtol, atol=atol, err_msg=label)


@pytest.fixture(scope="module")
def outputs(models):
    """Run both models once; every test below compares a slice of this."""
    ref, model, params = models
    mode, bpm, pitched, instf, unpitched = _np_inputs()
    with torch.no_grad():
        t_style, t_melody, t_rhythm = ref.extract_style(
            _t(mode), _t(bpm), _t(pitched), _t(instf), _t(unpitched))
        t_si = ref.predict_song_info(t_style, t_rhythm)
        t_xp, t_xu = ref.apply_style(t_style, t_melody, t_rhythm, _t(instf),
                                     unpitched=True)
    j_args = tuple(map(jnp.asarray, (mode, bpm, pitched, instf, unpitched)))
    j_style, j_melody, j_rhythm = model.apply(
        params, *j_args, method="extract_style")
    j_si = model.apply(params, j_style, j_rhythm, method="predict_song_info")
    j_xp, j_xu = model.apply(params, j_style, j_melody, j_rhythm, j_args[3],
                             True, method="apply_style")
    return dict(torch=(t_style, t_melody, t_rhythm, t_si, t_xp, t_xu),
                jax=(j_style, j_melody, j_rhythm, j_si, j_xp, j_xu))


def test_extract_style_matches_reference(outputs):
    """model.py:751-773 with transplanted weights."""
    t_style, t_melody, t_rhythm = outputs["torch"][:3]
    j_style, j_melody, j_rhythm = outputs["jax"][:3]
    assert j_style.shape == tuple(t_style.shape)
    assert j_melody.shape == tuple(t_melody.shape)
    assert j_rhythm.shape == tuple(t_rhythm.shape)
    _close(j_style, t_style, label="style latent")
    _close(j_melody, t_melody, label="melody latent")
    _close(j_rhythm, t_rhythm, label="rhythm latent")


def test_predict_song_info_matches_reference(outputs):
    """model.py:775-777 / 446-562."""
    t_inst, t_mode, t_bpm = outputs["torch"][3]
    j_inst, j_mode, j_bpm = outputs["jax"][3]
    _close(j_inst, t_inst, label="instrument logits")
    _close(j_mode, t_mode, label="mode logits")
    _close(j_bpm, t_bpm, rtol=1e-4, atol=1e-3, label="bpm")  # [50,200] scale


def test_apply_style_matches_reference(outputs):
    """model.py:779-782 / 582-724 (incl. the fused grid tail)."""
    t_xp, t_xu = outputs["torch"][4:]
    j_xp, j_xu = outputs["jax"][4:]
    _close(j_xp, t_xp, label="pitched applier output")
    _close(j_xu, t_xu, label="unpitched applier output")


def test_full_forward_matches_reference(models):
    """model.py:784-793 — the training-step forward, one call."""
    ref, model, params = models
    mode, bpm, pitched, instf, unpitched = _np_inputs(seed=11)
    with torch.no_grad():
        (t_inst, t_mode, t_bpm), t_xp, t_xu = ref(
            _t(mode), _t(bpm), _t(pitched), _t(instf), _t(unpitched))
    (j_inst, j_mode, j_bpm), j_xp, j_xu = model.apply(
        params, *map(jnp.asarray, (mode, bpm, pitched, instf, unpitched)))
    _close(j_inst, t_inst, label="instruments")
    _close(j_mode, t_mode, label="mode")
    _close(j_bpm, t_bpm, atol=1e-3, label="bpm")
    _close(j_xp, t_xp, label="pitched")
    _close(j_xu, t_xu, label="unpitched")


def test_pitched_only_forward_matches_reference(models):
    """unpitched_channels=None branch (model.py:758-760)."""
    ref, model, params = models
    mode, bpm, pitched, instf, _ = _np_inputs(seed=13)
    with torch.no_grad():
        (t_inst, t_mode, t_bpm), t_xp, t_xu = ref(
            _t(mode), _t(bpm), _t(pitched), _t(instf), None)
    (j_inst, j_mode, j_bpm), j_xp, j_xu = model.apply(
        params, jnp.asarray(mode), jnp.asarray(bpm), jnp.asarray(pitched),
        jnp.asarray(instf), None)
    assert t_xu is None and j_xu is None
    _close(j_inst, t_inst, label="instruments")
    _close(j_xp, t_xp, label="pitched")
    _close(j_bpm, t_bpm, atol=1e-3, label="bpm")


def test_total_loss_matches_reference(ref_module, models):
    """get_total_loss (model.py:935-997), called exactly as the reference's
    train loop does (train-model.py:110-119: note the (inst, bpm, mode)
    argument order whose inner swap cancels — SURVEY.md §2.1 quirk)."""
    rm = ref_module
    ref, model, params = models
    mode, bpm, pitched, instf, unpitched = _np_inputs(seed=17)
    with torch.no_grad():
        (t_inst, t_mode, t_bpm), t_xp, t_xu = ref(
            _t(mode), _t(bpm), _t(pitched), _t(instf), _t(unpitched))
        used = np.zeros((B, 41), np.float32)
        used[:, [0, 3, 40]] = 1.0
        t_losses = rm.get_total_loss(
            t_inst, _t(used),
            t_bpm, _t(np.full((B,), 117.0, np.float32)),
            t_mode, _t(mode),
            t_xp, _t(pitched),
            t_xu, _t(unpitched),
            normalize=True,
        )
    (j_inst, j_mode, j_bpm), j_xp, j_xu = model.apply(
        params, *map(jnp.asarray, (mode, bpm, pitched, instf, unpitched)))
    j_losses = L.total_loss(
        j_inst, jnp.asarray(used), j_mode, jnp.asarray(mode),
        j_bpm, jnp.full((B,), 117.0), j_xp, jnp.asarray(pitched),
        j_xu, jnp.asarray(unpitched), normalize=True)

    pairs = [
        (j_losses.total, t_losses["total"], "total"),
        (j_losses.channels_total, t_losses["channels_loss"]["total"],
         "channels"),
        (j_losses.pitched_total,
         t_losses["channels_loss"]["pitched"]["total"], "pitched total"),
        (j_losses.pitched_notes,
         t_losses["channels_loss"]["pitched"]["notes_loss"], "notes"),
        (j_losses.pitched_velocity,
         t_losses["channels_loss"]["pitched"]["velocity_loss"], "velocity"),
        (j_losses.pitched_duration,
         t_losses["channels_loss"]["pitched"]["duration_loss"], "duration"),
        (j_losses.pitched_accidentals,
         t_losses["channels_loss"]["pitched"]["accidentals_loss"],
         "accidentals"),
        (j_losses.unpitched_total,
         t_losses["channels_loss"]["unpitched"]["total"], "unpitched total"),
        (j_losses.song_info_total, t_losses["song_info_loss"]["total"],
         "song info"),
        (j_losses.instruments,
         t_losses["song_info_loss"]["instruments_loss"], "instruments"),
        (j_losses.mode, t_losses["song_info_loss"]["mode_loss"], "mode"),
        (j_losses.bpm, t_losses["song_info_loss"]["bpm_loss"], "bpm"),
    ]
    for got, want, label in pairs:
        np.testing.assert_allclose(
            float(np.asarray(got)), float(want.reshape(-1)[0]),
            rtol=2e-4, atol=2e-5, err_msg=label)


def test_hard_output_matches_reference(ref_module, models, outputs):
    """hard_output thresholding (model.py:818-832) on real applier outputs."""
    rm = ref_module
    t_xp = outputs["torch"][4]
    j_xp = outputs["jax"][4]
    with torch.no_grad():
        want = rm.hard_output(t_xp.clone())
    got = L.hard_output(j_xp)
    # thresholding can flip cells whose velocity/accidental sits within fp32
    # noise of .01/.1; compare where both agree the cell is on or off
    got = np.asarray(got)
    want = want.detach().numpy()
    vel_stable = np.abs(want[..., 1] - 0.01) > 1e-4
    np.testing.assert_allclose(got[..., :2][vel_stable],
                               want[..., :2][vel_stable],
                               rtol=1e-4, atol=2e-5)
    acc_stable = vel_stable & (
        np.abs(t_xp.detach().numpy()[..., 2:] - 0.1) > 1e-4).all(-1)
    np.testing.assert_array_equal(got[..., 2:][acc_stable],
                                  want[..., 2:][acc_stable])
