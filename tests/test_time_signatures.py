"""Non-4/4 time signatures through the whole pipeline (the reference supports
any constant numerator; the beat axis of every tensor follows it)."""

import numpy as np

from mst_tpu.io import create_midi, load_midi_from_file, smf
from mst_tpu.io.midi import NoteStream
from mst_tpu.ops.events import read_midi
from mst_tpu.data.pipeline import get_input


def _make_34_song(tmp_path, tpb=480):
    """A little 3/4 waltz: bass on beat 1, chords on 2 and 3."""
    n_bars = 8
    times, notes, vels, ons = [], [], [], []
    for bar in range(n_bars):
        # start at bar 1: a time-signature meta at the same tick as the first
        # note counts as a mid-song change and is rejected (reference parity)
        base = (bar + 1) * 3 * tpb
        for beat, pitch in ((0, 48), (1, 64), (2, 67)):
            t = base + beat * tpb
            times += [t, t + tpb // 2]
            notes += [pitch + bar % 3, pitch + bar % 3]
            vels += [0.7, 0.0]
            ons += [True, False]
    stream = NoteStream(is_on=np.array(ons), note=np.array(notes, np.int32),
                        velocity=np.array(vels), time=np.array(times, np.int64))
    info = {"ticks_per_beat": tpb,
            "time_signature": {"numerator": 3, "denominator": 4},
            "tempo": 500000, "ticks_per_bar": 3 * tpb,
            "duration": (n_bars + 1) * 3 * tpb}
    mid = create_midi(info, {"channel_id": 0, "instrument_id": 0,
                             "messages": stream})
    path = tmp_path / "waltz34.mid"
    smf.write_midi_file(path, mid)
    return path


def test_34_ingestion_and_shapes(tmp_path):
    path = _make_34_song(tmp_path)
    channels, info = read_midi(load_midi_from_file(path))
    assert info.numerator == 3 and info.n_beats == 3
    assert info.ticks_per_bar == 3 * 480
    song = get_input(channels, info)
    assert song.pitched.shape[2] == 3  # beat axis follows the signature
    # every note lands on an exact beat, fraction index 0
    nz = np.nonzero(song.pitched[..., 1])
    assert (nz[3] == 0).all()  # fraction axis all zero


def test_34_model_forward(tmp_path):
    import jax
    import jax.numpy as jnp
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.train import batch_from_song

    path = _make_34_song(tmp_path)
    channels, info = read_midi(load_midi_from_file(path))
    song = get_input(channels, info)
    batch = batch_from_song(song, max_n_bars=8)
    assert batch.pitched.shape[3] == 3  # (B, C, bar, beat, ...)
    model = StyleTransferModel()
    params = model.init(jax.random.PRNGKey(0), batch.mode, batch.bpm,
                        batch.pitched, batch.instruments_features, None)
    (inst, mode, bpm), x_p, _ = model.apply(
        params, batch.mode, batch.bpm, batch.pitched,
        batch.instruments_features, None)
    assert x_p.shape == batch.pitched.shape
    assert np.isfinite(np.asarray(x_p)).all()


def test_mid_song_signature_change_rejected(tmp_path):
    """A time-signature change between notes raises MidiFormatError
    (parity: midi_conversion.py:146-154)."""
    import pytest
    from mst_tpu.exceptions import MidiFormatError
    from mst_tpu.io.smf import (
        EV_NOTE_ON, EV_NOTE_OFF, EV_TIME_SIG, EV_END_OF_TRACK,
        MidiFileData, track_from_lists)
    track = track_from_lists(
        [EV_TIME_SIG, EV_NOTE_ON, EV_TIME_SIG, EV_NOTE_OFF, EV_NOTE_ON,
         EV_NOTE_OFF, EV_END_OF_TRACK],
        [0, 0, 480, 0, 480, 480, 0],
        [-1, 0, -1, 0, 0, 0, -1],
        [4, 60, 3, 60, 62, 62, 0],
        [4, 80, 4, 0, 80, 0, 0])
    data = MidiFileData(format=1, ticks_per_beat=480, tracks=[track])
    with pytest.raises(MidiFormatError, match="Time signature"):
        read_midi(data)
