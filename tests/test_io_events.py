"""SMF codec + event pipeline on the bundled golden corpus and random streams."""

import numpy as np
import pytest

from mst_tpu.io import smf
from mst_tpu.io.midi import NoteStream, load_midi_from_file
from mst_tpu.ops.events import (
    merge_tracks, pair_notes, read_midi, split_channels)

import oracle


def _parsed_examples(example_midis, limit=None):
    out = []
    for path in example_midis[:limit]:
        data = load_midi_from_file(path)
        if data is not None:
            out.append((path, data))
    return out


def test_parse_all_examples(example_midis):
    """Every bundled example parses (they were written by the reference
    pipeline, i.e. by mido)."""
    parsed = _parsed_examples(example_midis)
    assert len(parsed) == len(example_midis)
    for path, data in parsed:
        assert data.ticks_per_beat > 0
        assert len(data.tracks) >= 1
        total = sum(len(t) for t in data.tracks)
        assert total > 10, path


def test_byte_roundtrip_examples(example_midis):
    """parse -> encode reproduces the file byte-for-byte (all bundled examples
    were written by mido through the reference's create_midi, and our encoder
    follows the same conventions)."""
    checked = 0
    for path, data in _parsed_examples(example_midis):
        if any((t.type == smf.EV_META_OTHER).any() or
               (t.type == smf.EV_SYSEX).any() for t in data.tracks):
            continue  # events our encoder does not re-emit
        raw = path.read_bytes()
        assert smf.encode_midi(data) == raw, path
        checked += 1
    assert checked > 0


def test_read_midi_examples(example_midis):
    for path, data in _parsed_examples(example_midis, limit=10):
        channels, info = read_midi(data)
        assert channels, path
        assert info.ticks_per_beat == data.ticks_per_beat
        assert 1 <= info.numerator <= 32
        assert info.tempo > 0
        assert info.duration > 0
        for ch in channels:
            assert ch["messages"].is_on.any()
            v = ch["messages"].velocity
            assert (v >= 0).all() and (v <= 1).all()


def test_merge_tracks_is_time_sorted(example_midis):
    for path, data in _parsed_examples(example_midis, limit=5):
        stream = merge_tracks(data)
        assert (np.diff(stream.time) >= 0).all()
        glob, chans = split_channels(stream)
        assert (glob.channel == -1).all()
        for ch in chans:
            assert len(np.unique(ch.channel)) == 1


def _random_stream(rng, n=500, n_notes=12):
    note = rng.integers(40, 40 + n_notes, n)
    is_on = rng.random(n) < 0.55
    vel = np.where(is_on, rng.random(n) * 0.9 + 0.05, 0.0)
    time = np.sort(rng.integers(0, 20000, n))
    return NoteStream(is_on=is_on, note=note.astype(np.int32),
                      velocity=vel, time=time.astype(np.int64))


def test_pair_notes_matches_oracle():
    rng = np.random.default_rng(3)
    for _ in range(20):
        stream = _random_stream(rng)
        got = pair_notes(stream)
        want = oracle.pair_notes_naive(stream.is_on, stream.note,
                                       stream.velocity, stream.time)
        assert len(got) == len(want)
        for i, rec in enumerate(want):
            assert got.note_id[i] == rec["note_id"]
            assert got.time[i] == rec["time"]
            assert got.end_time[i] == rec["end_time"], (i, rec)
            assert got.velocity[i] == rec["velocity"]


def test_pair_notes_on_examples(example_midis):
    for path, data in _parsed_examples(example_midis, limit=8):
        channels, info = read_midi(data)
        for ch in channels:
            got = pair_notes(ch["messages"])
            want = oracle.pair_notes_naive(
                ch["messages"].is_on, ch["messages"].note,
                ch["messages"].velocity, ch["messages"].time)
            assert len(got) == len(want)
            np.testing.assert_array_equal(
                got.end_time, np.array([r["end_time"] for r in want]))


def test_parser_rejects_garbage():
    with pytest.raises(smf.MidiParseError):
        smf.parse_midi_bytes(b"not a midi file at all")
    with pytest.raises(smf.MidiParseError):
        smf.parse_midi_bytes(b"MThd" + b"\x00" * 10)
    # truncated mid-track
    good = smf.encode_midi(smf.MidiFileData(1, 480, [smf.track_from_lists(
        [smf.EV_NOTE_ON, smf.EV_END_OF_TRACK], [0, 10], [0, -1], [60, 0],
        [64, 0])]))
    with pytest.raises(smf.MidiParseError):
        smf.parse_midi_bytes(good[:-3])
    assert load_midi_from_file("/nonexistent/file.mid") is None
