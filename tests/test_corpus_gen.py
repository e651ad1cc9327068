"""Smoke tests for tools/make_corpus.py: generated songs must survive the
full ingestion pipeline (parse -> read_midi -> get_input) with the expected
diversity knobs (meter, percussion, key detection)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    from make_corpus import generate_song
    from mst_tpu.io import create_midi, native

    out = tmp_path_factory.mktemp("gen_corpus")
    rng = np.random.default_rng(11)
    paths = []
    for i in range(6):
        info, instruments = generate_song(rng)
        assert instruments, "generator produced an empty song"
        path = str(out / f"gen_{i}.mid")
        native.write_midi_file(path, create_midi(info, *instruments))
        paths.append(path)
    return paths


def test_generated_songs_ingest(generated):
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi

    meters = set()
    for path in generated:
        mid = load_midi_from_file(path)
        assert mid is not None
        channels, info = read_midi(mid)
        song = get_input(channels, info)
        assert song.n_channels >= 1
        assert song.n_bars >= 32
        assert 50 <= song.info.bpm <= 200
        meters.add(song.info.n_beats)
    # seed 11 must exercise at least the 4/4 grid; 3/4 appears with p=.1
    assert 4 in meters


def test_generated_song_roundtrips_byte_identical(generated):
    """encode(parse(file)) == file bytes: the generator writes through the
    same SMF encoder the codec round-trip tests pin down."""
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.io.smf import encode_midi

    with open(generated[0], "rb") as fh:
        raw = fh.read()
    assert encode_midi(load_midi_from_file(generated[0])) == raw
