"""Native C++ SMF codec: byte/array parity with the pure-Python reference
implementation on the golden corpus and on malformed inputs."""

import numpy as np
import pytest

from mst_tpu.io import native, smf

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libmidicodec.so not built")


def test_parse_parity_on_examples(example_midis):
    for path in example_midis:
        raw = path.read_bytes()
        d_native = native.parse_midi_bytes(raw)
        d_python = smf.parse_midi_bytes(raw)
        assert d_native.format == d_python.format
        assert d_native.ticks_per_beat == d_python.ticks_per_beat
        assert len(d_native.tracks) == len(d_python.tracks)
        for tn, tp in zip(d_native.tracks, d_python.tracks):
            for field in ("type", "delta", "channel", "a", "b"):
                np.testing.assert_array_equal(getattr(tn, field),
                                              getattr(tp, field))


def test_encode_parity_on_examples(example_midis):
    for path in example_midis:
        data = smf.parse_midi_bytes(path.read_bytes())
        assert native.encode_midi(data) == smf.encode_midi(data)


def test_native_rejects_garbage():
    from mst_tpu.exceptions import MidiParseError
    for bad in (b"", b"nope", b"MThd" + b"\x00" * 20,
                b"MThd\x00\x00\x00\x06\x00\x01\x00\x01\x80\x00"):  # SMPTE
        with pytest.raises(MidiParseError):
            native.parse_midi_bytes(bad)


def test_native_rejects_truncation(example_midis):
    raw = example_midis[0].read_bytes()
    from mst_tpu.exceptions import MidiParseError
    with pytest.raises(MidiParseError):
        native.parse_midi_bytes(raw[:-5])
