"""Fuzz the SMF codec's defensive net: random corruption of a real file must
always yield MidiParseError (or a clean parse) — never an uncaught exception
type that would crash the training loop's skip-bad-files path
(style/midi.py:104-108 parity) or, for the C++ codec, a process fault."""

import os
import tempfile

import numpy as np
import pytest

from mst_tpu.io import native, smf
from mst_tpu.io.smf import parse_midi_bytes

_EXAMPLE = ("/root/reference/examples/style transfer - midi/"
            "My Way/original/Angie.4.mid")


def _mutations(raw: bytes, n_trials: int, seed: int):
    rng = np.random.default_rng(seed)
    for trial in range(n_trials):
        buf = bytearray(raw)
        kind = trial % 3
        if kind == 0:  # point mutations
            for _ in range(rng.integers(1, 20)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        elif kind == 1:  # truncation
            buf = buf[:rng.integers(0, len(buf))]
        else:  # garbage block splice
            start = rng.integers(0, len(buf))
            n = int(rng.integers(1, 200))
            buf[start:start + n] = bytes(rng.integers(0, 256, n).tolist())
        yield bytes(buf)


@pytest.fixture(scope="module")
def raw():
    with open(_EXAMPLE, "rb") as fh:
        return fh.read()


def test_python_parser_never_escapes_the_net(raw):
    for buf in _mutations(raw, 150, seed=0):
        try:
            parse_midi_bytes(buf)
        except smf.MidiParseError:
            pass  # the defensive loader's catch set


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_parser_never_escapes_the_net(raw):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "fuzz.mid")
        for buf in _mutations(raw, 150, seed=1):
            with open(path, "wb") as fh:
                fh.write(buf)
            try:
                native.parse_midi_file(path)
            except (OSError, smf.MidiParseError):
                pass
