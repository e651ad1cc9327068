"""Minimal mido-API shim backed by :mod:`mst_tpu.io.smf`.

The executable reference (``/root/reference/style``) imports ``mido`` for all
MIDI file I/O (style/midi.py:6-7, style/midi_conversion.py:8,
style/style_transfer.py:4); mido is not installed in this image. This shim
exposes exactly the surface those modules use — ``MidiFile`` / ``MidiTrack`` /
``Message`` / ``MetaMessage`` / ``KeySignatureError`` and the tempo-arithmetic
helpers — implemented on top of this repo's own SMF codec, so the reference
package can run **unmodified** and its outputs can be diffed against mst_tpu's
(tests/test_e2e_reference_parity.py).

Install with :func:`install` (registers ``sys.modules["mido"]``) before
importing any ``style.*`` module.

Only behavior the reference exercises is reproduced:

- reading: per-track message lists with delta ``.time``; channel messages have
  a ``.channel`` attribute, meta messages do not (split_channels dispatches on
  ``hasattr(msg, 'channel')``, style/midi_conversion.py:61);
- writing: ``MidiFile.save`` with mido's writer conventions (running status,
  time_signature clocks=24/32nds=8) — mst_tpu.io.smf.encode_midi already
  matches those byte-for-byte;
- ``tick2second``/``second2tick``/``tempo2bpm``/``bpm2tempo`` with mido's
  float semantics (``second2tick(math.inf, ...)`` stays inf, as create_midi
  relies on — style/midi.py:121-123);
- parse errors surface as ``ValueError``/``OSError``/``KeySignatureError`` so
  the reference's defensive ``load_midi_from_file`` (style/midi.py:104-108)
  skips exactly the files mst_tpu's loader skips.
"""

from __future__ import annotations

import sys

import numpy as np

from mst_tpu.exceptions import MidiParseError
from mst_tpu.io import smf


class KeySignatureError(Exception):
    pass


def tick2second(tick, ticks_per_beat, tempo):
    return tick * (tempo * 1e-6 / ticks_per_beat)


def second2tick(second, ticks_per_beat, tempo):
    return second / (tempo * 1e-6 / ticks_per_beat)


def tempo2bpm(tempo):
    return 60.0 * 1e6 / tempo


def bpm2tempo(bpm):
    return int(round(60.0 * 1e6 / bpm))


def open_output(portname=None):  # play_midi only; no MIDI ports here
    raise NotImplementedError("no MIDI output ports in this environment")


_DEFAULTS = {
    "note_on": dict(channel=0, note=0, velocity=64, time=0),
    "note_off": dict(channel=0, note=0, velocity=64, time=0),
    "polytouch": dict(channel=0, note=0, value=0, time=0),
    "control_change": dict(channel=0, control=0, value=0, time=0),
    "program_change": dict(channel=0, program=0, time=0),
    "aftertouch": dict(channel=0, value=0, time=0),
    "pitchwheel": dict(channel=0, pitch=0, time=0),
    "sysex": dict(data=(), time=0),
}

_META_DEFAULTS = {
    "time_signature": dict(numerator=4, denominator=4, time=0),
    "set_tempo": dict(tempo=500000, time=0),
    "key_signature": dict(key="C", time=0),
    "end_of_track": dict(time=0),
}

# mido's key_signature name tables (sf -7..7, mi 0/1)
_KEYS_MAJOR = ("Cb", "Gb", "Db", "Ab", "Eb", "Bb", "F", "C", "G", "D", "A",
               "E", "B", "F#", "C#")
_KEYS_MINOR = ("Abm", "Ebm", "Bbm", "Fm", "Cm", "Gm", "Dm", "Am", "Em", "Bm",
               "F#m", "C#m", "G#m", "D#m", "A#m")


class Message:
    """Channel message: has a ``.channel`` attribute (split_channels relies on
    the hasattr distinction vs :class:`MetaMessage`)."""

    is_meta = False

    def __init__(self, type, **kwargs):
        self.type = type
        for name, value in _DEFAULTS.get(type, dict(time=0)).items():
            setattr(self, name, value)
        for name, value in kwargs.items():
            setattr(self, name, value)

    def __repr__(self):
        attrs = ", ".join(f"{k}={v!r}" for k, v in vars(self).items()
                          if k != "type")
        return f"Message({self.type!r}, {attrs})"


class MetaMessage:
    """Meta message: deliberately no ``.channel`` attribute."""

    is_meta = True

    def __init__(self, type, **kwargs):
        self.type = type
        for name, value in _META_DEFAULTS.get(type, dict(time=0)).items():
            setattr(self, name, value)
        for name, value in kwargs.items():
            setattr(self, name, value)

    def __repr__(self):
        attrs = ", ".join(f"{k}={v!r}" for k, v in vars(self).items()
                          if k != "type")
        return f"MetaMessage({self.type!r}, {attrs})"


class MidiTrack(list):
    pass


_META_OTHER_NAMES = {
    0x00: "sequence_number", 0x01: "text", 0x02: "copyright",
    0x03: "track_name", 0x04: "instrument_name", 0x05: "lyrics",
    0x06: "marker", 0x07: "cue_marker", 0x20: "channel_prefix",
    0x21: "midi_port", 0x54: "smpte_offset", 0x7F: "sequencer_specific",
}


def _messages_from_track(track: smf.TrackEvents) -> MidiTrack:
    out = MidiTrack()
    for i in range(len(track)):
        ev = int(track.type[i])
        delta = int(track.delta[i])
        ch = int(track.channel[i])
        a = int(track.a[i])
        b = int(track.b[i])
        if ev == smf.EV_NOTE_ON:
            msg = Message("note_on", channel=ch, note=a, velocity=b,
                          time=delta)
        elif ev == smf.EV_NOTE_OFF:
            msg = Message("note_off", channel=ch, note=a, velocity=b,
                          time=delta)
        elif ev == smf.EV_POLYTOUCH:
            msg = Message("polytouch", channel=ch, note=a, value=b,
                          time=delta)
        elif ev == smf.EV_CONTROL:
            msg = Message("control_change", channel=ch, control=a, value=b,
                          time=delta)
        elif ev == smf.EV_PROGRAM:
            msg = Message("program_change", channel=ch, program=a, time=delta)
        elif ev == smf.EV_AFTERTOUCH:
            msg = Message("aftertouch", channel=ch, value=a, time=delta)
        elif ev == smf.EV_PITCHWHEEL:
            msg = Message("pitchwheel", channel=ch, pitch=a - 8192,
                          time=delta)
        elif ev == smf.EV_SYSEX:
            msg = Message("sysex", time=delta)
        elif ev == smf.EV_TEMPO:
            msg = MetaMessage("set_tempo", tempo=a, time=delta)
        elif ev == smf.EV_TIME_SIG:
            msg = MetaMessage("time_signature", numerator=a, denominator=b,
                              time=delta)
        elif ev == smf.EV_KEY_SIG:
            names = _KEYS_MINOR if b else _KEYS_MAJOR
            msg = MetaMessage("key_signature", key=names[a + 7], time=delta)
        elif ev == smf.EV_END_OF_TRACK:
            msg = MetaMessage("end_of_track", time=delta)
        else:
            msg = MetaMessage(_META_OTHER_NAMES.get(a, "unknown_meta"),
                              time=delta)
        out.append(msg)
    return out


def _track_to_events(track) -> smf.TrackEvents:
    types, deltas, channels, a_col, b_col = [], [], [], [], []

    def emit(ev, time, ch, a, b):
        types.append(ev); deltas.append(int(time))
        channels.append(ch); a_col.append(int(a)); b_col.append(int(b))

    has_eot = False
    for msg in track:
        t = msg.type
        if t == "note_on":
            emit(smf.EV_NOTE_ON, msg.time, msg.channel, msg.note,
                 msg.velocity)
        elif t == "note_off":
            emit(smf.EV_NOTE_OFF, msg.time, msg.channel, msg.note,
                 msg.velocity)
        elif t == "polytouch":
            emit(smf.EV_POLYTOUCH, msg.time, msg.channel, msg.note, msg.value)
        elif t == "control_change":
            emit(smf.EV_CONTROL, msg.time, msg.channel, msg.control,
                 msg.value)
        elif t == "program_change":
            emit(smf.EV_PROGRAM, msg.time, msg.channel, msg.program, 0)
        elif t == "aftertouch":
            emit(smf.EV_AFTERTOUCH, msg.time, msg.channel, msg.value, 0)
        elif t == "pitchwheel":
            emit(smf.EV_PITCHWHEEL, msg.time, msg.channel, msg.pitch + 8192,
                 0)
        elif t == "set_tempo":
            emit(smf.EV_TEMPO, msg.time, -1, msg.tempo, 0)
        elif t == "time_signature":
            emit(smf.EV_TIME_SIG, msg.time, -1, msg.numerator,
                 msg.denominator)
        elif t == "key_signature":
            key = msg.key
            minor = key.endswith("m")
            names = _KEYS_MINOR if minor else _KEYS_MAJOR
            emit(smf.EV_KEY_SIG, msg.time, -1, names.index(key) - 7,
                 int(minor))
        elif t == "end_of_track":
            emit(smf.EV_END_OF_TRACK, msg.time, -1, 0, 0)
            has_eot = True
            break
        else:
            raise ValueError(f"shim cannot encode message type {t!r}")
    if not has_eot:  # mido appends end_of_track on save when absent
        emit(smf.EV_END_OF_TRACK, 0, -1, 0, 0)
    return smf.track_from_lists(types, deltas, channels, a_col, b_col)


class MidiFile:
    def __init__(self, filename=None, type=1, ticks_per_beat=480):
        self.type = type
        self.ticks_per_beat = ticks_per_beat
        self.tracks = []
        if filename is not None:
            try:
                data = smf.parse_midi_file(filename)
            except MidiParseError as e:
                # mido raises ValueError/KeyError/EOFError/KeySignatureError
                # here; ValueError is in load_midi_from_file's catch set
                raise ValueError(str(e)) from e
            self.type = data.format
            self.ticks_per_beat = data.ticks_per_beat
            self.tracks = [_messages_from_track(t) for t in data.tracks]

    def save(self, filename):
        data = smf.MidiFileData(
            format=self.type, ticks_per_beat=self.ticks_per_beat,
            tracks=[_track_to_events(t) for t in self.tracks])
        smf.write_midi_file(filename, data)


def _flatten_dict(d, reducer="tuple", _prefix=()):
    """Shim for the ``flatten_dict`` package (also absent) — only the
    ``flatten(d, reducer=...)`` entry the reference imports
    (style/utils/data.py:5, train-model.py:4)."""
    join = {"path": "/", "underscore": "_", "dot": "."}.get(reducer)
    out = {}
    for key, value in d.items():
        path = _prefix + (str(key),)
        if isinstance(value, dict):
            out.update(_flatten_dict(value, reducer, path))
        else:
            out[path if join is None else join.join(path)] = value
    return out


def _patch_sklearn_onehot():
    """The reference was written against sklearn <1.2 whose OneHotEncoder took
    ``sparse=`` (style/data.py:23,26); this image's sklearn only accepts
    ``sparse_output=``. Wrap the class so the old keyword maps to the new one
    — sklearn's dense one-hot output is unchanged between versions."""
    import sklearn.preprocessing as sp
    if getattr(sp.OneHotEncoder, "_mst_tpu_sparse_shim", False):
        return
    base = sp.OneHotEncoder

    def OneHotEncoder(*args, sparse=None, **kwargs):
        # a factory, not a subclass: sklearn validates estimator __init__
        # signatures, and the reference never isinstance-checks the encoder
        if sparse is not None:
            kwargs["sparse_output"] = sparse
        return base(*args, **kwargs)

    OneHotEncoder._mst_tpu_sparse_shim = True
    sp.OneHotEncoder = OneHotEncoder


def _patch_pandas_writable_asarray():
    """pandas >=3.0 (always copy-on-write) returns READ-ONLY arrays from
    ``np.asarray(Series)``; the reference divides one in place
    (style/data.py:83 ``keys_dist /= total``). Restore the pre-3.0 behavior
    (writable array) by copying when the view is frozen."""
    import pandas as pd
    if getattr(pd.Series, "_mst_tpu_writable_array", False):
        return
    orig = pd.Series.__array__

    def __array__(self, dtype=None, copy=None):
        arr = orig(self, dtype)
        if not arr.flags.writeable:
            arr = arr.copy()
        return arr

    pd.Series.__array__ = __array__
    pd.Series._mst_tpu_writable_array = True


def install():
    """Register this module as ``mido`` (and a minimal ``flatten_dict``) so
    the reference package imports resolve here. Idempotent."""
    module = sys.modules[__name__]
    sys.modules.setdefault("mido", module)
    if "flatten_dict" not in sys.modules:
        import types
        fd = types.ModuleType("flatten_dict")
        fd.flatten = _flatten_dict
        sys.modules["flatten_dict"] = fd
    if "py_utils" not in sys.modules:
        # style/scales.py:203 imports py_utils.metrics.ndcg — a dependency
        # missing from the reference's own requirements.txt. Its value is
        # stored but DEAD: the loss line consuming it is commented out
        # (style/scales.py:187-188), so any float satisfies parity.
        import types
        pu = types.ModuleType("py_utils")
        pm = types.ModuleType("py_utils.metrics")
        pm.ndcg = lambda scale_dist, most_common: 0.0
        pu.metrics = pm
        sys.modules["py_utils"] = pu
        sys.modules["py_utils.metrics"] = pm
    _patch_sklearn_onehot()
    _patch_pandas_writable_asarray()
    return module
