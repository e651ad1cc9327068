"""MIDI -> audio rendering (additive synthesis) for the audio-side eval path.

The reference ships offline-rendered mp3s as listening artifacts only
(examples/, SURVEY.md §6); BASELINE.json configs[3-4] require an audio-side
spectral eval. This module renders MIDI natively (no fluidsynth/ffmpeg in the
image — mp3 decode is out of scope, WAV I/O via scipy): each note becomes a
bank of decaying harmonics with an ADSR-ish envelope; percussion becomes
band-filtered noise bursts. Quality target is "spectrally representative", not
musical fidelity — it feeds mel-spectrogram similarity, not ears.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from mst_tpu.io.midi import tick2second
from mst_tpu.ops.events import NoteArray, pair_notes

SAMPLE_RATE = 22050
_HARMONICS = np.array([1.0, 0.5, 0.25, 0.125])


def note_to_hz(note_id) -> np.ndarray:
    return 440.0 * 2.0 ** ((np.asarray(note_id, dtype=np.float64) - 69) / 12)


def render_notes(notes: NoteArray, ticks_per_beat: int, tempo: int,
                 pitched: bool = True, sample_rate: int = SAMPLE_RATE,
                 total_seconds: Optional[float] = None) -> np.ndarray:
    """SoA notes -> mono float32 PCM."""
    if len(notes) == 0:
        return np.zeros(int((total_seconds or 1.0) * sample_rate), np.float32)
    onset = tick2second(notes.time, ticks_per_beat, tempo)
    dur = np.maximum(tick2second(notes.duration, ticks_per_beat, tempo), 0.02)
    end = onset + dur
    if total_seconds is None:
        total_seconds = float(end.max()) + 0.5
    out = np.zeros(int(total_seconds * sample_rate) + 1, np.float64)
    freqs = note_to_hz(notes.note_id)
    rng = np.random.default_rng(0)
    for i in range(len(notes)):
        n = int(dur[i] * sample_rate)
        if n <= 0:
            continue
        start = int(onset[i] * sample_rate)
        t = np.arange(n) / sample_rate
        env = np.minimum(1.0, t / 0.01) * np.exp(-3.0 * t / max(dur[i], 1e-3))
        if pitched:
            wave = np.zeros(n)
            for h, amp in enumerate(_HARMONICS, start=1):
                f = freqs[i] * h
                if f < sample_rate / 2:
                    wave += amp * np.sin(2 * np.pi * f * t)
        else:
            # noise burst with a crude per-drum tilt: higher notes -> brighter
            from scipy.signal import lfilter
            wave = rng.standard_normal(n)
            alpha = min(0.95, 0.3 + 0.01 * int(notes.note_id[i]))
            # one-pole y[j] = alpha*x[j] + (1-alpha)*y[j-1], y[0] = x[0]
            # (vectorized: the per-sample Python loop made drum-heavy songs
            # take minutes to render)
            wave = lfilter([alpha], [1.0, -(1.0 - alpha)], wave,
                           zi=np.array([(1.0 - alpha) * wave[0]]))[0]
        seg = wave * env * float(notes.velocity[i])
        out[start:start + n] += seg[:max(0, len(out) - start)]
    peak = np.abs(out).max()
    if peak > 0:
        out = out / max(peak, 1.0)
    return out.astype(np.float32)


def render_midi(midi_data, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Parsed MidiFileData -> mono PCM: all channels rendered and mixed."""
    from mst_tpu.ops.events import read_midi
    from mst_tpu.io.midi import is_pitched
    channels, info = read_midi(midi_data)
    total = tick2second(info.duration, info.ticks_per_beat, info.tempo) + 0.5
    mix = np.zeros(int(total * sample_rate) + 1, np.float64)
    for ch in channels:
        notes = pair_notes(ch["messages"])
        pcm = render_notes(notes, info.ticks_per_beat, info.tempo,
                           pitched=is_pitched(ch["instrument_id"]),
                           sample_rate=sample_rate, total_seconds=total)
        mix[:len(pcm)] += pcm
    peak = np.abs(mix).max()
    if peak > 0:
        mix = mix / peak
    return mix.astype(np.float32)


def write_wav(path, pcm: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    from scipy.io import wavfile
    wavfile.write(path, sample_rate, (np.clip(pcm, -1, 1) * 32767
                                      ).astype(np.int16))
