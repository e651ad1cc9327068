"""Audio eval: synthesis, STFT/mel correctness, spectral similarity behavior."""

import numpy as np
import pytest

from mst_tpu.audio import (
    mel_filterbank, mel_spectrogram, render_midi, spectral_similarity,
    spectral_similarity_midi, stft, write_wav)
from mst_tpu.audio.synth import SAMPLE_RATE, note_to_hz, render_notes
from mst_tpu.io import load_midi_from_file
from mst_tpu.ops.events import NoteArray


def test_note_to_hz():
    assert np.isclose(note_to_hz(69), 440.0)
    assert np.isclose(note_to_hz(81), 880.0)
    assert np.isclose(note_to_hz(60), 261.6256, atol=1e-3)


def test_stft_peak_at_tone_frequency():
    sr = SAMPLE_RATE
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mag = np.asarray(stft(tone))
    bin_hz = sr / 1024
    assert abs(mag.mean(axis=0).argmax() * bin_hz - 1000.0) < bin_hz


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank()
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1)[5:-5] > 0).all()  # interior bins covered


def test_mel_spectrogram_tone_vs_noise():
    sr = SAMPLE_RATE
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = np.asarray(mel_spectrogram(tone))
    assert mel.shape[1] == 80
    # energy concentrated in few mel bands for a pure tone
    dist = mel.mean(axis=0) / mel.mean(axis=0).sum()
    assert (np.sort(dist)[-3:].sum()) > 0.8


def test_render_notes_produces_audio():
    notes = NoteArray(
        note_id=np.array([60, 64, 67], np.int32),
        time=np.array([0, 480, 960], np.int64),
        end_time=np.array([480, 960, 1440], np.int64),
        velocity=np.array([0.8, 0.8, 0.8]))
    pcm = render_notes(notes, 480, 500000)
    assert pcm.dtype == np.float32
    assert np.abs(pcm).max() > 0.1
    assert len(pcm) > SAMPLE_RATE  # 1.5s song + tail


def test_spectral_similarity_orders_correctly():
    sr = SAMPLE_RATE
    t = np.arange(sr) / sr
    a = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    a2 = np.sin(2 * np.pi * 440.0 * t + 0.5).astype(np.float32)
    b = np.random.default_rng(0).standard_normal(sr).astype(np.float32)
    assert spectral_similarity(a, a2) > 0.95
    assert spectral_similarity(a, a2) > spectral_similarity(a, b)


def test_midi_similarity_self_vs_other(example_midis):
    sweet = [p for p in example_midis if p.name == "Sweet Dreams.mid"][0]
    angie = [p for p in example_midis if p.name == "Angie.4.mid"][0]
    recon = [p for p in example_midis
             if p.name == "Sweet Dreams (reconstructed).mid"][0]
    d_sweet = load_midi_from_file(sweet)
    d_angie = load_midi_from_file(angie)
    d_recon = load_midi_from_file(recon)
    self_sim = spectral_similarity_midi(d_sweet, d_recon)
    cross_sim = spectral_similarity_midi(d_sweet, d_angie)
    # a reconstruction of the same song is spectrally closer than another song
    assert self_sim > cross_sim, (self_sim, cross_sim)


def test_write_wav(tmp_path):
    pcm = np.sin(np.linspace(0, 100, 22050)).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, pcm)
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    assert sr == SAMPLE_RATE and len(data) == len(pcm)
