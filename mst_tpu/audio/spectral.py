"""STFT / mel-spectrogram / spectral-similarity — jit-compiled device kernels.

The audio-side eval required by BASELINE.json configs[3-4]: framing + Hann
window + rfft + mel projection run as one jit graph (XLA fuses the window
multiply into the FFT input and the |S|^2 -> mel matmul onto the MXU). The
similarity score compares log-mel statistics of two renditions — used to score
styled output against its style source without human listening.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.audio.synth import SAMPLE_RATE, render_midi

N_FFT = 1024
HOP = 256
N_MELS = 80


def hann(n: int):
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / n)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft(pcm, n_fft: int = N_FFT, hop: int = HOP):
    """(T,) -> (frames, n_fft//2+1) magnitude spectrogram."""
    pcm = jnp.asarray(pcm)
    n_frames = max(1, (pcm.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = pcm[idx] * hann(n_fft)[None, :]
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE, fmin: float = 0.0,
                   fmax: float = None) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular filter matrix (Slaney-style layout)."""
    fmax = fmax or sample_rate / 2
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fb = np.zeros((len(bins), n_mels))
    for m in range(n_mels):
        left, center, right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bins - left) / max(center - left, 1e-9)
        down = (right - bins) / max(right - center, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels",
                                             "sample_rate"))
def mel_spectrogram(pcm, n_fft: int = N_FFT, hop: int = HOP,
                    n_mels: int = N_MELS, sample_rate: int = SAMPLE_RATE):
    """(T,) -> (frames, n_mels) power mel spectrogram (one fused jit graph)."""
    mag = stft(pcm, n_fft=n_fft, hop=hop)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    return (mag * mag) @ fb


def log_mel(pcm, **kw):
    return jnp.log(mel_spectrogram(pcm, **kw) + 1e-8)


@jax.jit
def _similarity_stats(mel_a, mel_b):
    """Cosine similarity of time-pooled log-mel statistics (mean ++ std)."""
    def pooled(m):
        return jnp.concatenate([m.mean(axis=0), m.std(axis=0)])
    a, b = pooled(mel_a), pooled(mel_b)
    a = a - a.mean()
    b = b - b.mean()
    denom = jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-8
    return jnp.dot(a, b) / denom


def spectral_similarity(pcm_a, pcm_b, **kw) -> float:
    """[-1, 1] cosine similarity of log-mel statistics of two waveforms."""
    return float(_similarity_stats(log_mel(pcm_a, **kw), log_mel(pcm_b, **kw)))


def spectral_similarity_midi(midi_a, midi_b) -> float:
    """Render two parsed MIDI files and score their spectral similarity
    (the end-to-end pod-run eval of BASELINE.json configs[4])."""
    return spectral_similarity(render_midi(midi_a), render_midi(midi_b))
