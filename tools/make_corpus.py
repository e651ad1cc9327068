#!/usr/bin/env python
"""Synthetic MIDI corpus generator for training at scale.

The reference trains on the Lakh MIDI Dataset (>100k songs,
latex/music-style-transfer.tex:154-155), which is not available in this
environment; this tool generates a corpus of musically-structured songs
(diatonic chord progressions, scale-walking melodies, root-note bass,
rock/pop drum patterns) with wide diversity in key, mode, tempo, meter,
instrumentation, and length, so training campaigns exercise the full
pipeline (multi-channel merge, key detection across all 24 scales, both
beat-fraction grids, percussion presence/absence) rather than overfitting
17 bundled examples.

    python tools/make_corpus.py --out /tmp/corpus --n 200 --seed 7
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mst_tpu.io.midi import NoteStream, create_midi  # noqa: E402
from mst_tpu.io import native  # noqa: E402
from mst_tpu.io.midi import POPULAR_INSTRUMENTS  # noqa: E402
from mst_tpu.theory.scales import MAJOR, MINOR  # noqa: E402

# diatonic triads on scale degrees (0-based) for common progressions
PROGRESSIONS = [
    [0, 3, 4, 0], [0, 5, 3, 4], [0, 4, 5, 3], [5, 3, 0, 4],
    [0, 3, 0, 4], [0, 1, 4, 0], [0, 5, 1, 4],
]

# rhythm templates: onset positions (in beats) within one bar, per grid kind.
# A SHARED library (not per-song randomness) so rhythmic structure repeats
# across the corpus — learnable regularity rather than incompressible noise.
RHYTHM_TEMPLATES_8TH = [
    [0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5],
    [0, 1, 1.5, 2, 3, 3.5],
    [0, 0.5, 1, 2, 2.5, 3],
    [0, 1.5, 2, 3.5],
    [0, 0.5, 1.5, 2.5, 3],
    [0, 1, 2, 3],
]
RHYTHM_TEMPLATES_TRIPLET = [
    [0, 2.0 / 3, 4.0 / 3, 2, 8.0 / 3, 10.0 / 3],
    [0, 4.0 / 3, 2, 10.0 / 3],
    [0, 2.0 / 3, 2, 8.0 / 3],
]
# melodic contours as chord-tone offsets: 0/2/4 are chord tones (root, third,
# fifth above the current chord degree), odd values passing tones. Strong
# positions (template index 0 and midpoints) land on chord tones.
CONTOURS = [
    [0, 2, 4, 2, 0, 2, 4, 7],
    [4, 2, 0, 2, 4, 5, 4, 2],
    [0, 1, 2, 3, 4, 3, 2, 1],
    [7, 4, 2, 0, 2, 4, 2, 0],
    [0, 2, 4, 5, 7, 5, 4, 2],
    [4, 3, 2, 1, 0, 2, 4, 4],
]
# phrase structure for melody motifs: AABA
PHRASE = [0, 0, 1, 0]

# drum notes: kick, snare, closed hat, open hat, crash
KICK, SNARE, HAT, OHAT, CRASH = 36, 38, 42, 46, 49


def _notes_to_stream(notes, ticks_per_beat):
    """notes: list of (onset_beats, dur_beats, midi_note, velocity 0-1)."""
    n = len(notes)
    is_on = np.zeros(2 * n, bool)
    note = np.zeros(2 * n, np.int32)
    vel = np.zeros(2 * n, np.float64)
    time = np.zeros(2 * n, np.int64)
    for i, (onset, dur, key, v) in enumerate(notes):
        t_on = int(round(onset * ticks_per_beat))
        t_off = int(round((onset + dur) * ticks_per_beat))
        is_on[2 * i], note[2 * i] = True, key
        vel[2 * i], time[2 * i] = v, t_on
        is_on[2 * i + 1], note[2 * i + 1] = False, key
        vel[2 * i + 1], time[2 * i + 1] = 0.0, max(t_off, t_on + 1)
    order = np.argsort(time, kind="stable")
    return NoteStream(is_on=is_on[order], note=note[order],
                      velocity=vel[order], time=time[order])


def _scale_notes(tonic, minor):
    mode = MINOR if minor else MAJOR
    return [tonic + i for i in mode.absolute_intervals]


def generate_song(rng: np.random.Generator):
    """One song: (info dict, [instrument dicts]) for create_midi."""
    tonic = int(rng.integers(0, 12))
    minor = bool(rng.integers(0, 2))
    scale = _scale_notes(tonic, minor)
    numer = int(rng.choice([4, 4, 4, 3], p=[0.6, 0.15, 0.15, 0.1]))
    tempo_bpm = int(rng.integers(60, 181))
    tempo = int(round(6e7 / tempo_bpm))
    tpb = 480
    n_bars = int(rng.integers(32, 160))
    progression = PROGRESSIONS[rng.integers(0, len(PROGRESSIONS))]
    base_octave = 5  # MIDI C4=60 region

    def chord_pitches(degree, octave):
        out = []
        for k in (0, 2, 4):
            p = scale[(degree + k) % 7] + 12 * (octave + (degree + k) // 7)
            # harmonic minor: the V chord carries the raised leading tone
            # (E-G#-B in A minor) — this is what breaks the natural-minor /
            # relative-major pitch-class tie for the key detector, exactly
            # like real minor-mode writing does
            if minor and degree % 7 == 4 and k == 2:
                p += 1
            out.append(p)
        return out

    # one-bar lead-in: the TS/tempo meta events live at tick 0, and a
    # non-4/4 time signature coinciding with the first note would be
    # rejected as "changed mid-song" (style/midi_conversion.py:152-154
    # checks first_note <= t <= last_note; our parser matches)
    lead = numer

    n_pitched = int(rng.integers(2, 6))
    programs = rng.choice(POPULAR_INSTRUMENTS, size=n_pitched, replace=False)
    instruments = []
    channel_ids = [c for c in range(16) if c != 9]
    roles = ["melody", "chords", "bass"] + ["arp", "pad", "counter"]
    for ci in range(n_pitched):
        role = roles[ci] if ci < len(roles) else "arp"
        notes = []
        swing = rng.random() < 0.25  # triplet-grid songs exercise divisor 3
        if role == "melody":
            templates = (RHYTHM_TEMPLATES_TRIPLET if swing
                         else RHYTHM_TEMPLATES_8TH)
            motifs = []
            for _ in range(2):  # the song's A and B motifs
                steps = templates[rng.integers(0, len(templates))]
                contour = CONTOURS[rng.integers(0, len(CONTOURS))]
                motifs.append({"steps": steps,
                               "contour": contour[:len(steps)],
                               "dur": 2.0 / 3 if swing else 0.5})
        for bar in range(n_bars):
            t_bar = lead + bar * numer
            degree = progression[bar % len(progression)]
            if role == "melody":
                # motif-structured melody (learnable, NOT a random walk):
                # the song's 2 motifs repeat in an AABA phrase pattern,
                # anchored to the current chord degree, with chord-tone
                # contours and rare (10%) single-degree variations
                motif = motifs[PHRASE[bar % len(PHRASE)]]
                dur = motif["dur"]
                for s, off in zip(motif["steps"], motif["contour"]):
                    if s >= numer:
                        continue
                    if rng.random() < 0.1:  # occasional variation
                        off += int(rng.integers(-1, 2))
                    deg = degree + off
                    pitch = (scale[deg % 7]
                             + 12 * (base_octave + deg // 7))
                    # melodic leading tone over the V chord in minor
                    if minor and degree % 7 == 4 and deg % 7 == 6:
                        pitch += 1
                    accent = 0.15 if s == int(s) else 0.0
                    notes.append((t_bar + s, dur, pitch,
                                  0.5 + accent + 0.15 * rng.random()))
            elif role == "chords":
                for k, pitch in enumerate(chord_pitches(degree,
                                                        base_octave - 1)):
                    notes.append((t_bar, float(numer) * 0.9, pitch,
                                  0.35 + 0.2 * rng.random()))
            elif role == "bass":
                root = scale[degree % 7] + 12 * (base_octave - 2)
                for b in range(numer):
                    if rng.random() < 0.15:
                        continue
                    notes.append((t_bar + b, 0.9, root,
                                  0.5 + 0.3 * rng.random()))
            else:  # arp / pad / counter
                pitches = chord_pitches(degree, base_octave)
                for k in range(numer * 2):
                    if rng.random() < 0.4:
                        continue
                    notes.append((t_bar + k * 0.5, 0.4,
                                  pitches[k % 3],
                                  0.3 + 0.3 * rng.random()))
        if len(notes) < 60:  # pipeline drops channels with <100 messages
            continue
        instruments.append({
            "channel_id": channel_ids[len(instruments)],
            "instrument_id": int(programs[ci]),
            "messages": _notes_to_stream(notes, tpb),
        })

    if rng.random() < 0.8:  # most songs have drums
        notes = []
        for bar in range(n_bars):
            t0 = lead + bar * numer
            if bar % 8 == 0:
                notes.append((t0, 0.5, CRASH, 0.7))
            for b in range(numer):
                if b % 2 == 0:
                    notes.append((t0 + b, 0.25, KICK,
                                  0.7 + 0.2 * rng.random()))
                else:
                    notes.append((t0 + b, 0.25, SNARE,
                                  0.6 + 0.2 * rng.random()))
                for h in (0.0, 0.5):
                    hat = OHAT if (b == numer - 1 and h == 0.5) else HAT
                    notes.append((t0 + b + h, 0.2, hat,
                                  0.35 + 0.2 * rng.random()))
        instruments.append({"channel_id": 9, "instrument_id": -1,
                            "messages": _notes_to_stream(notes, tpb)})

    info = {
        "ticks_per_beat": tpb,
        "ticks_per_bar": tpb * numer,
        "time_signature": {"numerator": numer, "denominator": 4},
        "tempo": tempo,
        "duration": (n_bars + 1) * numer * tpb,
    }
    return info, instruments


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n", type=int, default=200)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    written = 0
    while written < args.n:
        info, instruments = generate_song(rng)
        if not instruments:  # every channel fell under the note floor
            continue
        mid = create_midi(info, *instruments)
        native.write_midi_file(
            os.path.join(args.out, f"gen_{written:04d}.mid"), mid)
        written += 1
    print(f"wrote {written} songs to {args.out}")


if __name__ == "__main__":
    main()
