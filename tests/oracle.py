"""Slow, per-note Python oracle used ONLY by tests.

Implements the reference's algorithms exactly as specified (scale-degree maps:
style/midi_conversion.py:244-283; quantization: :425-456 + style/utils/math.py:14;
scoring: style/scales.py:160-221) in straightforward per-item Python, so the
framework's vectorized/compiled implementations can be checked against it on real
corpus data. Written from the behavioral spec in SURVEY.md — independent code,
kept deliberately naive.
"""

from __future__ import annotations

import math

import numpy as np

KEY_NAMES = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]


def mode_intervals(is_minor: bool):
    return [0, 2, 3, 5, 7, 8, 10] if is_minor else [0, 2, 4, 5, 7, 9, 11]


def degree_of(interval: int, is_minor: bool) -> float:
    """Scale degree with +0.5 for out-of-scale intervals."""
    table = {}
    for d, off in enumerate(mode_intervals(is_minor)):
        table[off] = d + 1
    prev = 1
    for i in range(12):
        if i in table:
            prev = table[i]
        else:
            table[i] = prev + 0.5
    return table[interval % 12]


DEGREE2ACC = {1.5: "flat", 2.5: "flat", 4.5: "sharp", 5.5: "sharp", 6.5: "flat"}


def note_to_scale_loc(note_id: int, tonic: int, is_minor: bool):
    octave = note_id // 12 - 1
    key = note_id % 12
    interval = key - tonic
    d = degree_of(interval, is_minor)
    if d == int(d):
        acc = "none"
        degree = int(d)
    else:
        # relative degree in the major mode: minor shift -2 -> relative
        # interval major.tonic_intervals[(-2) % 7] = 9; major: 0
        rel_interval = 9 if is_minor else 0
        rel = degree_of(interval + rel_interval, False)
        acc = DEGREE2ACC[rel]
        degree = math.floor(d) if acc == "sharp" else math.ceil(d)
    if interval < 0:
        octave -= 1
    return octave, degree, acc


def scale_loc_to_note(scale_octave: int, degree: int, acc: str, tonic: int,
                      is_minor: bool) -> int:
    interval = mode_intervals(is_minor)[degree - 1] + tonic
    interval += {"sharp": 1, "flat": -1, "none": 0, None: 0}[acc]
    octave = scale_octave
    if interval < 0:
        octave -= 1
        interval += 12
    elif interval >= 12:
        octave += 1
        interval -= 12
    return 12 * (octave + 1) + interval


def round_number(number, precision=1):
    """Parity: style/utils/math.py:14-19 — round to multiple, half rounds up."""
    remainder_pos = number % precision
    remainder_neg = abs(remainder_pos - precision)
    if remainder_pos < remainder_neg:
        return number - remainder_pos, remainder_pos
    return number + remainder_neg, -remainder_neg


def quantize_time(time: int, ticks_per_beat: int, divisors=(8, 3)):
    """Pick the grid (divisor) minimizing |error|; first divisor wins ties.
    Returns (qtime, divisor)."""
    best = None
    for divisor in divisors:
        ticks = ticks_per_beat / divisor
        qtime, err = round_number(time, ticks)
        if best is None or abs(err) < best[0]:
            best = (abs(err), qtime, divisor)
    return int(best[1]), best[2]


def normalize_dist(dist):
    dist = np.array(dist, dtype=float)
    s = dist.sum()
    if s > 0:
        return dist / s
    return np.full_like(dist, 1.0 / len(dist))


MAJOR_PROFILE = normalize_dist(
    [6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88])
MINOR_PROFILE = normalize_dist(
    [6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17])
TYPICAL_MAJOR = [0, 2, 4, 5, 6, 7, 9, 10, 11]
TYPICAL_MINOR = [0, 1, 2, 3, 5, 7, 8, 9, 10, 11]


def cross_entropy(dist, target, eps=1e-12):
    dist = np.clip(dist, eps, 1.0)
    return -np.sum(target * np.log(dist)) / dist.shape[0]


def detect_scale(keys_dist):
    """Returns (tonic_index, is_minor, loss) by scoring all 24 candidates."""
    keys_dist = normalize_dist(keys_dist)
    results = []
    for is_minor in (False, True):
        profile = MINOR_PROFILE if is_minor else MAJOR_PROFILE
        main = mode_intervals(is_minor)
        typical = TYPICAL_MINOR if is_minor else TYPICAL_MAJOR
        d = keys_dist.copy()
        for tonic in range(12):
            coverage = d[main].sum()
            loose = d[typical].sum()
            ce = cross_entropy(d, profile)
            loss = ce * (1.5 - coverage) * (2 - loose)
            results.append((loss, tonic, is_minor))
            d = np.concatenate([d[1:], d[:1]])
    best = min(results, key=lambda x: x[0])
    return best[1], best[2], best[0]


# --- per-note oracle rasterization pipeline (naive; mirrors the reference's
# ChannelConverter loops for cross-checking the vectorized implementation) ---

def pair_notes_naive(is_on, note, velocity, time):
    """Dict-based note_on/note_off pairing exactly like the reference
    (one open note per id; any same-id event closes it)."""
    open_notes = {}
    notes = []  # list of dicts with note_id, time, end_time, velocity
    for i in range(len(is_on)):
        nid = int(note[i])
        if nid in open_notes:
            open_notes[nid]["end_time"] = int(time[i])
            del open_notes[nid]
        if is_on[i]:
            rec = {"note_id": nid, "time": int(time[i]),
                   "end_time": int(time[i]), "velocity": float(velocity[i])}
            notes.append(rec)
            open_notes[nid] = rec
    return notes


FRACTIONS = None  # filled lazily


def _fractions(divisors=(8, 3)):
    from fractions import Fraction
    return sorted({Fraction(i, d) for d in divisors for i in range(d)})


def rasterize_naive(notes, tonic, is_minor, pitched, ticks_per_beat,
                    ticks_per_bar, n_bars, n_beats, divisors=(8, 3),
                    n_octaves=8, min_perc=35, max_perc=81):
    """Per-note scale-map + quantize + scatter-max, mirroring
    qchannel2vchannel semantics."""
    from fractions import Fraction
    fracs = _fractions(divisors)
    frac2idx = {f: i for i, f in enumerate(fracs)}
    n_notes = n_octaves * 7 if pitched else max_perc - min_perc + 1
    n_feat = 5 if pitched else 2
    out = np.zeros((n_bars + 1, n_beats, len(fracs), n_notes, n_feat))
    for rec in notes:
        t = rec["time"]
        qtime, divisor = quantize_time(t, ticks_per_beat, divisors)
        qduration = rec["end_time"] - qtime
        bar, rem = divmod(qtime, ticks_per_bar)
        beat, ticks = divmod(rem, ticks_per_beat)
        quants = int(ticks // (ticks_per_beat / divisor))
        frac_idx = frac2idx[Fraction(quants, divisor)]
        if pitched:
            octave, degree, acc = note_to_scale_loc(rec["note_id"], tonic,
                                                    is_minor)
            note_idx = octave * 7 + (degree - 1)
            if note_idx < 0 or note_idx >= n_notes:
                continue
        else:
            note_idx = rec["note_id"] - min_perc
            if note_idx < 0 or note_idx >= n_notes:
                continue
            acc = None
        if bar < 0 or bar >= out.shape[0]:
            continue
        features = np.zeros(n_feat)
        features[0] = qduration / ticks_per_beat
        features[1] = rec["velocity"]
        if pitched:
            features[2 + {"flat": 0, "none": 1, "sharp": 2}[acc]] = 1.0
        cell = out[bar, beat, frac_idx, note_idx]
        out[bar, beat, frac_idx, note_idx] = np.maximum(cell, features)
    return out
