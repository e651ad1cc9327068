"""Host data pipeline: corpus iteration, song assembly, tensorization.

Parity target: style/data.py:34-169 (iter_all_midis / iter_inputs / get_input /
prepare_input / get_used_instruments). Differences by design:

- songs are assembled into SoA :class:`Song` records with float32 raster
  tensors, ready for host->HBM transfer;
- batching with padding + masks is first-class (the reference is batch=1 with
  dynamic shapes — see ``pad_batch``), enabling data-parallel training;
- scale detection is the vectorized (24,12) scorer from mst_tpu.theory.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from mst_tpu.exceptions import MidiFormatError
from mst_tpu.data.taxonomy import INCLUDED_INSTRUMENTS, encode_instruments
from mst_tpu.io.midi import is_pitched, load_midi_from_file
from mst_tpu.ops.events import (
    NoteArray, SongInfo, merge_note_arrays, pair_notes, read_midi)
from mst_tpu.ops.rasterize import Rasterizer
from mst_tpu.theory import detect_scale, keys_dist_from_notes


@dataclasses.dataclass
class Song:
    """One assembled song (parity: get_input's return tuple, style/data.py:100).

    Also retains the SoA note arrays so the device-side rasterizer can ship
    notes (KBs) instead of the dense raster (tens of MB) — see
    mst_tpu.ops.device_raster.
    """

    info: SongInfo
    pitched: np.ndarray                    # (C, bar, beat, frac, 56, 5) float32
    instruments_features: np.ndarray       # (C, 51) float32
    instruments: List[int]                 # pitched instrument program ids
    unpitched: Optional[np.ndarray]        # (Cu, bar, beat, frac, 47, 2) or None
    pitched_notes: Optional[List[NoteArray]] = None
    unpitched_notes: Optional[List[NoteArray]] = None
    path: Optional[str] = None
    cursor: Optional[int] = None  # resume position in the corpus stream

    @property
    def n_channels(self) -> int:
        return self.pitched.shape[0]

    @property
    def n_bars(self) -> int:
        return self.pitched.shape[1]


def iter_all_midis(files: Sequence, shuffle: bool = False, looped: bool = False,
                   rng: Optional[np.random.Generator] = None,
                   start_at: int = 0):
    """Defensive corpus iteration (parity: style/data.py:34-48).

    Yields ``(attempt_index, file, channels, info)``. The stream is
    deterministic for a given seed (one shuffle up front, the same order every
    epoch), so ``start_at`` resumes it exactly: the first ``start_at`` file
    attempts are skipped without even opening them."""
    rng = rng or np.random.default_rng()
    files = list(files)
    if shuffle:
        rng.shuffle(files)
    attempt = 0
    while True:
        for file in files:
            index = attempt
            attempt += 1
            if index < start_at:
                continue
            mid = load_midi_from_file(file)
            if mid is None:
                continue
            try:
                channels, info = read_midi(mid)
            except MidiFormatError:
                continue
            yield index, file, channels, info
        if not looped:
            return


def iter_inputs(files: Sequence, instruments: Sequence[int] = INCLUDED_INSTRUMENTS,
                min_n_messages: int = 100, **kwargs) -> Iterable[Tuple[str, Song]]:
    """Filter channels to the modeled instruments and assemble songs
    (parity: style/data.py:51-63)."""
    allowed = set([-1, *instruments])
    for index, filename, channels, info in iter_all_midis(files, **kwargs):
        channels = [
            c for c in channels
            if c["instrument_id"] in allowed and len(c["messages"]) >= min_n_messages
        ]
        if not any(is_pitched(c["instrument_id"]) for c in channels):
            continue
        try:
            song = get_input(channels, info)
        except MidiFormatError:
            continue
        song.path = filename
        song.cursor = index + 1  # resuming from here replays the next attempt
        yield filename, song


def get_input(channels: List[dict], info: SongInfo) -> Song:
    """Full song assembly (parity: style/data.py:66-100): pair notes, merge
    same-instrument channels, aggregate the key distribution over pitched
    channels, detect the scale, rasterize everything, encode instruments."""
    note_arrays = [(c["instrument_id"], c["channel_id"],
                    pair_notes(c["messages"])) for c in channels]

    # merge channels sharing an instrument id, preserving first-occurrence order
    # (parity: group_by + merge_nchannels, style/data.py:69-70,103-114)
    order: List[int] = []
    grouped = {}
    for instrument_id, channel_id, notes in note_arrays:
        if instrument_id not in grouped:
            grouped[instrument_id] = []
            order.append(instrument_id)
        grouped[instrument_id].append(notes)
    merged = [(ins, merge_note_arrays(grouped[ins])) for ins in order]

    pitched_channels = [(i, n) for i, n in merged if is_pitched(i)]
    unpitched_channels = [(i, n) for i, n in merged if not is_pitched(i)]

    # key-mass distribution over all pitched channels (style/data.py:79-84);
    # the tick2second factor is constant per song and cancels on normalization
    if pitched_channels:
        keys = np.concatenate([n.note_id % 12 for _, n in pitched_channels])
        weights = np.concatenate([
            n.duration.astype(np.float64) * n.velocity
            for _, n in pitched_channels])
    else:
        keys, weights = np.zeros(0, dtype=np.int64), np.zeros(0)
    keys_dist = keys_dist_from_notes(keys, weights)
    info.scale = detect_scale(keys_dist)

    rasterizer = Rasterizer(info)
    pitched = np.zeros((len(pitched_channels),)
                       + rasterizer.raster_shape(True), np.float32)
    for c, (_, n) in enumerate(pitched_channels):
        rasterizer.rasterize(n, pitched=True, out=pitched[c])
    unpitched = None
    if unpitched_channels:
        unpitched = np.zeros((len(unpitched_channels),)
                             + rasterizer.raster_shape(False), np.float32)
        for c, (_, n) in enumerate(unpitched_channels):
            rasterizer.rasterize(n, pitched=False, out=unpitched[c])

    instruments = [i for i, _ in pitched_channels]
    instruments_features = encode_instruments(instruments).astype(np.float32)
    return Song(info=info, pitched=pitched,
                instruments_features=instruments_features,
                instruments=instruments, unpitched=unpitched,
                pitched_notes=[n for _, n in pitched_channels],
                unpitched_notes=[n for _, n in unpitched_channels])


def prepare_input(song: Song, max_n_bars: Optional[int] = None):
    """Truncate to max_n_bars and tensorize with a singleton batch dim
    (parity: style/data.py:130-156). Returns
    (mode (1,2), bpm (1,), pitched (1,C,...), instruments (1,C,51), unpitched)."""
    if max_n_bars is None:
        max_n_bars = song.pitched.shape[1]
    pitched = song.pitched[:, :max_n_bars][None]
    instruments = song.instruments_features[None]
    unpitched = None
    if song.unpitched is not None:
        unpitched = song.unpitched[:, :max_n_bars][None]
    is_minor = song.info.scale.is_minor
    mode = np.array([[0.0, 1.0]] if is_minor else [[1.0, 0.0]], dtype=np.float32)
    bpm = np.array([song.info.bpm], dtype=np.float32)
    return mode, bpm, pitched, instruments, unpitched


def get_used_instruments(instruments_features: np.ndarray,
                         has_unpitched: bool) -> np.ndarray:
    """Multi-hot of used pitched instruments + percussion flag
    (parity: style/data.py:159-169). Input (B, C, 51) -> (B, 41)."""
    used = instruments_features[:, :, :len(INCLUDED_INSTRUMENTS)]
    used = (used.sum(axis=1) > 0).astype(np.float32)
    percussion = np.full((used.shape[0], 1), float(has_unpitched),
                         dtype=np.float32)
    return np.concatenate([used, percussion], axis=1)
