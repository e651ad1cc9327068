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

    Retains the SoA note arrays so the device-side rasterizer can ship notes
    (KBs) instead of the dense raster (tens of MB) — see
    mst_tpu.ops.device_raster. The dense host rasters themselves are LAZY:
    ``get_input`` never builds them (it computes only the cheap
    shape/emptiness metadata below — the round-4 cold-ingestion win); the
    ``.pitched``/``.unpitched`` properties rasterize on first access for the
    consumers that do need dense arrays (host-raster training, tests, the
    oracle). A :meth:`slim` copy drops any materialized rasters again —
    that is what makes the cross-epoch
    :class:`~mst_tpu.data.cache.SongCache` affordable (~KBs of notes per song
    instead of ~10 MB of raster). The device-raster training path only ever
    reads the metadata fields below, so cached replay never rasterizes on the
    host at all.
    """

    info: SongInfo
    instruments_features: np.ndarray       # (C, 51) float32
    instruments: List[int]                 # pitched instrument program ids
    pitched_notes: List[NoteArray]
    unpitched_notes: List[NoteArray]
    # dense-raster metadata, computed once at cold ingestion so consumers can
    # bucket/skip/collate without touching the dense arrays:
    pitched_shape: Tuple[int, ...]         # (C, bar, beat, frac, 56, 5)
    unpitched_shape: Optional[Tuple[int, ...]]  # (Cu, bar, beat, frac, 47, 2)
    pitched_empty: bool                    # pitched raster sums to zero
    has_unpitched: bool                    # unpitched raster exists, sum > 0
    dense_pitched: Optional[np.ndarray] = None
    dense_unpitched: Optional[np.ndarray] = None
    path: Optional[str] = None
    cursor: Optional[int] = None  # resume position in the corpus stream

    @property
    def n_channels(self) -> int:
        return self.pitched_shape[0]

    @property
    def n_bars(self) -> int:
        return self.pitched_shape[1]

    @property
    def beats_per_bar(self) -> int:
        return self.pitched_shape[2]

    @property
    def pitched(self) -> np.ndarray:
        """Dense pitched raster (C, bar, beat, frac, 56, 5); rasterized on
        first access after :meth:`slim` (bit-identical to the cold build —
        Rasterizer is deterministic in ``info``)."""
        if self.dense_pitched is None:
            self.dense_pitched = _rasterize_channels(
                Rasterizer(self.info), self.pitched_notes, True,
                self.pitched_shape)
        return self.dense_pitched

    @property
    def unpitched(self) -> Optional[np.ndarray]:
        if self.unpitched_shape is None:
            return None
        if self.dense_unpitched is None:
            self.dense_unpitched = _rasterize_channels(
                Rasterizer(self.info), self.unpitched_notes, False,
                self.unpitched_shape)
        return self.dense_unpitched

    def slim(self) -> "Song":
        """A copy without the dense rasters (they rebuild lazily on access),
        safe to keep as a cross-epoch cache master:

        - ``info`` is a fresh copy — in-repo consumers assign ``info.tempo``
          / ``info.scale`` in place (mst_tpu/transfer.py), which must never
          reach a cached entry;
        - the shared numpy buffers (notes, instrument features) are marked
          read-only, so an accidental mutation raises instead of silently
          corrupting every later epoch's replay.
        """
        for arr in self._shared_arrays():
            arr.flags.writeable = False
        return dataclasses.replace(self, dense_pitched=None,
                                   dense_unpitched=None,
                                   info=dataclasses.replace(self.info))

    def _shared_arrays(self):
        yield self.instruments_features
        for notes in (*self.pitched_notes, *self.unpitched_notes):
            yield notes.note_id
            yield notes.time
            yield notes.end_time
            yield notes.velocity

    @property
    def nbytes(self) -> int:
        """Resident bytes of a slim copy (SoA notes + features) — the unit of
        SongCache's budget accounting. Dense rasters are excluded by design."""
        total = self.instruments_features.nbytes
        for notes in (*self.pitched_notes, *self.unpitched_notes):
            total += (notes.note_id.nbytes + notes.time.nbytes
                      + notes.end_time.nbytes + notes.velocity.nbytes)
        return total


def _rasterize_channels(rasterizer: Rasterizer, channels: List[NoteArray],
                        pitched: bool, shape: Tuple[int, ...]) -> np.ndarray:
    out = np.zeros(shape, np.float32)
    for c, notes in enumerate(channels):
        rasterizer.rasterize(notes, pitched=pitched, out=out[c])
    return out


def _raster_has_mass(rasterizer: Rasterizer, channels: List[NoteArray],
                     pitched: bool) -> bool:
    """Whether the dense raster of these channels would contain a nonzero
    cell — computed at quantize level WITHOUT materializing it. Exactly
    equivalent to ``_rasterize_channels(...).sum() > 0``: the scatter is a
    max into a zero base, so cells are nonnegative, and a valid pitched note
    always writes its accidental one-hot 1.0 while a valid unpitched note
    contributes iff its duration or velocity is positive
    (ops/rasterize.py:129-142; tested in tests/test_cache.py::
    test_lazy_emptiness_flags_match_dense_rasters)."""
    n_notes = rasterizer.n_notes(pitched)
    n_bars_cap = rasterizer.raster_shape(pitched)[0]
    for notes in channels:
        q = rasterizer.quantize(notes, pitched)
        valid = ((q.note_idx >= 0) & (q.note_idx < n_notes)
                 & (q.bar >= 0) & (q.bar < n_bars_cap))
        if not pitched:
            valid &= (q.duration > 0) | (q.velocity > 0)
        if valid.any():
            return True
    return False


def _iter_file_attempts(files: Sequence, shuffle: bool = False,
                        looped: bool = False,
                        rng: Optional[np.random.Generator] = None,
                        start_at: int = 0):
    """The corpus attempt stream: ``(attempt_index, file)``, deterministic for
    a given seed (one shuffle up front, the same order every epoch), so
    ``start_at`` resumes it exactly — the first ``start_at`` attempts are
    skipped without even opening the files (and a SongCache hit is decided on
    the path alone, before any I/O)."""
    rng = rng or np.random.default_rng()
    files = list(files)
    if not files and looped:
        # an empty looped corpus would otherwise spin forever; a user who
        # pointed --data-dir at the wrong place gets an error, not a hang
        raise ValueError("empty corpus: no files to iterate")
    if shuffle:
        rng.shuffle(files)
    attempt = 0
    while True:
        for file in files:
            index = attempt
            attempt += 1
            if index >= start_at:
                yield index, file
        if not looped:
            return


def _load_and_read(file):
    """Defensive load + event parse (parity: style/data.py:34-48); returns
    ``(channels, info)`` or None for unloadable/malformed files."""
    mid = load_midi_from_file(file)
    if mid is None:
        return None
    try:
        return read_midi(mid)
    except MidiFormatError:
        return None


def iter_all_midis(files: Sequence, shuffle: bool = False, looped: bool = False,
                   rng: Optional[np.random.Generator] = None,
                   start_at: int = 0):
    """Defensive corpus iteration (parity: style/data.py:34-48).

    Yields ``(attempt_index, file, channels, info)``."""
    for index, file in _iter_file_attempts(files, shuffle, looped, rng,
                                           start_at):
        loaded = _load_and_read(file)
        if loaded is None:
            continue
        channels, info = loaded
        yield index, file, channels, info


def iter_inputs(files: Sequence, instruments: Sequence[int] = INCLUDED_INSTRUMENTS,
                min_n_messages: int = 100, cache=None,
                **kwargs) -> Iterable[Tuple[str, Song]]:
    """Filter channels to the modeled instruments and assemble songs
    (parity: style/data.py:51-63).

    ``cache``: optional :class:`mst_tpu.data.cache.SongCache`. The reference
    re-parses and re-rasterizes every file on every epoch
    (style/data.py:34-48 — iter_all_midis re-opens each path each loop); with
    a cache, a path seen before replays its slim Song (or its known-bad
    verdict) straight from host RAM, so steady-state epochs cost ~0 host CPU.
    The yielded stream is identical either way — same order, same cursor
    values, value-equal songs (tests/test_cache.py). Single-consumer use only
    (the prefetch thread); the cache is not thread-safe."""
    allowed = set([-1, *instruments])
    for index, file in _iter_file_attempts(files, **kwargs):
        if cache is not None:
            hit = cache.get(file)
            if hit is cache.BAD:
                continue
            if hit is not None:
                # fresh info per replay: consumers may assign tempo/scale in
                # place (transfer does) without touching the cache master
                yield file, dataclasses.replace(
                    hit, cursor=index + 1,
                    info=dataclasses.replace(hit.info))
                continue
        loaded = _load_and_read(file)
        if loaded is None:
            if cache is not None:
                cache.put_bad(file)
            continue
        channels, info = loaded
        channels = [
            c for c in channels
            if c["instrument_id"] in allowed and len(c["messages"]) >= min_n_messages
        ]
        if not any(is_pitched(c["instrument_id"]) for c in channels):
            if cache is not None:
                cache.put_bad(file)
            continue
        try:
            song = get_input(channels, info)
        except MidiFormatError:
            if cache is not None:
                cache.put_bad(file)
            continue
        song.path = file
        song.cursor = index + 1  # resuming from here replays the next attempt
        if cache is not None:
            cache.put(file, song.slim())
        yield file, song


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
    pitched_shape = ((len(pitched_channels),)
                     + rasterizer.raster_shape(True))
    unpitched_shape = None
    if unpitched_channels:
        unpitched_shape = ((len(unpitched_channels),)
                           + rasterizer.raster_shape(False))

    instruments = [i for i, _ in pitched_channels]
    instruments_features = encode_instruments(instruments).astype(np.float32)
    # the dense host rasters stay LAZY (Song.pitched/.unpitched rebuild them
    # on first access): the hot consumers — training's device_batch_from_songs
    # and transfer's extraction — rasterize ON DEVICE from the SoA notes, so
    # cold ingestion only pays quantize-level emptiness checks here (~45% of
    # ingestion wall time was dense rasters nobody read)
    return Song(info=info,
                instruments_features=instruments_features,
                instruments=instruments,
                pitched_notes=[n for _, n in pitched_channels],
                unpitched_notes=[n for _, n in unpitched_channels],
                pitched_shape=pitched_shape,
                unpitched_shape=unpitched_shape,
                pitched_empty=not _raster_has_mass(
                    rasterizer, [n for _, n in pitched_channels], True),
                has_unpitched=bool(unpitched_channels) and _raster_has_mass(
                    rasterizer, [n for _, n in unpitched_channels], False))


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
