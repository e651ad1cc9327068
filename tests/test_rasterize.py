"""Rasterizer parity vs. the per-note oracle, on random notes and real examples."""

import numpy as np
import pytest

from mst_tpu.io.midi import is_pitched, load_midi_from_file
from mst_tpu.ops.events import NoteArray, SongInfo, pair_notes, read_midi
from mst_tpu.ops.quantize import FractionGrid, quantize_onsets, round_to_multiple
from mst_tpu.ops.rasterize import Rasterizer
from mst_tpu.data.pipeline import get_input
from mst_tpu.theory.scales import Scale

import oracle


def _info(tpb=480, numerator=4, n_bars=8, tonic=0, minor=False):
    return SongInfo(
        ticks_per_beat=tpb, numerator=numerator, denominator=4,
        key_signature=None, duration=n_bars * tpb * numerator,
        ticks_per_bar=tpb * numerator, n_bars=float(n_bars),
        n_beats=numerator, tempo2time={500000: 1}, tempo=500000, bpm=120,
        scale=Scale(tonic=tonic, is_minor=minor),
    )


def test_round_to_multiple_matches_oracle():
    rng = np.random.default_rng(0)
    for precision in (60.0, 160.0, 480 / 8, 480 / 3, 220 / 3, 96 / 8):
        times = rng.integers(0, 100000, 500)
        rounded, err = round_to_multiple(times, precision)
        for i, t in enumerate(times):
            r, e = oracle.round_number(float(t), precision)
            assert rounded[i] == r, (t, precision)
            assert err[i] == e


def test_quantize_matches_oracle():
    rng = np.random.default_rng(1)
    for tpb in (480, 96, 220, 384):
        grid = FractionGrid.create((8, 3))
        times = rng.integers(0, 50 * tpb, 400)
        q, bar, beat, frac = quantize_onsets(times, tpb, tpb * 4, grid)
        fracs = oracle._fractions((8, 3))
        for i, t in enumerate(times):
            qt, div = oracle.quantize_time(int(t), tpb)
            assert q[i] == qt, (t, tpb)
            b_, rem = divmod(qt, tpb * 4)
            bt, ticks = divmod(rem, tpb)
            from fractions import Fraction
            quants = int(ticks // (tpb / div))
            assert bar[i] == b_ and beat[i] == bt
            assert frac[i] == fracs.index(Fraction(quants, div)), (t, tpb, div)


def _random_notes(rng, n=300, max_time=8 * 4 * 480, lo=20, hi=110):
    time = np.sort(rng.integers(0, max_time, n)).astype(np.int64)
    dur = rng.integers(1, 2000, n)
    return NoteArray(
        note_id=rng.integers(lo, hi, n).astype(np.int32),
        time=time, end_time=time + dur,
        velocity=rng.random(n) * 0.95 + 0.05,
    )


@pytest.mark.parametrize("tpb", [480, 220])
@pytest.mark.parametrize("minor", [False, True])
def test_rasterize_matches_oracle_pitched(tpb, minor):
    rng = np.random.default_rng(tpb + minor)
    info = _info(tpb=tpb, tonic=5, minor=minor)
    r = Rasterizer(info)
    notes = _random_notes(rng)
    got = r.rasterize(notes, pitched=True)
    recs = [{"note_id": int(notes.note_id[i]), "time": int(notes.time[i]),
             "end_time": int(notes.end_time[i]),
             "velocity": float(notes.velocity[i])}
            for i in range(len(notes))]
    want = oracle.rasterize_naive(
        recs, tonic=5, is_minor=minor, pitched=True, ticks_per_beat=tpb,
        ticks_per_bar=info.ticks_per_bar, n_bars=8, n_beats=4)
    np.testing.assert_array_equal(got, want)


def test_rasterize_matches_oracle_unpitched():
    rng = np.random.default_rng(7)
    info = _info()
    r = Rasterizer(info)
    notes = _random_notes(rng, lo=30, hi=90)  # includes out-of-range percussion
    got = r.rasterize(notes, pitched=False)
    recs = [{"note_id": int(notes.note_id[i]), "time": int(notes.time[i]),
             "end_time": int(notes.end_time[i]),
             "velocity": float(notes.velocity[i])}
            for i in range(len(notes))]
    want = oracle.rasterize_naive(
        recs, tonic=0, is_minor=False, pitched=False, ticks_per_beat=480,
        ticks_per_bar=480 * 4, n_bars=8, n_beats=4)
    np.testing.assert_array_equal(got, want)


def test_raster_roundtrip_onsets_velocities():
    """raster -> messages -> pair -> raster preserves onset cells and
    velocities exactly. Durations can only shrink: by <=1 tick via the
    reference's int(duration*tpb) truncation (reproduced), or more when decoded
    same-pitch notes overlap and re-pairing truncates the earlier one (the
    reference decode->ingest cycle does the same)."""
    rng = np.random.default_rng(9)
    info = _info()
    r = Rasterizer(info)
    notes = _random_notes(rng, n=200)
    raster = r.rasterize(notes, pitched=True)
    msgs = r.messages_from_raster(raster, pitched=True)
    notes2 = pair_notes(msgs)
    raster2 = r.rasterize(notes2, pitched=True)
    np.testing.assert_array_equal(raster[..., 1], raster2[..., 1])  # velocity
    np.testing.assert_array_equal(raster[..., 2:], raster2[..., 2:])  # acc
    assert np.all(raster2[..., 0] <= raster[..., 0] + 1e-12)
    assert np.all(raster2[..., 0] >= 0)


def test_raster_roundtrip_exact_when_no_overlap():
    """Non-overlapping notes on distinct pitches round-trip with durations
    off by at most one int(d*tpb) truncation tick."""
    info = _info()
    r = Rasterizer(info)
    n = 40
    time = (np.arange(n) * 480).astype(np.int64)  # one note per beat
    notes = NoteArray(
        note_id=(48 + np.arange(n) % 24).astype(np.int32),
        time=time, end_time=time + 240,  # half-beat notes, no overlap
        velocity=np.full(n, 0.5),
    )
    raster = r.rasterize(notes, pitched=True)
    notes2 = pair_notes(r.messages_from_raster(raster, pitched=True))
    raster2 = r.rasterize(notes2, pitched=True)
    np.testing.assert_array_equal(raster[..., 1:], raster2[..., 1:])
    assert np.all(np.abs(raster[..., 0] - raster2[..., 0])
                  <= 1.0 / info.ticks_per_beat + 1e-12)


def test_derasterize_order_matches_reference_iteration():
    """Decoded cells come out in bar->beat->fraction->note order."""
    info = _info()
    r = Rasterizer(info)
    raster = np.zeros(r.raster_shape(True))
    cells = [(0, 0, 0, 5), (0, 0, 0, 10), (0, 1, 3, 2), (2, 0, 9, 55)]
    for c in cells:
        raster[c][0] = 1.0
        raster[c][1] = 0.5
        raster[c][3] = 1.0
    q = r.derasterize(raster, pitched=True)
    got = list(zip(q.bar.tolist(), q.beat.tolist(), q.frac_idx.tolist(),
                   q.note_idx.tolist()))
    assert got == cells


def test_full_pipeline_on_examples(example_midis):
    """End-to-end get_input on real files; cross-check one channel's raster
    against the full naive-oracle pipeline."""
    checked = 0
    for path in example_midis:
        data = load_midi_from_file(path)
        channels, info = read_midi(data)
        channels = [c for c in channels if len(c["messages"]) >= 4]
        if not any(is_pitched(c["instrument_id"]) for c in channels):
            continue
        song = get_input(channels, info)
        assert song.pitched.ndim == 6 and song.pitched.shape[4] == 56
        assert song.pitched.shape[5] == 5
        assert np.isfinite(song.pitched).all()
        assert song.pitched[..., 1].max() <= 1.0

        # oracle cross-check on the first pitched channel (merged notes)
        scale = info.scale
        first = [c for c in channels if is_pitched(c["instrument_id"])]
        # reproduce merging by instrument id for the first instrument
        iid = first[0]["instrument_id"]
        from mst_tpu.ops.events import merge_note_arrays
        same = [pair_notes(c["messages"]) for c in channels
                if c["instrument_id"] == iid]
        notes = merge_note_arrays(same)
        recs = [{"note_id": int(notes.note_id[i]), "time": int(notes.time[i]),
                 "end_time": int(notes.end_time[i]),
                 "velocity": float(notes.velocity[i])}
                for i in range(len(notes))]
        import math
        want = oracle.rasterize_naive(
            recs, tonic=scale.tonic, is_minor=scale.is_minor, pitched=True,
            ticks_per_beat=info.ticks_per_beat,
            ticks_per_bar=info.ticks_per_bar,
            n_bars=math.ceil(info.n_bars), n_beats=info.n_beats)
        np.testing.assert_array_equal(song.pitched[0], want.astype(np.float32))
        checked += 1
        if checked >= 4:
            break
    assert checked > 0


def test_derasterize_hard_matches_dense_thresholding():
    """hard=True (sparse fused thresholding) == hard_output on the dense
    tensor followed by plain derasterize, on values straddling both
    thresholds."""
    from mst_tpu.transfer import _hard_output_np
    rng = np.random.default_rng(3)
    info = _info(n_bars=4)
    r = Rasterizer(info)
    x = np.zeros((4, 4, 10, 56, 5), np.float32)
    # random sprinkle of cells incl. borderline velocities and accidentals
    n = 300
    cells = (rng.integers(0, 4, n), rng.integers(0, 4, n),
             rng.integers(0, 10, n), rng.integers(0, 56, n))
    x[cells + (0,)] = rng.uniform(0, 3, n)            # duration
    x[cells + (1,)] = rng.choice([0.0, 0.005, 0.01, 0.011, 0.4, 0.9], n)
    for f in (2, 3, 4):
        x[cells + (f,)] = rng.choice([0.0, 0.05, 0.1, 0.2, 0.9], n)
    want = r.derasterize(_hard_output_np(x), pitched=True)
    got = r.derasterize(x, pitched=True, hard=True)
    for field in ("bar", "beat", "frac_idx", "note_idx", "duration",
                  "velocity", "acc"):
        np.testing.assert_array_equal(getattr(want, field),
                                      getattr(got, field), err_msg=field)
