"""Device-side rasterization (segment + Pallas) vs. the host rasterizer, and
the packed wire format's bit-exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.data.pipeline import get_input
from mst_tpu.io import load_midi_from_file
from mst_tpu.ops.device_raster import (
    concat_and_pad, device_rasterize_song, encode_notes, segment_rasterize)
from mst_tpu.ops.events import read_midi
from mst_tpu.ops.rasterize import Rasterizer


def _song(example_midis, name="Sweet Dreams.mid"):
    path = [p for p in example_midis if p.name == name][0]
    channels, info = read_midi(load_midi_from_file(path))
    return get_input(channels, info)


def test_segment_matches_host(example_midis):
    song = _song(example_midis)
    r = Rasterizer(song.info)
    dev = device_rasterize_song(r, song.pitched_notes, True,
                                n_channels=len(song.pitched_notes),
                                use_pallas=False)
    host = np.stack([r.rasterize(n, True) for n in song.pitched_notes])
    np.testing.assert_array_equal(np.asarray(dev), host.astype(np.float32))


def test_pallas_interpret_matches_host(example_midis):
    song = _song(example_midis)
    r = Rasterizer(song.info)
    for pitched, notes in ((True, song.pitched_notes),
                           (False, song.unpitched_notes)):
        dev = device_rasterize_song(r, notes, pitched,
                                    n_channels=len(notes), use_pallas=True)
        host = np.stack([r.rasterize(n, pitched) for n in notes])
        np.testing.assert_array_equal(np.asarray(dev),
                                      host.astype(np.float32))


def test_padded_layout_and_truncation(example_midis):
    """Bucket-padded device raster matches the truncated+padded host raster."""
    song = _song(example_midis, "Angie.4.mid")
    r = Rasterizer(song.info)
    C = len(song.pitched_notes)
    Cb, Rb, Rreal = C + 2, 128, 40
    dev = np.asarray(device_rasterize_song(
        r, song.pitched_notes, True, n_channels=Cb, n_bars=Rb,
        valid_bars=Rreal, use_pallas=False))
    host = np.stack([r.rasterize(n, True) for n in song.pitched_notes])
    want = np.zeros((Cb, Rb) + host.shape[2:], np.float32)
    want[:C, :Rreal] = host[:, :Rreal]
    np.testing.assert_array_equal(dev, want)


def test_collision_semantics():
    """Two notes in one cell -> elementwise max, matching the host scatter."""
    row = np.array([5, 5, 9], np.int32)
    note = np.array([3, 3, 0], np.int32)
    acc = np.array([0, 2, 1], np.int32)
    dur = np.array([2.0, 1.0, 0.5], np.float32)
    vel = np.array([0.3, 0.9, 0.1], np.float32)
    valid = np.array([True, True, True])
    out = np.asarray(segment_rasterize(
        jnp.asarray(row), jnp.asarray(note), jnp.asarray(acc),
        jnp.asarray(dur), jnp.asarray(vel), jnp.asarray(valid),
        n_rows=16, n_notes=8, n_feat=5)).reshape(16, 8, 5)
    np.testing.assert_allclose(out[5, 3], [2.0, 0.9, 1.0, 0.0, 1.0])
    np.testing.assert_allclose(out[9, 0], [0.5, 0.1, 0.0, 1.0, 0.0])
    assert out.sum() == out[5, 3].sum() + out[9, 0].sum()


def test_packed_output_bit_exact_vs_float_path():
    """_pack_output + derasterize_packed == hard_output float path."""
    from mst_tpu.transfer import _pack_output, _hard_output_np
    from mst_tpu.ops.events import SongInfo
    from mst_tpu.theory.scales import Scale
    rng = np.random.default_rng(0)
    x = rng.random((1, 2, 3, 4, 10, 56, 5)).astype(np.float32)
    x[..., 1] *= (rng.random(x.shape[:-1]) > 0.7)
    tpb = 480
    dur, vel, acc = (np.asarray(t) for t in
                     _pack_output(jnp.asarray(x), jnp.float32(tpb)))
    info = SongInfo(ticks_per_beat=tpb, numerator=4, denominator=4,
                    key_signature=None, duration=3 * 4 * tpb,
                    ticks_per_bar=4 * tpb, n_bars=3.0, n_beats=4,
                    tempo2time={500000: 1}, tempo=500000, bpm=120,
                    scale=Scale(0, False))
    r = Rasterizer(info)
    hard = _hard_output_np(x[0])
    for c in range(2):
        q_float = r.derasterize(hard[c], pitched=True)
        q_packed = r.derasterize_packed(dur[0, c], vel[0, c], acc[0, c],
                                        pitched=True)
        m_float = r.qnotes_to_messages(q_float, True)
        m_packed = r.qnotes_to_messages(q_packed, True)
        np.testing.assert_array_equal(m_float.time, m_packed.time)
        np.testing.assert_array_equal(m_float.note, m_packed.note)
        # velocities agree at the byte level create_midi will write
        np.testing.assert_array_equal(
            (m_float.velocity * 127).astype(np.int64),
            (m_packed.velocity * 127).astype(np.int64))


def test_bf16_scatter_equals_fp32_scatter_then_cast(example_midis):
    """Scattering at bfloat16 == fp32 scatter followed by a cast, bit for bit
    (round-to-nearest is monotone, so rounding commutes with max) — on both
    the jnp scatter path and the Pallas kernel (interpret mode on CPU)."""
    song = _song(example_midis)
    r = Rasterizer(song.info)
    C = len(song.pitched_notes)
    for use_pallas in (False, True):
        fp32 = device_rasterize_song(r, song.pitched_notes, True,
                                     n_channels=C, use_pallas=use_pallas)
        bf16 = device_rasterize_song(r, song.pitched_notes, True,
                                     n_channels=C, use_pallas=use_pallas,
                                     out_dtype=jnp.bfloat16)
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(bf16).astype(np.float32),
            np.asarray(fp32.astype(jnp.bfloat16)).astype(np.float32),
            err_msg=f"use_pallas={use_pallas}")
