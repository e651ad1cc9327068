"""End-to-end style transfer driver on bundled songs (untrained model)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mst_tpu.models import StyleTransferModel
from mst_tpu.transfer import (
    ModelBundle, apply_style, combine_info, extract_style, get_model_input,
    transfer_style)
from mst_tpu.io import load_midi_from_file
from mst_tpu.ops.events import read_midi


@pytest.fixture(scope="module")
def bundle():
    model = StyleTransferModel()
    params = model.init(
        jax.random.PRNGKey(0), jnp.array([[1.0, 0.0]]), jnp.array([120.0]),
        jnp.zeros((1, 1, 4, 4, 10, 56, 5)),
        jnp.zeros((1, 1, 51)).at[0, 0, 0].set(1.0),
        jnp.zeros((1, 1, 4, 4, 10, 47, 2)))
    # sparsify so outputs decode quickly (see bench.py rationale)
    params = dict(params)
    for name in ("pitched_style_applier", "unpitched_style_applier"):
        layer = params["params"][name]["linear"]
        layer["bias"] = layer["bias"].at[1].set(-5.0)
    return ModelBundle(model=model, params=params)


def _example(name, example_midis):
    return [p for p in example_midis if p.name == name][0]


def test_transfer_style_end_to_end(bundle, example_midis, tmp_path):
    comp = _example("Sweet Dreams.mid", example_midis)
    style = _example("Angie.4.mid", example_midis)
    written = transfer_style(bundle, comp, [style], tmp_path)
    assert len(written) == 4
    names = [os.path.relpath(w, tmp_path) for w in written]
    assert names == [
        "Sweet Dreams/original/Sweet Dreams.mid",
        "Sweet Dreams/Sweet Dreams (reconstructed).mid",
        "Sweet Dreams/original/Angie.4.mid",
        "Sweet Dreams/Sweet Dreams (Angie.4 style).mid",
    ]
    from mst_tpu.exceptions import MidiFormatError
    for w in written:
        data = load_midi_from_file(w)
        assert data is not None, w
        try:
            channels, info = read_midi(data)
            assert info.tempo > 0
        except MidiFormatError:
            # a sparsified untrained model may emit a silent styled song —
            # the file itself is still structurally valid
            assert "original" not in w


def test_transfer_style_two_styles(bundle, example_midis, tmp_path):
    """Multiple style songs against one composition (the reference's
    style_paths loop, style_transfer.py:134-142): one styled output per
    style, each style's original saved once."""
    from mst_tpu.transfer import transfer_style
    comp = _example("Sweet Dreams.mid", example_midis)
    styles = [_example("Angie.4.mid", example_midis),
              _example("Equinox Part 4.mid", example_midis)]
    written = transfer_style(bundle, comp, styles, tmp_path)
    names = sorted(os.path.relpath(w, tmp_path) for w in written)
    assert names == sorted([
        "Sweet Dreams/original/Sweet Dreams.mid",
        "Sweet Dreams/Sweet Dreams (reconstructed).mid",
        "Sweet Dreams/original/Angie.4.mid",
        "Sweet Dreams/Sweet Dreams (Angie.4 style).mid",
        "Sweet Dreams/original/Equinox Part 4.mid",
        "Sweet Dreams/Sweet Dreams (Equinox Part 4 style).mid",
    ])
    for w in written:
        assert load_midi_from_file(w) is not None, w


def test_transfer_styles_unloadable_input_raises_clearly(bundle, tmp_path):
    """A corrupt input must fail with MidiFormatError naming the file, not a
    bare TypeError from unpacking the defensive loader's None."""
    from mst_tpu.exceptions import MidiFormatError
    from mst_tpu.transfer import transfer_styles
    bad = tmp_path / "bad.mid"
    bad.write_bytes(b"not a midi file")
    with pytest.raises(MidiFormatError, match="bad.mid"):
        transfer_styles(bundle, [str(bad)], [str(bad)], tmp_path / "out")


def test_pick_instruments_percussion_only_escalates():
    """n_instruments=1 with percussion on top widens to top-2 (the reference's
    live broadcast-comparison branch, style_transfer.py:107-108): one pitched
    channel must survive alongside the drums."""
    from mst_tpu.transfer import _device_pick_instruments
    from mst_tpu.data.taxonomy import PERCUSSION_ID
    logits = jnp.zeros(41).at[PERCUSSION_ID].set(5.0).at[7].set(3.0)
    picked, n_picked, has_unpitched = jax.jit(
        _device_pick_instruments, static_argnums=(2,))(logits, 1, 8)
    assert bool(has_unpitched)
    assert int(n_picked) == 1
    assert int(picked[0]) == 7
    # n_instruments=2 with percussion NOT on top: no escalation
    picked, n_picked, has_unpitched = jax.jit(
        _device_pick_instruments, static_argnums=(2,))(
            jnp.zeros(41).at[3].set(5.0).at[11].set(3.0), 2, 8)
    assert not bool(has_unpitched)
    assert int(n_picked) == 2
    assert sorted([int(picked[0]), int(picked[1])]) == [3, 11]


def test_apply_style_overflow_raises(bundle, example_midis, tmp_path):
    """Note counts beyond the largest compaction capacity must raise, never
    silently truncate the written .mid (VERDICT weak #4)."""
    import mst_tpu.transfer as tr
    comp = _example("Angie.4.mid", example_midis)
    _, song = get_model_input(comp)
    style_vec, melody, rhythm, n_bars = extract_style(bundle, song)
    dense = ModelBundle(model=bundle.model, params=bundle.params)
    # un-sparsify: push every velocity above threshold so every cell is a note
    dense.params = jax.tree_util.tree_map(lambda x: x, bundle.params)
    for name in ("pitched_style_applier", "unpitched_style_applier"):
        layer = dense.params["params"][name]["linear"]
        layer["bias"] = layer["bias"].at[1].set(5.0)
    old = tr.COMPACT_CAPACITIES
    tr.COMPACT_CAPACITIES = (256,)
    try:
        with pytest.raises(OverflowError):
            apply_style(dense, song.info, style_vec, melody, rhythm,
                        len(song.instruments), str(tmp_path / "x.mid"),
                        n_bars=n_bars)
    finally:
        tr.COMPACT_CAPACITIES = old


def test_block_table_overflow_falls_back_to_dense_compaction(
        bundle, example_midis, tmp_path, monkeypatch):
    """When the live-BLOCK routing table overflows but the record count fits,
    the ladder must fall back to the density-independent dense compaction and
    still write the full output (no capability regression vs jnp.nonzero)."""
    import mst_tpu.transfer as tr
    comp = _example("Angie.4.mid", example_midis)
    _, song = get_model_input(comp)
    style_vec, melody, rhythm, n_bars = extract_style(bundle, song)

    out_normal = tmp_path / "normal.mid"
    apply_style(bundle, song.info, style_vec, melody, rhythm,
                len(song.instruments), str(out_normal), n_bars=n_bars)

    # a 1-block routing table overflows for any real output; records fit
    monkeypatch.setattr(tr, "_block_capacities", lambda c: (1, 1))
    starved = ModelBundle(model=bundle.model, params=bundle.params)
    out_dense = tmp_path / "dense.mid"
    apply_style(starved, song.info, style_vec, melody, rhythm,
                len(song.instruments), str(out_dense), n_bars=n_bars)
    assert out_dense.read_bytes() == out_normal.read_bytes()


def test_dense_fallback_rechecks_true_counts(bundle, example_midis, tmp_path,
                                             monkeypatch):
    """An overflowed block routing table TRUNCATES the ladder's reported
    counts, so they can look like they fit a too-small capacity; the dense
    fallback must re-check its own (true) header counts and raise instead of
    letting the decode silently cap at capacity."""
    import mst_tpu.transfer as tr
    comp = _example("Angie.4.mid", example_midis)
    _, song = get_model_input(comp)
    style_vec, melody, rhythm, n_bars = extract_style(bundle, song)
    dense = ModelBundle(model=bundle.model, params=bundle.params)
    # un-sparsify: every cell becomes a note, far beyond a 256 capacity
    dense.params = jax.tree_util.tree_map(lambda x: x, bundle.params)
    for name in ("pitched_style_applier", "unpitched_style_applier"):
        layer = dense.params["params"][name]["linear"]
        layer["bias"] = layer["bias"].at[1].set(5.0)
    # 1-block routing table: the ladder's counts truncate to <=128, which
    # "fits" 256 — only the dense re-check can catch the real overflow
    monkeypatch.setattr(tr, "_block_capacities", lambda c: (1, 1))
    monkeypatch.setattr(tr, "COMPACT_CAPACITIES", (256,))
    with pytest.raises(OverflowError):
        apply_style(dense, song.info, style_vec, melody, rhythm,
                    len(song.instruments), str(tmp_path / "x.mid"),
                    n_bars=n_bars)


def test_compact_song_chunked_tier_matches_dense():
    """Big compaction tiers run the rank->cell lookup in lax.map chunks (the
    transient bound); records must stay bit-identical to the dense flat
    jnp.nonzero compaction."""
    from mst_tpu.transfer import (
        _COMPACT_CHUNK, _block_capacities, _compact_song, _compact_song_dense)
    rng = np.random.default_rng(0)
    C, R, T = 2, 64, 4
    shape = (C, R, T, 10, 56)
    vel = ((rng.random(shape) > 0.9)
           * rng.integers(1, 128, shape)).astype(np.uint8)
    dur = rng.integers(0, 1000, shape).astype(np.uint16)
    acc = rng.integers(0, 3, shape).astype(np.uint8)
    word = np.where(vel > 0,
                    (dur.astype(np.uint32) << 16)
                    | (vel.astype(np.uint32) << 8)
                    | acc.astype(np.uint32), 0).astype(np.uint32)
    capacity = 65536
    assert capacity > _COMPACT_CHUNK  # the chunked branch is what's tested
    args = (jnp.asarray(word), C, R)
    count, _, rec = jax.jit(lambda *a: _compact_song(
        *a, capacity, _block_capacities(capacity)[0]))(*args)
    count_d, _, rec_d = jax.jit(lambda *a: _compact_song_dense(
        *a, capacity))(*args)
    n = int(count)
    assert n == int(count_d)
    assert n > _COMPACT_CHUNK  # several chunks actually ran
    np.testing.assert_array_equal(np.asarray(rec[:n]), np.asarray(rec_d[:n]))


def test_extract_style_bucket_invariance(bundle, example_midis):
    """Latents are identical whichever bar bucket the song pads into."""
    import mst_tpu.transfer as tr
    comp = _example("Angie.4.mid", example_midis)
    _, song = get_model_input(comp)
    s1, m1, r1, R = extract_style(bundle, song)
    old = tr.BAR_BUCKETS
    tr.BAR_BUCKETS = (256, 512)  # force the next bucket up
    try:
        s2, m2, r2, R2 = extract_style(bundle, song)
    finally:
        tr.BAR_BUCKETS = old
    assert R == R2
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2[:, :m1.shape[1]]),
                               rtol=1e-4, atol=1e-5)


def test_original_save_roundtrip_stable(bundle, example_midis, tmp_path):
    """Saving the ingested original and re-ingesting keeps raster onsets."""
    from mst_tpu.transfer import save_channels
    from mst_tpu.ops.rasterize import Rasterizer
    from mst_tpu.data.pipeline import get_input
    comp = _example("Welcome to the Jungle.2 (300 it).mid", example_midis)
    _, song = get_model_input(comp)
    out = str(tmp_path / "orig.mid")
    save_channels(Rasterizer(song.info), song.pitched, song.unpitched,
                  song.instruments, out)
    channels, info = read_midi(load_midi_from_file(out))
    assert any(c["channel_id"] == 9 for c in channels)  # drums preserved


def test_transfer_and_evaluate(bundle, example_midis, tmp_path):
    """End-to-end transfer + rendered-audio spectral scoring (the pod-run
    eval, BASELINE configs[4])."""
    from mst_tpu.transfer import transfer_and_evaluate
    comp = _example("Welcome to the Jungle.2 (300 it).mid", example_midis)
    style = _example("Angie.4.mid", example_midis)
    scores = transfer_and_evaluate(bundle, comp, [style], tmp_path)
    assert len(scores) == 2  # reconstructed + styled
    for path, entry in scores.items():
        s = entry["vs_composition"]
        assert s is None or -1.0 <= s <= 1.0  # None: silent untrained output
        if "style)" in path:
            assert "vs_style" in entry


def test_extract_styles_batch_matches_single(bundle, example_midis):
    """Batched multi-song extraction returns (row-for-row) the same latents
    as per-song extract_style, up to bucket padding."""
    from mst_tpu.transfer import extract_styles
    s1 = get_model_input(_example("Angie.4.mid", example_midis))[1]
    s2 = get_model_input(_example("Sweet Dreams.mid", example_midis))[1]
    batches, locators = extract_styles(bundle, [s1, s2])
    for song, loc in zip((s1, s2), locators):
        g, row = loc
        batch = batches[g]
        style, melody, rhythm, R = extract_style(bundle, song)
        assert batch.n_bars[row] == R
        np.testing.assert_allclose(np.asarray(batch.style[row]),
                                   np.asarray(style[0]), rtol=1e-4, atol=1e-5)
        m_single = np.asarray(melody[0])
        m_batch = np.asarray(batch.melody[row])[:m_single.shape[0]]
        np.testing.assert_allclose(m_batch[:R], m_single[:R],
                                   rtol=1e-4, atol=1e-5)
        r_single = np.asarray(rhythm[0])
        r_batch = np.asarray(batch.rhythm[row])[:r_single.shape[0]]
        np.testing.assert_allclose(r_batch[:R], r_single[:R],
                                   rtol=1e-4, atol=1e-5)


def test_transfer_styles_multi_composition(bundle, example_midis, tmp_path):
    """Batched driver: two compositions against one style in grouped
    dispatches, same per-song file layout as transfer_style."""
    from mst_tpu.transfer import transfer_styles
    comps = [_example("Sweet Dreams.mid", example_midis),
             _example("Equinox Part 4.mid", example_midis)]
    style = _example("Angie.4.mid", example_midis)
    written = transfer_styles(bundle, comps, [style], tmp_path)
    assert len(written) == 8
    names = sorted(os.path.relpath(w, tmp_path) for w in written)
    assert names == sorted([
        "Sweet Dreams/original/Sweet Dreams.mid",
        "Sweet Dreams/Sweet Dreams (reconstructed).mid",
        "Sweet Dreams/original/Angie.4.mid",
        "Sweet Dreams/Sweet Dreams (Angie.4 style).mid",
        "Equinox Part 4/original/Equinox Part 4.mid",
        "Equinox Part 4/Equinox Part 4 (reconstructed).mid",
        "Equinox Part 4/original/Angie.4.mid",
        "Equinox Part 4/Equinox Part 4 (Angie.4 style).mid",
    ])
    for w in written:
        assert load_midi_from_file(w) is not None, w


def test_transfer_styles_across_meter_groups(bundle, example_midis, tmp_path):
    """Mixed 3/4 + 4/4 workload: compositions land in DIFFERENT extraction
    groups (distinct beats-per-bar bucket a T axis each), so the apply jobs
    gather style vectors across the concatenated style matrix (nonzero
    style_offset) — the cross-group path transfer_styles builds but bundled
    examples (all 4/4) never exercise."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_corpus import generate_song
    from mst_tpu.io import create_midi, native
    from mst_tpu.transfer import transfer_styles

    rng = np.random.default_rng(5)
    waltz = None
    for _ in range(40):
        info, instruments = generate_song(rng)
        if instruments and info["time_signature"]["numerator"] == 3:
            waltz = (info, instruments)
            break
    assert waltz is not None
    waltz_path = str(tmp_path / "waltz.mid")
    native.write_midi_file(waltz_path, create_midi(waltz[0], *waltz[1]))

    comps = [waltz_path, _example("Sweet Dreams.mid", example_midis)]
    style = _example("Angie.4.mid", example_midis)  # 4/4: waltz crosses groups
    written = transfer_styles(bundle, comps, [style], tmp_path / "out")
    assert len(written) == 8
    for w in written:
        assert load_midi_from_file(w) is not None, w
    # outputs keep the composition's 3/4 timing (combine_info). NB: a dense
    # untrained reconstruction puts a note at tick 0, and the reference's
    # ingest rejects a non-4/4 TS event coinciding with the first note
    # ("changed mid-song"), so read the raw TS meta event instead
    from mst_tpu.io.smf import EV_TIME_SIG
    recon = [w for w in written if "waltz (reconstructed)" in w]
    assert recon
    track = load_midi_from_file(recon[0]).tracks[0]
    ts_events = track.a[track.type == EV_TIME_SIG]
    assert list(ts_events) == [3]


def test_transfer_styles_mesh_sharded_matches_unsharded(bundle, example_midis,
                                                        tmp_path):
    """Batch-axis mesh sharding changes throughput, not results: outputs
    match the unsharded run (4-device data mesh, batch padded up to the axis
    size) byte-for-byte except for at most a handful of threshold-borderline
    cells the two compilations round differently."""
    from mst_tpu.parallel import create_mesh
    from mst_tpu.transfer import transfer_styles

    comps = [_example("Sweet Dreams.mid", example_midis),
             _example("Equinox Part 4.mid", example_midis)]
    style = _example("Angie.4.mid", example_midis)
    plain = transfer_styles(bundle, comps, [style], tmp_path / "plain")

    mesh = create_mesh(n_data=4, n_seq=1, devices=jax.devices()[:4])
    sharded_bundle = ModelBundle(model=bundle.model, params=bundle.params,
                                 mesh=mesh)
    sharded = transfer_styles(sharded_bundle, comps, [style],
                              tmp_path / "sharded")
    assert len(plain) == len(sharded)
    for a, b in zip(plain, sharded):
        assert os.path.relpath(a, tmp_path / "plain") == \
            os.path.relpath(b, tmp_path / "sharded")
        raw_a, raw_b = open(a, "rb").read(), open(b, "rb").read()
        if raw_a == raw_b:
            continue
        # the sharded compilation may round a BORDERLINE cell differently
        # (a velocity at the 0.01 hard_output threshold or a near-.5 tick):
        # compare the note structure — INCLUDING the quantized velocity
        # byte, so a systematic velocity bug can't hide behind the
        # borderline-cell tolerance — allowing a handful of threshold flips
        # out of tens of thousands of messages
        ch_a, _ = read_midi(load_midi_from_file(a))
        ch_b, _ = read_midi(load_midi_from_file(b))
        assert len(ch_a) == len(ch_b), a
        for ca, cb in zip(ch_a, ch_b):
            ma, mb = ca["messages"], cb["messages"]
            assert abs(len(ma) - len(mb)) <= 4, a

            def msg_set(m):
                vel_bytes = np.round(np.asarray(m.velocity) * 127.0)
                return set(zip(m.time.tolist(), m.note.tolist(),
                               m.is_on.tolist(),
                               vel_bytes.astype(int).tolist()))
            n_diff = len(msg_set(ma) ^ msg_set(mb))
            assert n_diff <= max(8, len(ma) // 1000), (a, n_diff)


def test_record_pool_matches_per_job_layout(bundle, example_midis, tmp_path):
    """The packed-record-pool fetch layout (meshless default) is a transport
    optimization only: outputs byte-identical to the per-job row layout,
    including when the first dispatch's pool tier is too small and the ladder
    re-dispatches at the exact tier (truncated-pool escalation)."""
    import mst_tpu.transfer as tr
    comp = _example("Sweet Dreams.mid", example_midis)
    style = _example("Angie.4.mid", example_midis)

    rows = ModelBundle(model=bundle.model, params=bundle.params,
                       use_record_pool=False)
    written_rows = transfer_style(rows, comp, [style], tmp_path / "rows")

    pooled = ModelBundle(model=bundle.model, params=bundle.params)
    # starve the first dispatch: a 16-record tier truncates any real output,
    # so the header-sum check must escalate and re-dispatch
    pooled.pool_hint_p = pooled.pool_hint_u = 1
    old = tr.POOL_TIERS
    tr.POOL_TIERS = (16,) + old
    try:
        written_pool = transfer_style(pooled, comp, [style],
                                      tmp_path / "pool")
    finally:
        tr.POOL_TIERS = old
    assert pooled.pool_hint_p > 16  # escalation observed real sums
    assert len(written_rows) == len(written_pool) == 4
    for pr, pp in zip(written_rows, written_pool):
        with open(pr, "rb") as fh:
            row_bytes = fh.read()
        with open(pp, "rb") as fh:
            pool_bytes = fh.read()
        assert row_bytes == pool_bytes, os.path.basename(pr)


def test_fused_request_matches_two_dispatch_path(bundle, example_midis,
                                                 tmp_path):
    """When a request's songs share one extraction bucket, transfer_styles
    runs extraction AND apply as ONE device program (_fused_transfer_full,
    one dispatch + one fetch). Outputs must be byte-identical to the
    two-dispatch pipeline."""
    from mst_tpu.transfer import ModelBundle
    comp = _example("Sweet Dreams.mid", example_midis)
    style = _example("Angie.4.mid", example_midis)
    assert bundle.fuse_requests  # default-on: the suite exercises the path
    written_fused = transfer_style(bundle, comp, [style],
                                   tmp_path / "fused")
    unfused = ModelBundle(model=bundle.model, params=bundle.params,
                          fuse_requests=False)
    written_plain = transfer_style(unfused, comp, [style],
                                   tmp_path / "plain")
    assert any(k.startswith("transfer_fused") for k in bundle._jitted)
    assert not any(k.startswith("transfer_fused") for k in unfused._jitted)
    assert len(written_fused) == len(written_plain) == 4
    for pf, pp in zip(written_fused, written_plain):
        with open(pf, "rb") as fh:
            fused_bytes = fh.read()
        with open(pp, "rb") as fh:
            plain_bytes = fh.read()
        assert fused_bytes == plain_bytes, os.path.basename(pf)
