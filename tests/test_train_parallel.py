"""Training step, scheduler/accumulation semantics, and mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.config import Config, TrainConfig
from mst_tpu.models import StyleTransferModel
from mst_tpu.runtime.train import (
    batch_from_song, create_train_state, make_lr_schedule, make_train_step)


def _tiny_batch(B=1, C=1, R=3, T=4, seed=0):
    import mst_tpu.runtime.train as tr
    rng = np.random.default_rng(seed)
    pitched = (rng.random((B, C, R, T, 10, 56, 5)) *
               (rng.random((B, C, R, T, 10, 56, 1)) > 0.9)).astype(np.float32)
    instf = np.zeros((B, C, 51), np.float32)
    instf[:, 0, 0] = 1.0
    used = np.zeros((B, 41), np.float32)
    used[:, 0] = 1.0
    return tr.Batch(
        mode=jnp.asarray(np.tile([[1.0, 0.0]], (B, 1)).astype(np.float32)),
        bpm=jnp.full((B,), 100.0), pitched=jnp.asarray(pitched),
        instruments_features=jnp.asarray(instf), unpitched=None,
        used_instruments=jnp.asarray(used),
        bar_lengths=jnp.full((B,), R, jnp.int32),
        channel_mask=jnp.ones((B, C), jnp.float32), uchannel_mask=None)


def test_init_from_percussion_free_song_trains_percussion_song():
    """Regression: a run whose FIRST song has no percussion must still train
    later percussion songs — create_train_state seeds the unpitched branch
    with a dummy input, since flax only creates params for executed paths."""
    config = Config()
    model = StyleTransferModel(config=config.model)
    no_perc = _tiny_batch()                    # unpitched=None
    state = create_train_state(model, config, no_perc, jax.random.PRNGKey(0))
    assert "unpitched_channels_encoder" in state.params["params"]

    B, C, R, T = no_perc.pitched.shape[:4]
    rng = np.random.default_rng(3)
    unpitched = (rng.random((B, 1, R, T, 10, 47, 2)) *
                 (rng.random((B, 1, R, T, 10, 47, 1)) > 0.9)).astype(
                     np.float32)
    perc = no_perc._replace(unpitched=jnp.asarray(unpitched),
                            uchannel_mask=jnp.ones((B, 1), jnp.float32))
    step = make_train_step(model, config, has_unpitched=True)
    state, losses = step(state, perc)
    assert np.isfinite(float(losses.total))
    assert np.isfinite(float(losses.unpitched_notes))


def test_remat_step_matches_plain_step():
    """--remat (jax.checkpoint) changes memory, not math: losses and the
    updated state match the plain step to float tolerance."""
    import dataclasses
    config = Config()
    remat_cfg = dataclasses.replace(
        config, train=dataclasses.replace(config.train, remat=True))
    model = StyleTransferModel(config=config.model)
    batch = _tiny_batch()
    state_a = create_train_state(model, config, batch, jax.random.PRNGKey(0))
    state_b = create_train_state(model, remat_cfg, batch,
                                 jax.random.PRNGKey(0))
    step_a = make_train_step(model, config, has_unpitched=False)
    step_b = make_train_step(model, remat_cfg, has_unpitched=False)
    state_a, losses_a = step_a(state_a, batch)
    state_b, losses_b = step_b(state_b, batch)
    assert np.isclose(losses_a.total, losses_b.total, rtol=1e-6)
    ga = jax.tree_util.tree_leaves(state_a.accum_grads)
    gb = jax.tree_util.tree_leaves(state_b.accum_grads)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_clamp_bar_bucket():
    from mst_tpu.runtime.train import clamp_bar_bucket
    buckets = (64, 128, 256, 512, 800)
    budget = 8 * 8 * 128 * 4
    # fits: unchanged
    assert clamp_bar_bucket(128, 8, 8, 4, budget, buckets) == 128
    # (8, 8, 256, 4) exceeds: floors to 128
    assert clamp_bar_bucket(256, 8, 8, 4, budget, buckets) == 128
    # fewer channels buy more bars
    assert clamp_bar_bucket(512, 8, 2, 4, budget, buckets) == 512
    # nothing fits: raw allowed count
    assert clamp_bar_bucket(512, 64, 16, 4, budget, buckets) == 8


def test_train_step_accumulation_and_apply():
    """Params change only every iter_size micro-steps; grads are summed."""
    config = Config()
    model = StyleTransferModel(config=config.model)
    batch = _tiny_batch()
    state = create_train_state(model, config, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, config, has_unpitched=False)

    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state1, losses1 = step(state, batch)
    assert np.isfinite(float(losses1.total))
    # iter_size=2: after one micro-step params are unchanged, grads accumulated
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert int(state1.opt_step) == 0
    g1 = jax.tree_util.tree_leaves(state1.accum_grads)[0]
    assert float(jnp.abs(g1).sum()) > 0

    state2, losses2 = step(state1, batch)
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))
    assert int(state2.opt_step) == 1
    g2 = jax.tree_util.tree_leaves(state2.accum_grads)[0]
    assert float(jnp.abs(g2).sum()) == 0  # reset after apply


def test_lr_schedule_step_decay():
    config = Config(train=TrainConfig(learning_rate=0.01, lr_decay_every=200,
                                      lr_decay_gamma=0.9))
    sched = make_lr_schedule(config)
    assert np.isclose(float(sched(0)), 0.01)
    assert np.isclose(float(sched(199)), 0.01)
    assert np.isclose(float(sched(200)), 0.009)
    assert np.isclose(float(sched(400)), 0.0081)


def test_batch_from_song_on_example(example_midis):
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi
    from mst_tpu.data.pipeline import get_input
    path = [p for p in example_midis if "Angie" in p.name][0]
    channels, info = read_midi(load_midi_from_file(path))
    song = get_input(channels, info)
    batch = batch_from_song(song, max_n_bars=8)
    assert batch.pitched.shape[2] == 8
    assert batch.pitched.shape[0] == 1
    assert float(batch.bpm[0]) == info.bpm


def test_dryrun_multichip_8():
    """The full data-parallel train step compiles and runs on an 8-device
    mesh (the driver's validation path)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """DP-sharded training step == unsharded step on the same batch."""
    from mst_tpu.parallel import create_mesh, replicate, shard_batch
    config = Config()
    model = StyleTransferModel(config=config.model)
    batch = _tiny_batch(B=4)
    state = create_train_state(model, config, batch, jax.random.PRNGKey(1))
    step = make_train_step(model, config, has_unpitched=False)

    # single-device result
    s_single, losses_single = step(state, batch)

    # sharded over 4 devices
    mesh = create_mesh(n_data=4, devices=jax.devices()[:4])
    state2 = create_train_state(model, config, batch, jax.random.PRNGKey(1))
    state2 = replicate(state2, mesh)
    sharded_batch = shard_batch(batch, mesh)
    s_shard, losses_shard = step(state2, sharded_batch)

    assert np.isclose(float(losses_single.total), float(losses_shard.total),
                      rtol=1e-5)
    a = jax.tree_util.tree_leaves(s_single.accum_grads)[0]
    b = jax.tree_util.tree_leaves(s_shard.accum_grads)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-6)


def test_device_batch_matches_pad_batch(example_midis):
    """Device-rasterized training batch == host pad_batch at equal settings."""
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.runtime.train import device_batch_from_song, pad_batch
    path = [p for p in example_midis if p.name == "Angie.4.mid"][0]
    channels, info = read_midi(load_midi_from_file(path))
    song = get_input(channels, info)
    a = device_batch_from_song(song, 8, 64, bar_cap=50, use_pallas=False)
    b = pad_batch([song], 8, 64, bar_cap=50)
    np.testing.assert_array_equal(np.asarray(a.pitched), np.asarray(b.pitched))
    np.testing.assert_array_equal(np.asarray(a.instruments_features),
                                  np.asarray(b.instruments_features))
    np.testing.assert_array_equal(np.asarray(a.channel_mask),
                                  np.asarray(b.channel_mask))
    np.testing.assert_array_equal(np.asarray(a.bar_lengths),
                                  np.asarray(b.bar_lengths))
    np.testing.assert_array_equal(np.asarray(a.used_instruments),
                                  np.asarray(b.used_instruments))
    if a.unpitched is not None or b.unpitched is not None:
        np.testing.assert_array_equal(np.asarray(a.unpitched),
                                      np.asarray(b.unpitched))


def test_device_batch_matches_pad_batch_multisong(example_midis):
    """B>1 device-rasterized batch == host pad_batch: per-song bar caps,
    channel truncation, masks, and mixed unpitched presence (VERDICT #4)."""
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.runtime.train import device_batch_from_songs, pad_batch

    names = ["Angie.4.mid", "Sweet Dreams.mid", "Equinox Part 4.mid"]
    songs = []
    for name in names:
        path = [p for p in example_midis if p.name == name][0]
        channels, info = read_midi(load_midi_from_file(path))
        songs.append(get_input(channels, info))
    caps = [50, 30, 64]
    a = device_batch_from_songs(songs, 8, 64, bar_cap=caps, use_pallas=False)
    b = pad_batch(songs, 8, 64, bar_cap=caps)
    for field in ("pitched", "unpitched", "instruments_features",
                  "channel_mask", "uchannel_mask", "bar_lengths",
                  "used_instruments", "mode", "bpm"):
        x, y = getattr(a, field), getattr(b, field)
        if x is None and y is None:
            continue
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=field)


def test_mixed_unpitched_batch_is_finite_and_row_consistent(example_midis):
    """A batch mixing songs WITH and WITHOUT percussion must produce finite
    losses, and a no-percussion row's latents must equal the same song run
    through the unpitched=None path (regression: all-masked channel combine
    divided 0/0 and poisoned the whole batch with NaNs that safe_sqrt then
    silently zeroed)."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.config import Config
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.ops.events import read_midi
    from mst_tpu.runtime.train import (
        create_train_state, device_batch_from_songs, make_train_step)

    songs = []
    for name in ("Beat It.4.mid",  # has percussion
                 "Nocturne No. 1 in E minor, Op. 72_ Andante.mid"):  # none
        path = [p for p in example_midis if p.name == name][0]
        channels, info = read_midi(load_midi_from_file(path))
        songs.append(get_input(channels, info))
    assert songs[0].unpitched is not None and songs[1].unpitched is None

    batch = device_batch_from_songs(songs, 8, 64, bar_cap=[40, 40],
                                    use_pallas=False)
    assert float(np.asarray(batch.uchannel_mask)[1].max()) == 0.0

    config = Config()
    model = StyleTransferModel(config=config.model)
    state = create_train_state(model, config, batch, jax.random.PRNGKey(0))
    params = state.params

    # the no-percussion row equals its own unpitched=None forward
    # (run before the train step: the step donates the params buffers)
    style_mix, melody_mix, rhythm_mix = model.apply(
        params, batch.mode, batch.bpm, batch.pitched,
        batch.instruments_features, batch.unpitched,
        bar_lengths=batch.bar_lengths, channel_mask=batch.channel_mask,
        uchannel_mask=batch.uchannel_mask,
        method=StyleTransferModel.extract_style)
    style_solo, melody_solo, rhythm_solo = model.apply(
        params, batch.mode[1:], batch.bpm[1:], batch.pitched[1:],
        batch.instruments_features[1:], None,
        bar_lengths=batch.bar_lengths[1:], channel_mask=batch.channel_mask[1:],
        uchannel_mask=None, method=StyleTransferModel.extract_style)
    np.testing.assert_allclose(np.asarray(style_mix[1]),
                               np.asarray(style_solo[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rhythm_mix[1]),
                               np.asarray(rhythm_solo[0]), rtol=1e-4,
                               atol=1e-5)

    # finite losses through a real train step
    step = make_train_step(model, config, has_unpitched=True)
    state, losses = step(state, batch)
    for name, v in zip(losses._fields, losses):
        assert np.isfinite(v), (name, v)


def test_nf_fused_batch_layout_contract(example_midis):
    """Batches ship rasters NF-fused; split_note_features restores the 7-axis
    layout bit-exactly, and the fused batch matches a 7-axis rasterization.

    The fused layout exists so the raster program's output needs no
    standalone relayout (measured 1.8 ms/build on the v5e) — this pins the
    two layouts to the same bytes so the convention can never drift."""
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.device_raster import device_rasterize_batch
    from mst_tpu.ops.events import read_midi
    from mst_tpu.ops.rasterize import Rasterizer
    from mst_tpu.ops.shapes import split_note_features
    from mst_tpu.runtime.train import device_batch_from_song

    path = [p for p in example_midis if p.name == "Angie.4.mid"][0]
    channels, info = read_midi(load_midi_from_file(path))
    song = get_input(channels, info)
    batch = device_batch_from_song(song, 8, 64, bar_cap=50, use_pallas=False)

    # fused convention: minor axis is note*feat
    assert batch.pitched.ndim == 6 and batch.pitched.shape[-1] == 56 * 5
    split = split_note_features(batch.pitched, 5)
    assert split.shape == batch.pitched.shape[:-1] + (56, 5)
    # 7-axis passthrough is the identity
    np.testing.assert_array_equal(np.asarray(split_note_features(split, 5)),
                                  np.asarray(split))
    # and the split bytes equal a direct 7-axis rasterization
    want = device_rasterize_batch(
        [Rasterizer(song.info)], [song.pitched_notes[:8]], True, 8, 64,
        [min(song.n_bars, 50)], use_pallas=False)
    np.testing.assert_array_equal(np.asarray(split), np.asarray(want))
    if batch.unpitched is not None:
        assert batch.unpitched.shape[-1] == 47 * 2
        u = split_note_features(batch.unpitched, 2)
        assert u.shape == batch.unpitched.shape[:-1] + (47, 2)


def test_device_batch_born_sharded_matches_dense(example_midis):
    """device_batch_from_songs(mesh=...) — rasters built by the shard_map'd
    per-device scatter (ops.device_raster.device_rasterize_batch_sharded) —
    must BIT-match the single-device build, and come back already sharded
    over the data axis."""
    import jax
    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi
    from mst_tpu.data.pipeline import get_input
    from mst_tpu.parallel import create_mesh
    from mst_tpu.runtime.train import device_batch_from_songs

    names = ["Angie.4.mid", "Sweet Dreams.mid", "Equinox Part 4.mid",
             "Tico Tico No Fuba.mid"]
    songs = []
    for name in names:
        path = [p for p in example_midis if p.name == name][0]
        channels, info = read_midi(load_midi_from_file(path))
        songs.append(get_input(channels, info))
    caps = [50, 30, 64, 40]
    mesh = create_mesh(n_data=4, n_seq=2)
    try:
        a = device_batch_from_songs(songs, 8, 64, bar_cap=caps, mesh=mesh)
        b = device_batch_from_songs(songs, 8, 64, bar_cap=caps)
        np.testing.assert_array_equal(np.asarray(a.pitched),
                                      np.asarray(b.pitched))
        if b.unpitched is not None:
            np.testing.assert_array_equal(np.asarray(a.unpitched),
                                          np.asarray(b.unpitched))
        # the sharded build's batch axis is laid out over the data axis
        assert "data" in str(a.pitched.sharding.spec), a.pitched.sharding
    finally:
        from mst_tpu.ops import pallas_grid
        pallas_grid.set_mesh(None)
