"""Runtime subsystems: checkpoint round-trip, prefetch, metrics, utils."""

import os
import time

import jax
import numpy as np
import pytest


def test_checkpoint_save_restore(tmp_path):
    from mst_tpu.config import Config
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.checkpoint import CheckpointManager
    from mst_tpu.runtime.train import create_train_state, make_train_step
    from tests.test_train_parallel import _tiny_batch

    config = Config()
    model = StyleTransferModel(config=config.model)
    batch = _tiny_batch()
    state = create_train_state(model, config, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, config, has_unpitched=False)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "snap"))
    mgr.save(0, state)
    assert mgr.latest_step() == 0

    template = create_train_state(model, config, batch, jax.random.PRNGKey(1))
    restored = mgr.restore(template)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.micro_step) == int(state.micro_step)
    # optimizer state (Adam moments) restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_prefetch_iterator_order_and_exceptions():
    from mst_tpu.data.prefetch import prefetch_iterator

    assert list(prefetch_iterator(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("upstream failed")

    it = prefetch_iterator(boom(), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="upstream failed"):
        for _ in it:
            pass


def test_prefetch_overlaps_production():
    from mst_tpu.data.prefetch import prefetch_iterator

    def slow_producer():
        for i in range(6):
            time.sleep(0.03)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch_iterator(slow_producer(), depth=4):
        time.sleep(0.03)  # consumer work overlapping producer work
    elapsed = time.perf_counter() - t0
    assert elapsed < 0.33  # serial would be ~0.36s


def test_ema_meter_matches_reference_semantics():
    from mst_tpu.runtime.metrics import EmaMeter
    m = EmaMeter(momentum=0.99)
    vals = [1.0, 0.5, 0.25]
    s = seen = 0.0
    for v in vals:
        m.update(1, loss=v)
        s = s * 0.99 + v
        seen = seen * 0.99 + 1
    assert np.isclose(m.averages["loss"], s / seen)


def test_csv_logger_append(tmp_path):
    from mst_tpu.runtime.metrics import CsvLogger
    path = str(tmp_path / "log.csv")
    logger = CsvLogger(path)
    logger.append(iteration=0, loss=1.0)
    logger.append(iteration=1, loss=0.5)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "iteration,loss"
    assert len(lines) == 3


def test_csv_logger_reserved_column_names(tmp_path):
    # row keys that collide with save_to_csv's own parameter names must land
    # in the CSV, not be swallowed or raise TypeError
    from mst_tpu.runtime.metrics import CsvLogger
    path = str(tmp_path / "log.csv")
    logger = CsvLogger(path)
    logger.append(path="song.mid", data=0.5, fieldnames=2, when_exists=3)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "path,data,fieldnames,when_exists"
    assert lines[1] == "song.mid,0.5,2,3"


def test_utils_parity():
    from mst_tpu.utils import (cross_entropy, flatten, group_by,
                               normalize_dist, round_number, save_to_csv,
                               list2df)
    assert group_by([{"k": 1, "v": 2}, {"k": 1, "v": 3}], key="k") == \
        {1: [{"k": 1, "v": 2}, {"k": 1, "v": 3}]}
    assert flatten([[1, 2], [3]]) == [1, 2, 3]
    np.testing.assert_allclose(normalize_dist([1, 3]), [0.25, 0.75])
    np.testing.assert_allclose(normalize_dist([0, 0]), [0.5, 0.5])
    assert round_number(7, 4) == (8, -1)
    assert round_number(6, 4) == (8, -2)  # half rounds up
    assert round_number(5, 4) == (4, 1)
    ce = cross_entropy(np.array([0.5, 0.5]), np.array([1.0, 0.0]))
    assert np.isclose(ce, -np.log(0.5) / 2)
    df = list2df([{"a": 1, "b": {"c": 2}}], flatten=True)
    assert list(df.columns) == ["a", "b/c"]


def test_score_scales_matches_detection():
    from mst_tpu.theory.scales import detect_scale, score_scales
    rng = np.random.default_rng(0)
    dist = rng.random(12)
    records = score_scales(dist)
    assert len(records) == 24
    best = min(records, key=lambda r: r["loss"])
    got = detect_scale(dist)
    assert best["key"] == got.key_name
    assert (best["mode"] == "minor") == got.is_minor


def test_resume_cursor_replays_exact_song_sequence(example_midis, tmp_path):
    """--resume continues the corpus stream where the checkpoint left off:
    starting a fresh iterator at a consumed song's cursor yields exactly the
    songs an uninterrupted run would have seen next (VERDICT weak #7)."""
    from mst_tpu.data.pipeline import iter_inputs

    files = [str(p) for p in example_midis[:6]]

    def take(n, start_at=0):
        it = iter_inputs(files, shuffle=True, looped=True,
                         rng=np.random.default_rng(7), start_at=start_at)
        return [(f, s.cursor) for f, (_, s) in
                ((f_s[0], f_s) for f_s in (next(it) for _ in range(n)))]

    full = take(6)
    cursor_after_third = full[2][1]
    resumed = take(3, start_at=cursor_after_third)
    assert [f for f, _ in resumed] == [f for f, _ in full[3:6]]
    assert [c for _, c in resumed] == [c for _, c in full[3:6]]


def test_checkpoint_cursor_roundtrip(tmp_path):
    from mst_tpu.config import Config
    from mst_tpu.models import StyleTransferModel
    from mst_tpu.runtime.checkpoint import CheckpointManager
    from mst_tpu.runtime.train import create_train_state
    from tests.test_train_parallel import _tiny_batch

    config = Config()
    model = StyleTransferModel(config=config.model)
    state = create_train_state(model, config, _tiny_batch(),
                               jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "snap"))
    mgr.save(4, state, cursor=123)
    assert mgr.load_cursor(4) == 123
    assert mgr.load_cursor(99) is None
    mgr.close()


def test_persistent_compile_cache_enabled():
    """Importing mst_tpu turns on JAX's persistent compilation cache (one
    compile per machine, not per process — critical behind the slow remote
    tunnel); MST_TPU_NO_COMPILE_CACHE=1 opts a process out."""
    import os
    import subprocess
    import sys

    import mst_tpu  # noqa: F401 — the import is what enables the cache

    assert jax.config.jax_compilation_cache_dir
    env = {**os.environ, "MST_TPU_NO_COMPILE_CACHE": "1"}
    out = subprocess.run(
        [sys.executable, "-c",
         "import mst_tpu, jax; print(jax.config.jax_compilation_cache_dir)"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.stdout.strip() == "None"
