"""The K-step scan dispatch must equal K sequential single-step dispatches.

make_multi_train_step exists to amortize per-dispatch transport round-trips
on remote-attached TPUs (one jit call runs K training steps); its semantics
must be exactly the sequential loop's: same gradient accumulation boundaries,
same StepLR decay points, same losses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.config import Config
from mst_tpu.models import StyleTransferModel
from mst_tpu.runtime.train import (Batch, create_train_state, group_stacks,
                                   make_multi_train_step, make_train_step)
from tests.test_train_parallel import _tiny_batch


def _stack(batches):
    fields = {}
    for name in Batch._fields:
        vals = [getattr(b, name) for b in batches]
        fields[name] = (None if vals[0] is None
                        else jnp.concatenate(vals, axis=0))
    return Batch(**fields)


def test_multi_step_equals_sequential():
    config = Config()
    model = StyleTransferModel(config=config.model)
    K = 3
    batches = [_tiny_batch(B=2, C=1, R=3, seed=s) for s in (0, 1, 2)]

    step = make_train_step(model, config, has_unpitched=False,
                           fetch_losses=False)
    s = create_train_state(model, config, batches[0], jax.random.PRNGKey(0))
    seq_losses = []
    for b in batches:
        s, v = step(s, b)
        seq_losses.append(np.asarray(v))

    multi = make_multi_train_step(model, config, has_unpitched=False, k=K)
    s2 = create_train_state(model, config, batches[0], jax.random.PRNGKey(0))
    s2, loss_mat = multi(s2, _stack(batches))
    loss_mat = np.asarray(loss_mat)

    assert loss_mat.shape == (K, len(seq_losses[0]))
    np.testing.assert_allclose(loss_mat, np.stack(seq_losses),
                               rtol=1e-6, atol=1e-7)
    assert int(s2.micro_step) == int(s.micro_step) == K
    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        # scan and unrolled programs fuse differently; parameters agree to
        # float32 rounding, not bitwise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-6)
    # the optimizer applied (iter_size=2 -> once within 3 micro-steps)
    assert int(s2.opt_step) == int(s.opt_step) == 1


def test_multi_step_b_major_sharded_matches_sequential():
    """The K-step scan under a data-parallel mesh (b-major stack layout,
    leading axis sharded over ``data``) == the sequential sharded loop."""
    from mst_tpu.parallel import create_mesh, replicate, shard_batch

    config = Config()
    model = StyleTransferModel(config=config.model)
    K, B = 2, 4
    batches = [_tiny_batch(B=B, C=1, R=3, seed=s) for s in (0, 1)]
    mesh = create_mesh(n_data=4, devices=jax.devices()[:4])

    step = make_train_step(model, config, has_unpitched=False,
                           fetch_losses=False)
    s = create_train_state(model, config, batches[0], jax.random.PRNGKey(0))
    s = replicate(s, mesh)
    seq_losses = []
    for b in batches:
        s, v = step(s, shard_batch(b, mesh))
        seq_losses.append(np.asarray(v))

    # b-major stack: row b*K + k holds step k's row b
    fields = {}
    for name in Batch._fields:
        vals = [getattr(b, name) for b in batches]
        if vals[0] is None:
            fields[name] = None
        else:
            stacked = jnp.stack(vals, axis=1)          # (B, K, ...)
            fields[name] = stacked.reshape((B * K,) + stacked.shape[2:])
    kbatch = shard_batch(Batch(**fields), mesh)

    multi = make_multi_train_step(model, config, has_unpitched=False, k=K,
                                  b_major=True)
    s2 = create_train_state(model, config, batches[0], jax.random.PRNGKey(0))
    s2 = replicate(s2, mesh)
    s2, loss_mat = multi(s2, kbatch)

    np.testing.assert_allclose(np.asarray(loss_mat), np.stack(seq_losses),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-6)


def test_group_stacks_consecutive_same_signature():
    stream = [(i, s) for i, s in enumerate("AABBBBAB")]
    out = list(group_stacks(iter(stream), 2, signature=lambda x: x))
    # AA -> stack; BB BB -> two stacks; A -> single (next B breaks it);
    # B -> single (stream end)
    assert out == [(1, ["A", "A"]), (3, ["B", "B"]), (5, ["B", "B"]),
                   (6, ["A"]), (7, ["B"])]


def test_group_stacks_preserves_order():
    stream = [(i, s) for i, s in enumerate("ABABAB")]
    out = list(group_stacks(iter(stream), 3, signature=lambda x: x))
    flat = [it for _, items in out for it in items]
    assert flat == list("ABABAB")  # alternating signatures never stack


def test_group_stacks_limit_prevents_overshoot():
    stream = [(i, "A") for i in range(7)]
    out = list(group_stacks(iter(stream), 3, signature=lambda x: x, limit=5))
    sizes = [len(items) for _, items in out]
    # 3-stack fits (3 <= 5), second would cross the budget -> singles
    assert sizes == [3, 1, 1, 1, 1]
    assert sum(sizes) == 7  # nothing dropped; the caller stops at its limit


def test_window_sort_groups_signatures_within_block():
    from mst_tpu.runtime.train import window_sort
    stream = [(i + 1, s) for i, s in enumerate("ABABABAB")]  # cursors 1..8
    out = list(window_sort(iter(stream), 8, signature=lambda x: x))
    assert [it for _, it in out] == list("AAAABBBB")  # stable within block
    # non-final items replay the whole block (cursor of attempt 0); the
    # final item carries the true end-of-block cursor
    assert [c for c, _ in out[:-1]] == [0] * 7
    assert out[-1][0] == 8


def test_window_sort_turns_alternating_stream_into_full_stacks():
    from mst_tpu.runtime.train import window_sort
    stream = [(i + 1, s) for i, s in enumerate("ABABABABABAB")]
    plain = list(group_stacks(iter(stream), 3, signature=lambda x: x))
    sorted_stream = window_sort(iter(stream), 6, signature=lambda x: x)
    windowed = list(group_stacks(sorted_stream, 3, signature=lambda x: x))
    assert all(len(items) == 1 for _, items in plain)  # alternation: singles
    assert all(len(items) == 3 for _, items in windowed)  # full stacks
    # same multiset of items either way — nothing dropped or duplicated
    flat = sorted(it for _, items in windowed for it in items)
    assert flat == sorted("ABABABABABAB")


def test_window_sort_epoch_visits_every_song_once():
    from mst_tpu.runtime.train import window_sort
    # 3 signatures x uneven counts, across two windows of 5
    stream = [(i + 1, s) for i, s in enumerate("ABCABACBAC")]
    out = list(window_sort(iter(stream), 5, signature=lambda x: x))
    assert sorted(it for _, it in out) == sorted("ABCABACBAC")
    assert len(out) == 10
    # block boundaries respected: first 5 outputs are a permutation of the
    # first 5 inputs (no item crosses a window)
    assert sorted(it for _, it in out[:5]) == sorted("ABCAB")
