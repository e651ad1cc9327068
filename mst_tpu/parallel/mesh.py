"""Device-mesh layer: data-parallel and sequence-parallel training.

The reference is strictly single-device (SURVEY.md §2.4: no torch.distributed,
batch size 1). Here scaling is mesh-native JAX:

- a ``Mesh`` with axes ``(data, seq)`` over all local (or multi-host) devices;
- the batch axis of every Batch array is sharded over ``data`` via
  NamedSharding; params/optimizer state are replicated;
- the jitted train step then compiles with XLA inserting the gradient
  all-reduce (psum) over ICI — no hand-written collectives in the DP path;
- the bar axis of the raster tensors is sharded over ``seq``: the model's LSTM
  recurrences run the cond-gated ppermute pipeline in
  :mod:`mst_tpu.parallel.seq_lstm` (wired in via
  :mod:`mst_tpu.ops.seq_context`; forward and gradients are bit-compared to
  the dense scan in tests/test_seq_parallel.py), so full-length songs train
  without the reference's 800-bar truncation;
- ``jax.distributed.initialize()`` (multi-host DCN) is the deployment story for
  pods; the same code path compiles unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mst_tpu.config import Config
from mst_tpu.models import StyleTransferModel
from mst_tpu.runtime.train import Batch, TrainState, make_train_step


def create_mesh(n_data: Optional[int] = None, n_seq: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None or n_data < 0:
        n_data = len(devices) // n_seq
    devices = np.asarray(devices[:n_data * n_seq]).reshape(n_data, n_seq)
    mesh = Mesh(devices, axis_names=("data", "seq"))
    if devices.size > 1:
        # a bare pallas_call is an opaque custom call the SPMD partitioner
        # cannot split; registering the mesh makes an ENABLED note-grid
        # kernel shard_map itself so each device runs it on its local shard
        # (no-op for the default-off kernel — the jnp tail partitions under
        # plain pjit)
        from mst_tpu.ops import pallas_grid
        pallas_grid.set_mesh(mesh)
    return mesh


def _batch_spec(batch: Batch, seq: bool = False) -> Batch:
    """PartitionSpec per Batch field: batch axis over ``data``; with ``seq``,
    the bar axis (dim 2 of the raster tensors — 7-D or NF-fused 6-D, the bar
    axis is dim 2 either way) over ``seq``."""
    def spec(x, bar_axis=None):
        if x is None:
            return None
        parts = ["data"] + [None] * (x.ndim - 1)
        if seq and bar_axis is not None and x.ndim > bar_axis:
            parts[bar_axis] = "seq"
        return P(*parts)
    return Batch(
        mode=spec(batch.mode),
        bpm=spec(batch.bpm),
        pitched=spec(batch.pitched, bar_axis=2),
        instruments_features=spec(batch.instruments_features),
        unpitched=spec(batch.unpitched, bar_axis=2),
        used_instruments=spec(batch.used_instruments),
        bar_lengths=spec(batch.bar_lengths),
        channel_mask=spec(batch.channel_mask),
        uchannel_mask=spec(batch.uchannel_mask),
    )


def shard_batch(batch: Batch, mesh: Mesh, seq: bool = False) -> Batch:
    """device_put every array with its batch axis sharded over ``data`` (and
    optionally the bar axis over ``seq``)."""
    specs = _batch_spec(batch, seq=seq)
    out = []
    for x, spec in zip(batch, specs):
        if x is None:
            out.append(None)
        else:
            out.append(jax.device_put(x, NamedSharding(mesh, spec)))
    return Batch(*out)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / TrainState) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(model: StyleTransferModel, config: Config,
                            has_unpitched: bool, mesh: Mesh):
    """The standard train step jitted with explicit input shardings: state
    replicated, batch sharded over ``data``. XLA adds the grad psum over ICI."""
    step = make_train_step(model, config, has_unpitched)

    def sharded_step(state: TrainState, batch: Batch):
        batch = shard_batch(batch, mesh)
        return step(state, batch)

    return sharded_step
