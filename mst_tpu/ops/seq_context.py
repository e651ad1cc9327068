"""Sequence-parallel context: tells the LSTM ops to run their recurrence
sharded over the mesh's ``seq`` axis.

Usage (see mst_tpu.parallel / train-model.py --seq-parallel):

    with sequence_sharding(mesh, "seq"):
        state, losses = train_step(state, batch)   # bar-axis scans pipeline

Inside the context, :class:`mst_tpu.ops.lstm.LSTM`/``BiLSTM`` dispatch any scan
whose time axis is divisible by the seq-axis size (and long enough to be worth
it) to :func:`mst_tpu.parallel.seq_lstm.seq_sharded_scan`; all other ops are
untouched (XLA shards them from the input shardings).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

_state = threading.local()

MIN_SEQ_LEN = 16  # scans shorter than this stay local (beat-axis scans etc.)


def current_seq_mesh() -> Optional[Tuple[object, str]]:
    return getattr(_state, "value", None)


@contextlib.contextmanager
def sequence_sharding(mesh, axis: str = "seq"):
    """Enable seq-sharded LSTM recurrences within the scope (no-op if the
    mesh's seq axis has size 1)."""
    if mesh is None or mesh.shape[axis] <= 1:
        yield
        return
    prev = getattr(_state, "value", None)
    _state.value = (mesh, axis)
    try:
        yield
    finally:
        _state.value = prev
