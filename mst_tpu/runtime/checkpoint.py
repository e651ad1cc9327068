"""Checkpoint/resume via orbax: params + optimizer state + step counters.

The reference pickles the whole torch model object every 100 iterations with no
optimizer state and no resume path (train-model.py:156-160, SURVEY.md §5).
Here checkpoints carry the full TrainState so training resumes exactly,
and restore is a one-liner.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from mst_tpu.runtime.train import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state._asdict()))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template._asdict())
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract))
        return TrainState(**restored)

    def close(self):
        self.manager.close()
