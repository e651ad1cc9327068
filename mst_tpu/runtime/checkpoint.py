"""Checkpoint/resume via orbax: params + optimizer state + step counters.

The reference pickles the whole torch model object every 100 iterations with no
optimizer state and no resume path (train-model.py:156-160, SURVEY.md §5).
Here checkpoints carry the full TrainState so training resumes exactly,
and restore is a one-liner.
"""

from __future__ import annotations

import json
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

    def _cursor_path(self, step: int) -> str:
        return os.path.join(self.directory, f"cursor_{step}.json")

    def save(self, step: int, state: TrainState,
             cursor: Optional[int] = None) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state._asdict()))
        self.manager.wait_until_finished()
        if cursor is not None:
            # data-iterator position alongside the weights, so --resume
            # continues the exact song sequence of an uninterrupted run
            with open(self._cursor_path(step), "w") as fh:
                json.dump({"cursor": int(cursor)}, fh)

    def load_cursor(self, step: int) -> Optional[int]:
        try:
            with open(self._cursor_path(step)) as fh:
                return int(json.load(fh)["cursor"])
        except (OSError, ValueError, KeyError):
            return None

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


def load_trained_params(model, directory: str, seed: int = 0):
    """Restore trained params from the latest snapshot under ``directory``.

    Builds a shape-matching TrainState template by initializing the model on
    the host CPU backend (tiny shapes — flax param shapes depend only on
    feature dims), then restores and returns ``(params, step)``.
    Returns ``(None, None)`` when the directory holds no snapshots."""
    import jax.numpy as jnp

    from mst_tpu.config import Config
    from mst_tpu.runtime.train import TrainState, make_optimizer

    if not os.path.isdir(directory):
        return None, None
    mgr = CheckpointManager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.array([[1.0, 0.0]]),
            jnp.array([120.0]), jnp.zeros((1, 1, 4, 4, 10, 56, 5)),
            jnp.zeros((1, 1, 51)).at[0, 0, 0].set(1.0),
            jnp.zeros((1, 1, 4, 4, 10, 47, 2)))
        template = TrainState(
            params=params,
            opt_state=make_optimizer(Config()).init(params),
            accum_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
            micro_step=jnp.zeros((), jnp.int32),
            opt_step=jnp.zeros((), jnp.int32))
    restored = mgr.restore(template)
    mgr.close()
    return restored.params, step
