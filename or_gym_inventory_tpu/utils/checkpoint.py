"""Checkpoint / resume for env state, training state, and RNG keys.

The reference had checkpointing only through SB3/RLlib model files
(SURVEY.md §5); environments themselves were unserializable beyond pickle.
Here every env/train state is a pure pytree, so checkpointing is exact and
trivial: msgpack bytes (flax.serialization) for single-host files, or an
orbax CheckpointManager for large/async/multi-host use.

Resuming an episode mid-flight is exact: state + params + key fully
determine the future (counter-based RNG).
"""

from __future__ import annotations

import os
from typing import Any, Optional


from flax import serialization


def save_pytree(path: str, tree: Any) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return path


def load_pytree(path: str, template: Any) -> Any:
    """Restore into ``template``'s structure (shapes/dtypes must match)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class OrbaxCheckpointer:
    """Async orbax-backed checkpoint manager (multi-host safe)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, tree: Any):
        self.manager.save(step, args=self._ocp.args.StandardSave(tree))

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = self.manager.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template))
        return self.manager.restore(step)

    def wait(self):
        self.manager.wait_until_finished()
