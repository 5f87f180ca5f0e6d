"""Core pytree structures shared by all environment families.

The reference's Gymnasium 5-tuple ``step`` return (obs, reward, terminated,
truncated, info — e.g. newsvendor.py:204) becomes a single ``TimeStep``
pytree so whole trajectories can be stacked by ``lax.scan`` without host
round-trips. ``info`` is a flat dict of arrays (the reference's info dicts —
inventory_management.py:334-345 — carry numpy vectors; here they're traced
arrays so metrics accumulate on-device).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TimeStep:
    obs: jax.Array
    reward: jax.Array
    terminated: jax.Array  # bool; always False in all three families
    truncated: jax.Array   # bool; True at the static horizon
    info: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def done(self) -> jax.Array:
        return jnp.logical_or(self.terminated, self.truncated)


def tree_batch_size(tree) -> int:
    """Leading-axis size of a batched pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0].shape[0] if leaves else 0
