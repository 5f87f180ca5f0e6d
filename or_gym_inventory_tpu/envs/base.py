"""The functional environment interface.

The reference's L1 surface is the Gymnasium mutable-object API
(``reset(seed) -> (obs, info)`` / ``step(action) -> 5-tuple``, e.g.
newsvendor.py:100-204). The TPU-native counterpart is a pure-function
interface over pytrees:

    state, ts = env.reset(params, key)
    state, ts = env.step(params, state, action, key)

- ``params`` is a frozen config dataclass; fields that determine array shapes
  (lead times, horizons, topology) are static Python ints, so ``jit``
  specializes per config — exactly XLA's compilation model.
- ``state`` is a flat bundle of arrays (a pytree). vmap over it batches
  thousands of env instances; shard_map shards that batch over chips.
- Randomness is explicit (counter-based keys), so trajectories are replayable
  and batches are order-independent.

Each family also exposes a deterministic kernel (``step_with_demand``) — the
injection point for the NumPy-parity oracle (core/parity.py) and for
user-supplied demand paths (the reference's ``user_D`` hooks).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax

from or_gym_inventory_tpu.core.spaces import Box
from or_gym_inventory_tpu.core.struct import TimeStep


@dataclasses.dataclass(frozen=True)
class Environment:
    """A bundle of pure functions defining one environment family."""

    name: str
    default_params: Callable[..., Any]
    reset: Callable[[Any, jax.Array], Tuple[Any, TimeStep]]
    step: Callable[[Any, Any, jax.Array, jax.Array], Tuple[Any, TimeStep]]
    step_with_demand: Callable[..., Tuple[Any, TimeStep]]
    observation_space: Callable[[Any], Box]
    action_space: Callable[[Any], Box]

    def horizon(self, params) -> int:
        """Static episode length (all families truncate at a fixed horizon)."""
        return params.horizon
