"""JAX-native space descriptions.

The reference exposes Gymnasium ``spaces.Box`` observation/action specs
(reference: newsvendor.py:76-88, inventory_management.py:109-128,
network_management.py:270-298). Here a ``Box`` is a lightweight, hashable
descriptor whose ``sample`` draws on-device from a JAX PRNG key, so a batch of
thousands of random actions is one fused kernel instead of a Python loop.

``to_gymnasium()`` converts to a real ``gymnasium.spaces.Box`` for the
host-side adapter layer (drop-in compatibility with the reference API).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    """An n-dimensional box of bounded values.

    ``low``/``high`` are stored as numpy arrays (host constants — they are
    closed over by jitted samplers, never traced).
    """

    low: np.ndarray
    high: np.ndarray
    dtype: np.dtype

    def __init__(self, low, high, shape: Tuple[int, ...] = None, dtype=np.float32):
        dtype = np.dtype(dtype)
        low = np.broadcast_to(np.asarray(low, dtype=dtype), shape).copy() if shape \
            else np.asarray(low, dtype=dtype)
        high = np.broadcast_to(np.asarray(high, dtype=dtype), shape).copy() if shape \
            else np.asarray(high, dtype=dtype)
        assert low.shape == high.shape, (low.shape, high.shape)
        object.__setattr__(self, "low", low)
        object.__setattr__(self, "high", high)
        object.__setattr__(self, "dtype", dtype)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.low.shape

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...] = ()) -> jax.Array:
        """Draw uniform samples on-device.

        Integer boxes sample uniformly over the inclusive integer range
        (matching ``gymnasium.spaces.Box.sample`` semantics for int dtypes);
        float boxes sample uniformly over [low, high).
        """
        shape = tuple(batch_shape) + self.shape
        if np.issubdtype(self.dtype, np.integer):
            # Inclusive upper bound; guard against overflow at the extreme.
            return jax.random.randint(
                key, shape,
                jnp.asarray(self.low, dtype=jnp.int32),
                jnp.asarray(self.high, dtype=jnp.int32) + 1,
                dtype=jnp.int32)
        u = jax.random.uniform(key, shape, dtype=jnp.float32)
        low = jnp.asarray(self.low, dtype=jnp.float32)
        high = jnp.asarray(self.high, dtype=jnp.float32)
        return low + u * (high - low)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(x.shape == self.shape and np.all(x >= self.low) and np.all(x <= self.high))

    def clip(self, x: jax.Array) -> jax.Array:
        return jnp.clip(x, jnp.asarray(self.low, x.dtype), jnp.asarray(self.high, x.dtype))

    def to_gymnasium(self):
        import gymnasium
        return gymnasium.spaces.Box(low=self.low, high=self.high, dtype=self.dtype)

    def __repr__(self):
        return f"Box(shape={self.shape}, dtype={self.dtype})"
