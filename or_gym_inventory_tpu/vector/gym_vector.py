"""Gymnasium-style vectorized env wrapper over the device batch.

The reference's only vec-env was SB3 ``DummyVecEnv`` with n_envs=1
(benchmark_InvManagementBacklogEnv.py:269). This wrapper exposes the JAX
batch through the ``gymnasium.vector.VectorEnv`` calling convention
(batched reset/step with numpy in/out + autoreset), so host RL libraries
can consume thousands of TPU-resident envs through one device call per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.vector import vecenv


class BatchedGymVectorEnv:
    """num_envs lockstep instances; one jitted device call per step."""

    def __init__(self, env: Environment, params, num_envs: int, seed: int = 0):
        self.env = env
        self.params = params
        self.num_envs = num_envs
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        space = env.observation_space(params)
        aspace = env.action_space(params)
        self.single_observation_space = space.to_gymnasium()
        self.single_action_space = aspace.to_gymnasium()

        self._reset_fn = jax.jit(
            lambda key: vecenv.batch_reset(env, params, key, num_envs))

        def _step(state, action, key):
            step_key, reset_key = jax.random.split(key)
            state, ts = vecenv.batch_step(env, params, state, action,
                                          step_key, num_envs)
            state, next_obs = vecenv.auto_reset(env, params, state, ts,
                                                reset_key, num_envs)
            return state, next_obs, ts

        self._step_fn = jax.jit(_step)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._state, ts = self._reset_fn(self._next_key())
        return np.asarray(ts.obs), {}

    def step(self, actions):
        actions = np.asarray(actions)
        self._state, next_obs, ts = self._step_fn(self._state, actions,
                                                  self._next_key())
        done = np.asarray(ts.done)
        info = {"final_observation": np.asarray(ts.obs)}
        return (np.asarray(next_obs), np.asarray(ts.reward),
                np.asarray(ts.terminated), np.asarray(ts.truncated), info)

    def close(self):
        pass
