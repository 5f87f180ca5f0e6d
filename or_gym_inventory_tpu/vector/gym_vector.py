"""Gymnasium-conformant vectorized env over the device batch.

The reference's only vec-env was SB3 ``DummyVecEnv`` with n_envs=1
(benchmark_InvManagementBacklogEnv.py:269). ``BatchedGymVectorEnv`` is a
real ``gymnasium.vector.VectorEnv`` subclass over the JAX lockstep batch —
batched ``observation_space``/``action_space`` via
``gymnasium.vector.utils.batch_space``, numpy in/out, one jitted device
call per step — so host RL libraries consume thousands of TPU-resident
envs through the standard vector API (conformance + external-consumer
tests: tests/test_gym_vector.py).

All three gymnasium autoreset modes are supported (stateful gymnasium
wrappers assert specific modes — e.g. NormalizeObservation requires
NEXT_STEP):
- SAME_STEP (default): the step that ends an episode returns the fresh
  reset obs; the terminal obs rides in ``info["final_obs"]`` (the
  convention of the internal vecenv.auto_reset / PPO learner path).
- NEXT_STEP: the terminal step returns the terminal obs; the FOLLOWING
  step resets (its action is ignored) and returns reward 0, done False —
  gymnasium >= 1.0's default convention.
- DISABLED: no automatic reset; the caller must ``reset()``.
"""

from __future__ import annotations

from typing import Optional, Union

import gymnasium
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium.vector import AutoresetMode, VectorEnv
from gymnasium.vector.utils import batch_space

from or_gym_inventory_tpu.envs.base import Environment
from or_gym_inventory_tpu.vector import vecenv


class BatchedGymVectorEnv(VectorEnv):
    """num_envs lockstep instances; one jitted device call per step."""

    def __init__(self, env: Environment, params, num_envs: int, seed: int = 0,
                 autoreset_mode: Union[AutoresetMode, str] = AutoresetMode.SAME_STEP):
        self.env = env
        self.params = params
        self.num_envs = num_envs
        mode = AutoresetMode(autoreset_mode)
        self.metadata = {**self.metadata, "autoreset_mode": mode}
        self._mode = mode
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._pending = None  # NEXT_STEP: envs awaiting their deferred reset
        space = env.observation_space(params)
        aspace = env.action_space(params)
        self.single_observation_space = space.to_gymnasium()
        self.single_action_space = aspace.to_gymnasium()
        self.observation_space = batch_space(self.single_observation_space,
                                             num_envs)
        self.action_space = batch_space(self.single_action_space, num_envs)

        self._reset_fn = jax.jit(
            lambda key: vecenv.batch_reset(env, params, key, num_envs))

        def _step_same(state, action, key):
            step_key, reset_key = jax.random.split(key)
            state, ts = vecenv.batch_step(env, params, state, action,
                                          step_key, num_envs)
            state, next_obs = vecenv.auto_reset(env, params, state, ts,
                                                reset_key, num_envs)
            return state, next_obs, ts

        def _step_next(state, pending, action, key):
            # NEXT_STEP: envs flagged ``pending`` reset instead of stepping
            # (their action is discarded, reward 0, done False). The step
            # computes for the full batch; the reset-and-merge only runs
            # when some env is actually pending (lax.cond — under lockstep
            # fixed horizons that is 1 step in `horizon`), so non-terminal
            # steps cost the same as a plain batch_step
            # (tests/test_gym_vector.py pins the structure and the timing).
            step_key, reset_key = jax.random.split(key)
            state_s, ts = vecenv.batch_step(env, params, state, action,
                                            step_key, num_envs)

            def with_reset(operand):
                state_s, ts = operand
                state_r, ts_r = vecenv.batch_reset(env, params, reset_key,
                                                   num_envs)

                def sel(new, old):
                    p = pending.reshape(pending.shape
                                        + (1,) * (new.ndim - pending.ndim))
                    return jnp.where(p, new, old)

                state = jax.tree_util.tree_map(sel, state_r, state_s)
                obs = sel(ts_r.obs, ts.obs)
                zero = jnp.zeros_like(ts.reward)
                false = jnp.zeros_like(ts.terminated)
                return state, (obs, sel(zero, ts.reward),
                               sel(false, ts.terminated),
                               sel(false, ts.truncated))

            def no_reset(operand):
                state_s, ts = operand
                return state_s, (ts.obs, ts.reward, ts.terminated,
                                 ts.truncated)

            state, out = jax.lax.cond(jnp.any(pending), with_reset,
                                      no_reset, (state_s, ts))
            new_pending = out[2] | out[3]
            return state, out, new_pending

        def _step_plain(state, action, key):
            return vecenv.batch_step(env, params, state, action, key,
                                     num_envs)

        self._step_same = jax.jit(_step_same)
        self._step_next = jax.jit(_step_next)
        self._step_plain = jax.jit(_step_plain)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._state, ts = self._reset_fn(self._next_key())
        self._pending = jnp.zeros((self.num_envs,), bool)
        return np.asarray(ts.obs), {}

    def step(self, actions):
        actions = np.asarray(actions)
        if self._mode is AutoresetMode.SAME_STEP:
            self._state, next_obs, ts = self._step_same(
                self._state, actions, self._next_key())
            final_obs = np.asarray(ts.obs)
            done = np.asarray(ts.terminated) | np.asarray(ts.truncated)
            info = {
                "final_obs": final_obs,        # gymnasium >= 1.0 name
                "final_info": {},
                "final_observation": final_obs,  # pre-1.0 name
                # gymnasium SAME_STEP convention: boolean masks flagging
                # which envs actually terminated this step (all-or-none
                # under lockstep fixed horizons, but mask-aware consumers
                # should not have to know that)
                "_final_obs": done,
                "_final_info": done,
                "_final_observation": done,  # mask for the pre-1.0 key
            }
            return (np.asarray(next_obs), np.asarray(ts.reward),
                    np.asarray(ts.terminated), np.asarray(ts.truncated), info)
        if self._mode is AutoresetMode.NEXT_STEP:
            self._state, out, self._pending = self._step_next(
                self._state, self._pending, actions, self._next_key())
            obs, reward, terminated, truncated = (np.asarray(x) for x in out)
            return obs, reward, terminated, truncated, {}
        self._state, ts = self._step_plain(self._state, actions,
                                           self._next_key())
        return (np.asarray(ts.obs), np.asarray(ts.reward),
                np.asarray(ts.terminated), np.asarray(ts.truncated), {})

    def close_extras(self, **kwargs):
        pass
