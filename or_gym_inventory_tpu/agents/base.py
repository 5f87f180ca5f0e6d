"""Agent protocol — the reference's L2 surface plus a device-policy bridge.

The reference defines ``BaseAgent`` with ``get_action(obs, env)`` /
``train(env_config, total_timesteps, save_path_prefix)`` / ``load`` /
``get_training_time`` (benchmark_InvManagementBacklogEnv.py:114-132). Host
agents here implement that protocol unchanged, so the benchmark harness runs
any mix of heuristics and learned policies.

Device policies are pure functions ``policy_fn(policy_state, obs, key, t) ->
action`` consumed by vector.rollout / parallel.sharded_rollout. ``PolicyAgent``
bridges a device policy into the host BaseAgent protocol for single-env
evaluation (compat path).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def write_ckpt_meta(ckpt_path: str, trained_timesteps: int) -> None:
    """Record the training budget next to a checkpoint. The skip-retrain
    shortcut must only fire when the stored model was trained for at least
    the requested budget (reference SB3AgentWrapper checks _total_timesteps,
    benchmark_InvManagementBacklogEnv.py:243-250) — without this a
    small-budget checkpoint silently poisons a later full-budget run."""
    with open(ckpt_path + ".meta.json", "w") as f:
        json.dump({"trained_timesteps": int(trained_timesteps)}, f)


def ckpt_trained_timesteps(ckpt_path: str) -> int:
    """Budget recorded at save time; 0 (always retrain) when absent."""
    try:
        with open(ckpt_path + ".meta.json") as f:
            return int(json.load(f).get("trained_timesteps", 0))
    except (OSError, ValueError):
        return 0


class BaseAgent:
    """Host agent protocol (reference benchmark_InvManagementBacklogEnv.py:114-132)."""

    def __init__(self, name: str = "BaseAgent"):
        self.name = name
        self.training_time = 0.0

    def get_action(self, observation: np.ndarray, env) -> np.ndarray:
        raise NotImplementedError

    def train(self, env_config: dict, total_timesteps: int,
              save_path_prefix: str = ""):
        print(f"Agent {self.name} does not require training.")

    def load(self, path: str):
        print(f"Agent {self.name} does not support loading.")

    def get_training_time(self) -> float:
        return self.training_time

    # ---- vectorized-path bridge (subclasses with device policies override)
    def device_policy(self, env, params) -> Optional[Callable]:
        """Return a ``policy_fn(policy_state, obs, key, t)`` for on-device
        batched evaluation, or None if only the host path exists."""
        return None


class RandomAgent(BaseAgent):
    """Uniform samples from the action space (reference
    benchmark_InvManagementBacklogEnv.py:134-140)."""

    def __init__(self):
        super().__init__(name="Random")

    def get_action(self, observation, env):
        return env.action_space.sample().astype(env.action_space.dtype)

    def device_policy(self, env, params):
        space = env.action_space(params)

        def policy(_state, obs, key, _t):
            return space.sample(key, (obs.shape[0],))
        return policy


class PolicyAgent(BaseAgent):
    """Host adapter around a device policy function (deterministic eval)."""

    def __init__(self, name: str, policy_fn: Callable, policy_state: Any = None):
        super().__init__(name=name)
        self.policy_fn = policy_fn
        self.policy_state = policy_state
        self._key = jax.random.PRNGKey(0)

    def get_action(self, observation, env):
        obs = jnp.asarray(observation)[None]
        t = jnp.asarray(getattr(env, "period", getattr(env, "step_count", 0)),
                        jnp.int32)
        action = self.policy_fn(self.policy_state, obs, self._key, t)
        return np.asarray(action[0]).astype(env.action_space.dtype)

    def device_policy(self, env, params):
        return self.policy_fn
