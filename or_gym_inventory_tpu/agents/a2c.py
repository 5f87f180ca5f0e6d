"""A2C — synchronous advantage actor-critic on the PPO machinery.

The reference roster benchmarks SB3 A2C (+ "A2C_LSTM") across every env
family (benchmark_InvManagementBacklogEnv.py:698, 713). A2C is the
no-clipping, single-pass special case of the PPO update: one epoch, one
minibatch (full batch), RMSprop (SB3's A2C default), no LR anneal. Sharing
agents/ppo.py's fused update keeps one well-tested code path.
"""

from __future__ import annotations

from typing import Tuple

from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig


def A2CConfig(num_envs: int = 256, rollout_steps: int = 8, lr: float = 7e-4,
              gamma: float = 0.99, gae_lambda: float = 1.0,
              ent_coef: float = 0.0, vf_coef: float = 0.5,
              max_grad_norm: float = 0.5,
              pi_arch: Tuple[int, ...] = (64, 64),
              vf_arch: Tuple[int, ...] = (64, 64),
              normalize_obs: bool = True, optimizer: str = "rmsprop",
              **kw) -> PPOConfig:
    """SB3-A2C-shaped defaults expressed as a PPOConfig. Any PPOConfig
    field may be overridden through ``kw`` (incl. the A2C-shape defaults
    below, e.g. ``num_minibatches=8`` for minibatched single-pass A2C)."""
    fields = dict(
        num_envs=num_envs, rollout_steps=rollout_steps, lr=lr, gamma=gamma,
        gae_lambda=gae_lambda, clip_eps=10.0,  # effectively unclipped
        update_epochs=1, num_minibatches=1, ent_coef=ent_coef,
        vf_coef=vf_coef, max_grad_norm=max_grad_norm, pi_arch=pi_arch,
        vf_arch=vf_arch, anneal_lr=False, normalize_obs=normalize_obs,
        optimizer=optimizer)
    fields.update(kw)
    return PPOConfig(**fields)


class A2CAgent(PPOAgent):
    def __init__(self, env, params_factory, name: str = "A2C", config=None,
                 **kwargs):
        super().__init__(env, params_factory, name=name,
                         config=config or A2CConfig(), **kwargs)
