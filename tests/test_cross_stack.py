"""Cross-stack validation: two independently implemented PPO stacks agree.

The reference's combined benchmarks derive confidence from pitting two
independent RL implementations against each other (SB3/torch vs RLlib/torch,
benchmark_NetInvMgmtLostSalesEnv_sb3_rllib.py:264-361). This lane recovers
that property: the JAX learner (agents/ppo.py — optax, vmap rollouts, fused
scan updates) and a from-scratch PyTorch PPO (tools/torch_ppo.py — torch
autodiff, host adapter envs, no shared code or RNG) train on the same
Gymnasium adapter env at the same budget and must land in the same reward
regime (same sign, same order of magnitude) under the same evaluation
protocol. Skips when torch is not installed.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from torch_ppo import TorchPPOAgent  # noqa: E402

from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig  # noqa: E402
from or_gym_inventory_tpu.bench.evaluate import evaluate_agent  # noqa: E402
from or_gym_inventory_tpu.envs import adapters as ad  # noqa: E402
from or_gym_inventory_tpu.envs import inv_management as im  # noqa: E402

ENV_CONFIG = {"periods": 20}
BUDGET = 24_000
EVAL_EPISODES = 8
SEED_OFFSET = 4000


def _mean_reward(agent):
    res = evaluate_agent(agent, ad.InvManagementBacklogEnv, EVAL_EPISODES,
                         seed_offset=SEED_OFFSET, env_config=ENV_CONFIG)
    return float(res["summary"]["TotalReward"].mean())


def test_jax_and_torch_ppo_land_in_same_reward_regime(tmp_path):
    from or_gym_inventory_tpu.agents.base import RandomAgent
    r_rand = _mean_reward(RandomAgent())   # env scale anchor (~-27k here)

    torch_agent = TorchPPOAgent(ad.InvManagementBacklogEnv,
                                num_envs=8, rollout_steps=64, seed=3)
    torch_agent.train(ENV_CONFIG, BUDGET)
    r_torch = _mean_reward(torch_agent)

    jax_agent = PPOAgent(
        im.ENV, im.default_params, name="PPO",
        config=PPOConfig(num_envs=16, rollout_steps=32, num_minibatches=4,
                         update_epochs=4, pi_arch=(64, 64),
                         vf_arch=(64, 64)),
        model_dir=str(tmp_path / "models"), log_dir=str(tmp_path / "logs"))
    jax_agent.train(ENV_CONFIG, BUDGET)
    r_jax = _mean_reward(jax_agent)

    print(f"cross-stack: random {r_rand:.1f}, torch PPO {r_torch:.1f}, "
          f"jax PPO {r_jax:.1f}")
    # raw rewards sit near zero on a +-30k scale, so compare the meaningful
    # quantity: improvement over the random baseline. Both independent
    # stacks must (a) improve and (b) recover a similar amount — a stack
    # optimizing a different objective or with broken plumbing lands far
    # from the other.
    d_torch, d_jax = r_torch - r_rand, r_jax - r_rand
    assert d_torch > 0 and d_jax > 0, (r_rand, r_torch, r_jax)
    ratio = max(d_torch, d_jax) / min(d_torch, d_jax)
    assert ratio < 1.5, (r_rand, r_torch, r_jax)
