"""Newsvendor combined benchmark — extended roster.

Mirrors the intent of reference benchmark_newsvendor_sb3_rllib.py (corrupted
in the reference checkout; roster recovered at :1132-1158: + sS policies,
DDPG, PPO_LargeBuffer n_steps=4096, SAC_LowLR 1e-4, and RLlib PPO/SAC —
the RLlib duplicates collapse onto the same on-device learners here).
Evaluates on fixed scenarios via CustomizableNewsvendorEnv as the reference
combined script does.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.agents.base import RandomAgent
from or_gym_inventory_tpu.agents.off_policy import (DDPGAgent, OffPolicyConfig,
                                                    SACAgent, TD3Agent)
from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import newsvendor as nv

ENV_NAME_SHORT = "NewsvendorCombined"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 30))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 50_000))
SEED_OFFSET = 8000
ENV_CONFIG_EVAL = {"lead_time": 5, "step_limit": 50}
FAST = os.environ.get("OGT_FAST", "0") == "1"
MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
LOG_DIR = f"./logs_{ENV_NAME_SHORT}"

params_factory = partial(nv.default_params)
PPO_CFG = PPOConfig(num_envs=256, rollout_steps=25, num_minibatches=8)
OFF_CFG = OffPolicyConfig(num_envs=32, buffer_size=100_000, batch_size=256,
                          start_steps=1_000)

if __name__ == "__main__":
    rl = dict(model_dir=MODEL_DIR, log_dir=LOG_DIR)
    E, pf = nv.ENV, params_factory
    agents = [
        ("Random", RandomAgent()),
        ("OrderUpTo_SF=1.0", H.OrderUpToHeuristicAgent(1.0)),
        ("ClassicNV_SF=1.0_k_vs_h", H.ClassicNewsvendorAgent("k_vs_h", 1.0)),
        ("sS_Policy(s=0.50,S=1.2s)", H.sSPolicyAgent(0.5, 1.2)),
        ("sS_Policy(s=0.90,S=1.5s)", H.sSPolicyAgent(0.9, 1.5)),
        ("PPO", PPOAgent(E, pf, name="PPO", config=PPO_CFG, **rl)),
        ("SAC", SACAgent(E, pf, config=OFF_CFG, **rl)),
        ("TD3", TD3Agent(E, pf, config=OFF_CFG, **rl)),
        ("A2C", A2CAgent(E, pf, config=A2CConfig(num_envs=256), **rl)),
        # minibatched single-pass A2C (tools/a2c_sweep4.py winner)
        ("A2C_MB32", A2CAgent(E, pf, name="A2C_MB32",
                              config=A2CConfig(num_envs=256, rollout_steps=50,
                                               num_minibatches=32,
                                               updates_per_call=16), **rl)),
        ("DDPG", DDPGAgent(E, pf, config=OFF_CFG, **rl)),
        ("PPO_LargeBuffer", PPOAgent(E, pf, name="PPO_LargeBuffer",
                                     config=PPO_CFG.replace(rollout_steps=50,
                                                            num_envs=512), **rl)),
        ("SAC_LowLR", SACAgent(E, pf, name="SAC_LowLR",
                               config=OFF_CFG.replace(lr=1e-4), **rl)),
    ]
    run_benchmark(ENV_NAME_SHORT, agents, ad.CustomizableNewsvendorEnv,
                  ENV_CONFIG_EVAL, N_EVAL_EPISODES, SEED_OFFSET,
                  RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=LOG_DIR, fast=FAST, env=nv.ENV,
                  params=params_factory(env_config=ENV_CONFIG_EVAL))
    print("\nBenchmark script finished.")
