"""Newsvendor benchmark — heuristics vs on-device RL.

Mirrors reference benchmark_newsvendor.py (roster :340-363, config :54-65:
30 eval episodes, seeds from 2000, 30k RL timesteps, eval env lead_time=5 /
step_limit=50) with the SB3 agents replaced by this framework's on-device
learners. Run: ``python benchmarks/benchmark_newsvendor.py``.

Env overrides: OGT_EPISODES / OGT_TIMESTEPS / OGT_FAST=1 (vectorized eval) /
OGT_AGENTS=name,name (re-measure a subset of rows; applies to every script
routed through bench.runner.run_benchmark).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.agents.base import RandomAgent
from or_gym_inventory_tpu.agents.off_policy import (OffPolicyConfig, SACAgent,
                                                    TD3Agent)
from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import newsvendor as nv

# --- Configuration (reference benchmark_newsvendor.py:54-65) ---
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 30))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 30_000))
SEED_OFFSET = 2000
ENV_NAME_SHORT = "Newsvendor"
ENV_CONFIG_EVAL = {
    "lead_time": 5, "step_limit": 50, "p_max": 100.0, "h_max": 5.0,
    "k_max": 10.0, "mu_max": 200.0,
}
FAST = os.environ.get("OGT_FAST", "0") == "1"
MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
LOG_DIR = f"./logs_{ENV_NAME_SHORT}"

params_factory = partial(nv.default_params)
# TPU-shaped on-policy batch (validated: learns past the heuristics within a
# wall-clock budget comparable to SB3's 30k-step runs)
PPO_CFG = PPOConfig(num_envs=256, rollout_steps=50, num_minibatches=8,
                    update_epochs=4, ent_coef=0.0)
OFF_CFG = OffPolicyConfig(num_envs=32, buffer_size=100_000, batch_size=256,
                          start_steps=1_000)

if __name__ == "__main__":
    rl = dict(model_dir=MODEL_DIR, log_dir=LOG_DIR)
    agents = [
        ("Random", RandomAgent()),
        ("OrderUpTo_SF=1.0", H.OrderUpToHeuristicAgent(1.0)),
        ("OrderUpTo_SF=1.2", H.OrderUpToHeuristicAgent(1.2)),
        ("OrderUpTo_SF=0.8", H.OrderUpToHeuristicAgent(0.8)),
        ("ClassicNV_SF=1.0_k_vs_h", H.ClassicNewsvendorAgent("k_vs_h", 1.0)),
        ("PPO", PPOAgent(nv.ENV, params_factory, name="PPO", config=PPO_CFG, **rl)),
        ("SAC", SACAgent(nv.ENV, params_factory, config=OFF_CFG, **rl)),
        ("TD3", TD3Agent(nv.ENV, params_factory, config=OFF_CFG, **rl)),
        ("A2C", A2CAgent(nv.ENV, params_factory,
                         config=A2CConfig(), **rl)),
        # minibatched single-pass A2C (tools/a2c_sweep4.py winner): 32
        # gradient steps per batch with MC returns — profitable where the
        # SB3-default shape converges to order-nothing
        ("A2C_MB32", A2CAgent(nv.ENV, params_factory, name="A2C_MB32",
                              config=A2CConfig(num_envs=256, rollout_steps=50,
                                               num_minibatches=32,
                                               updates_per_call=16), **rl)),
    ]
    run_benchmark(ENV_NAME_SHORT, agents, ad.NewsvendorEnv, ENV_CONFIG_EVAL,
                  N_EVAL_EPISODES, SEED_OFFSET, RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=LOG_DIR, fast=FAST, env=nv.ENV,
                  params=params_factory(env_config=ENV_CONFIG_EVAL))
    print("\nBenchmark script finished.")
