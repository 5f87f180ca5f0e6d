"""InvManagement (backlog) combined benchmark — SB3 + RLlib roster.

Mirrors reference benchmark_InvManagementBacklogEnv_sb3_rllib.py (corrupted
in the reference checkout; intent recovered from the interleaved copies):
config :161-167 / :641-650 (30 episodes, seeds from 9000, 75k RL steps,
periods=50), roster :1120-1152 (Random, BaseStock SF 1.0/1.2/0.8;
SB3 PPO/SAC/TD3/A2C/DDPG + PPO-LSTM; RLlib PPO(lr=5e-5), SAC(gamma=0.98),
TD3, A2C, DDPG). The RLlib entries map through ``make_agent`` — the
framework's algorithm-by-name + config-updates surface that replaces
RLlibAgentWrapper.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.agents.algo_registry import make_agent
from or_gym_inventory_tpu.agents.base import RandomAgent
from or_gym_inventory_tpu.agents.off_policy import (DDPGAgent, OffPolicyConfig,
                                                    SACAgent, TD3Agent)
from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig
from or_gym_inventory_tpu.agents.recurrent_ppo import (RecurrentPPOAgent,
                                                       RecurrentPPOConfig)
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import inv_management as im

BACKLOG = True
ENV_NAME_SHORT = "InvMgmtCombined" if BACKLOG else "InvMgmtLSCombined"
ENV_ID = "InvManagementBacklog-v0" if BACKLOG else "InvManagementLostSales-v0"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 30))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 75_000))
SEED_OFFSET = 9000
ENV_CONFIG = {"periods": 50}
FAST = os.environ.get("OGT_FAST", "0") == "1"
MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
LOG_DIR = f"./logs_{ENV_NAME_SHORT}"

# RLlib roster config variants from the reference combined script (:1142-1148)
RLLIB_ROSTER = [("PPO", {"lr": 5e-5}), ("SAC", {"gamma": 0.98}),
                ("TD3", {}), ("A2C", {}), ("DDPG", {})]

params_factory = partial(im.default_params, backlog=BACKLOG)
PPO_CFG = PPOConfig(num_envs=256, rollout_steps=50, num_minibatches=8,
                    update_epochs=4)
OFF_CFG = OffPolicyConfig(num_envs=32, buffer_size=100_000, batch_size=256,
                          start_steps=1_000)


def build_agents():
    rl = dict(model_dir=MODEL_DIR, log_dir=LOG_DIR)
    E, pf = im.ENV, params_factory
    agents = [
        ("Random", RandomAgent()),
        ("BaseStock_SF=1.0", H.BaseStockAgent(1.0)),
        ("BaseStock_SF=1.2", H.BaseStockAgent(1.2)),
        ("BaseStock_SF=0.8", H.BaseStockAgent(0.8)),
        ("SB3_PPO", PPOAgent(E, pf, name="SB3_PPO", config=PPO_CFG, **rl)),
        ("SB3_SAC", SACAgent(E, pf, name="SB3_SAC", config=OFF_CFG, **rl)),
        ("SB3_TD3", TD3Agent(E, pf, name="SB3_TD3", config=OFF_CFG, **rl)),
        ("SB3_A2C", A2CAgent(E, pf, name="SB3_A2C", config=A2CConfig(), **rl)),
        ("SB3_DDPG", DDPGAgent(E, pf, name="SB3_DDPG", config=OFF_CFG, **rl)),
        ("SB3_PPO-LSTM", RecurrentPPOAgent(
            E, pf, name="SB3_PPO-LSTM",
            config=RecurrentPPOConfig(num_envs=512, rollout_steps=50,
                                      num_minibatches=8), **rl)),
    ]
    for algo, cfg_updates in RLLIB_ROSTER:
        name = f"RLlib_{algo}"
        agents.append((name, make_agent(algo, ENV_ID,
                                        config_updates=cfg_updates,
                                        name=name, **rl)))
    return agents


if __name__ == "__main__":
    env_factory = (ad.InvManagementBacklogEnv if BACKLOG
                   else ad.InvManagementLostSalesEnv)
    run_benchmark(ENV_NAME_SHORT, build_agents(), env_factory, ENV_CONFIG,
                  N_EVAL_EPISODES, SEED_OFFSET, RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=LOG_DIR, fast=FAST, env=im.ENV,
                  params=params_factory(env_config=ENV_CONFIG))
    print("\nBenchmark script finished.")
