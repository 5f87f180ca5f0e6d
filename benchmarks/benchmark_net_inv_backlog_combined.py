"""NetInvMgmt (backlog, default 9-node graph) combined benchmark — SB3+RLlib.

Mirrors reference benchmark_NetInvMgmtBacklogEnv_sb3_rllib.py (corrupted in
the reference checkout; intent recovered): config :78-87 (10 episodes, seeds
from 11000, 100k RL steps, num_periods=30, module network_management),
roster :388-416 (Random, ConstantOrder 5%/10%; SB3 PPO/SAC/TD3/A2C/DDPG +
PPO-LSTM; RLlib PPO(lr=1e-4), SAC(gamma=0.99)).
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
from or_gym_inventory_tpu.envs import net_inv_management as net

BACKLOG = True
ENV_NAME_SHORT = "NetInvMgmtCombined"
ENV_ID = "NetInvMgmtBacklog-v0"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 10))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 100_000))
SEED_OFFSET = 11000
ENV_CONFIG = {"num_periods": 30}
FAST = os.environ.get("OGT_FAST", "0") == "1"
MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
LOG_DIR = f"./logs_{ENV_NAME_SHORT}"

# reference :409-414 ("Different LR maybe")
RLLIB_ROSTER = [("PPO", {"lr": 1e-4}), ("SAC", {"gamma": 0.99})]

params_factory = partial(net.default_params, backlog=BACKLOG)
PPO_CFG = PPOConfig(num_envs=256, rollout_steps=30, num_minibatches=8,
                    update_epochs=4)
OFF_CFG = OffPolicyConfig(num_envs=32, buffer_size=100_000, batch_size=256,
                          start_steps=1_000)


def build_agents():
    rl = dict(model_dir=MODEL_DIR, log_dir=LOG_DIR)
    E, pf = net.ENV, params_factory
    agents = [
        ("Random", RandomAgent()),
        ("ConstantOrder_5%", H.ConstantOrderAgent(0.05)),
        ("ConstantOrder_10%", H.ConstantOrderAgent(0.10)),
        ("SB3_PPO", PPOAgent(E, pf, name="SB3_PPO", config=PPO_CFG, **rl)),
        ("SB3_SAC", SACAgent(E, pf, name="SB3_SAC", config=OFF_CFG, **rl)),
        ("SB3_TD3", TD3Agent(E, pf, name="SB3_TD3", config=OFF_CFG, **rl)),
        ("SB3_A2C", A2CAgent(E, pf, name="SB3_A2C", config=A2CConfig(), **rl)),
        ("SB3_DDPG", DDPGAgent(E, pf, name="SB3_DDPG", config=OFF_CFG, **rl)),
        ("SB3_PPO-LSTM", RecurrentPPOAgent(
            E, pf, name="SB3_PPO-LSTM",
            config=RecurrentPPOConfig(num_envs=256, rollout_steps=30,
                                      num_minibatches=8), **rl)),
    ]
    for algo, cfg_updates in RLLIB_ROSTER:
        name = f"RLlib_{algo}"
        agents.append((name, make_agent(algo, ENV_ID,
                                        config_updates=cfg_updates,
                                        name=name, **rl)))
    return agents


if __name__ == "__main__":
    run_benchmark(ENV_NAME_SHORT, build_agents(), ad.NetInvMgmtBacklogEnv,
                  ENV_CONFIG, N_EVAL_EPISODES, SEED_OFFSET,
                  RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=LOG_DIR, fast=FAST, env=net.ENV,
                  params=params_factory(env_config=ENV_CONFIG))
    print("\nBenchmark script finished.")
