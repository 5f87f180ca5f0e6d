"""NetInvMgmt (backlog, default 9-node graph) benchmark.

Mirrors reference benchmark_NetInvMgmtBacklogEnv.py (config :79-99:
20 episodes, seeds from 6000, 75k RL steps, num_periods=40; roster :409-428:
Random, ConstantOrder 5%/10%, SB3 roster).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from or_gym_inventory_tpu.agents import heuristics as H
from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.agents.base import RandomAgent
from or_gym_inventory_tpu.agents.off_policy import (DDPGAgent, OffPolicyConfig,
                                                    SACAgent, TD3Agent)
from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import topology as topo

ENV_NAME_SHORT = "NetInvMgmt"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 20))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 75_000))
SEED_OFFSET = 6000
ENV_CONFIG = {"num_periods": 40}
FAST = os.environ.get("OGT_FAST", "0") == "1"
MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
LOG_DIR = f"./logs_{ENV_NAME_SHORT}"

CUSTOM_TOPOLOGY = False


def params_factory(env_config=None):
    cfg = dict(env_config or {})
    periods = int(cfg.get("num_periods", 30))
    topology = (topo.custom_topology(periods) if CUSTOM_TOPOLOGY
                else topo.default_topology(periods))
    return net.default_params(env_config=cfg, topology=topology, backlog=True)


PPO_CFG = PPOConfig(num_envs=256, rollout_steps=40, num_minibatches=8,
                    update_epochs=4)
OFF_CFG = OffPolicyConfig(num_envs=32, buffer_size=100_000, batch_size=256,
                          start_steps=1_000)


def build_agents(env_factory_cls):
    rl = dict(model_dir=MODEL_DIR, log_dir=LOG_DIR)
    E, pf = net.ENV, params_factory
    return [
        ("Random", RandomAgent()),
        ("ConstantOrder_5%", H.ConstantOrderAgent(0.05)),
        ("ConstantOrder_10%", H.ConstantOrderAgent(0.10)),
        ("PPO", PPOAgent(E, pf, name="PPO", config=PPO_CFG, **rl)),
        ("SAC", SACAgent(E, pf, config=OFF_CFG, **rl)),
        ("TD3", TD3Agent(E, pf, config=OFF_CFG, **rl)),
        ("A2C", A2CAgent(E, pf, config=A2CConfig(), **rl)),
        ("DDPG", DDPGAgent(E, pf, config=OFF_CFG, **rl)),
    ]


if __name__ == "__main__":
    run_benchmark(ENV_NAME_SHORT, build_agents(ad.NetInvMgmtBacklogEnv),
                  ad.NetInvMgmtBacklogEnv, ENV_CONFIG, N_EVAL_EPISODES,
                  SEED_OFFSET, RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=LOG_DIR, fast=FAST, env=net.ENV,
                  params=params_factory(ENV_CONFIG))
    print("\nBenchmark script finished.")
