"""NetInvMgmt (lost-sales, default 9-node graph) combined benchmark.

Mirrors reference benchmark_NetInvMgmtLostSalesEnv_sb3_rllib.py — the ONLY
parseable combined script, so its structures are the canonical spec: config
:88-98 (10 episodes, seeds from 12000, 75k RL steps, num_periods=30, module
network_management — NOT the custom topology the plain LS script uses),
roster :626-660 (Random, ConstantOrder 5%/10%; SB3 PPO/SAC/TD3/A2C/DDPG +
PPO-LSTM; RLlib PPO(lr=1e-4), SAC(gamma=0.99), TD3, A2C, DDPG).

Note the evaluated subclass runs with backlog=True due to the reference's
env_config override bug (QUIRKS.md #1, network_management.py:83-85) —
preserved by our adapter; the functional params mirror it here.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import benchmark_net_inv_backlog_combined as cb
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import net_inv_management as net

ENV_NAME_SHORT = "NetInvMgmtLSCombined"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 10))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 75_000))
SEED_OFFSET = 12000
ENV_CONFIG = {"num_periods": 30}
FAST = os.environ.get("OGT_FAST", "0") == "1"

if __name__ == "__main__":
    cb.ENV_NAME_SHORT = ENV_NAME_SHORT
    cb.ENV_ID = "NetInvMgmtLostSales-v0"
    cb.MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
    cb.LOG_DIR = f"./logs_{ENV_NAME_SHORT}"
    # full RLlib roster in the canonical parseable script (:652-658)
    cb.RLLIB_ROSTER = [("PPO", {"lr": 1e-4}), ("SAC", {"gamma": 0.99}),
                       ("TD3", {}), ("A2C", {}), ("DDPG", {})]
    # NetInvMgmtLostSalesEnv actually runs backlog=True (reference override
    # bug, QUIRKS.md #1) — keep the functional params consistent with the
    # adapter the episodes are evaluated on
    run_benchmark(ENV_NAME_SHORT, cb.build_agents(),
                  ad.NetInvMgmtLostSalesEnv, ENV_CONFIG,
                  N_EVAL_EPISODES, SEED_OFFSET, RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=cb.LOG_DIR, fast=FAST, env=net.ENV,
                  params=cb.params_factory(env_config=ENV_CONFIG))
    print("\nBenchmark script finished.")
