"""NetInvMgmt (lost-sales subclass, custom 7-node topology) benchmark.

Mirrors reference benchmark_NetInvMgmtLostSalesEnv.py (20 episodes, seeds
from 7000, 75k RL steps, num_periods=40, custom topology module — the script
imports network_management_custom). Note the evaluated subclass runs with
backlog=True due to the reference's env_config override bug (preserved in
our adapter; see envs/adapters.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import benchmark_net_inv_backlog as nb
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import net_inv_management as net

ENV_NAME_SHORT = "NetInvMgmtLS"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 20))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 75_000))
SEED_OFFSET = 7000
ENV_CONFIG = {"num_periods": 40}
FAST = os.environ.get("OGT_FAST", "0") == "1"

if __name__ == "__main__":
    nb.CUSTOM_TOPOLOGY = True
    nb.ENV_NAME_SHORT = ENV_NAME_SHORT
    nb.MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
    nb.LOG_DIR = f"./logs_{ENV_NAME_SHORT}"
    run_benchmark(ENV_NAME_SHORT,
                  nb.build_agents(ad.NetInvMgmtCustomLostSalesEnv),
                  ad.NetInvMgmtCustomLostSalesEnv, ENV_CONFIG,
                  N_EVAL_EPISODES, SEED_OFFSET, RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=nb.LOG_DIR, fast=FAST, env=net.ENV,
                  params=nb.params_factory(ENV_CONFIG))
    print("\nBenchmark script finished.")
