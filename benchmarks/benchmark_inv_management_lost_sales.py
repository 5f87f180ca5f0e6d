"""InvManagement (lost sales) benchmark.

Mirrors reference benchmark_InvManagementLostSalesEnv.py (config :93-117:
30 episodes, seeds from 5000, 50k RL steps, periods=30, mu=20,
FORCE_RETRAIN=True). Shares the backlog script's roster.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import benchmark_inv_management_backlog as bl
from functools import partial

from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import inv_management as im

ENV_NAME_SHORT = "InvMgmtLS"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 30))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 50_000))
SEED_OFFSET = 5000
ENV_CONFIG = {"periods": 30, "dist_param": {"mu": 20}}
FAST = os.environ.get("OGT_FAST", "0") == "1"

if __name__ == "__main__":
    # rebind the shared roster to lost-sales mode + this script's dirs
    bl.BACKLOG = False
    bl.ENV_NAME_SHORT = ENV_NAME_SHORT
    bl.MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
    bl.LOG_DIR = f"./logs_{ENV_NAME_SHORT}"
    bl.params_factory = partial(im.default_params, backlog=False)
    agents = bl.build_agents()
    for _, agent in agents:  # FORCE_RETRAIN=True in the reference script
        if hasattr(agent, "force_retrain"):
            agent.force_retrain = True
    run_benchmark(ENV_NAME_SHORT, agents, ad.InvManagementLostSalesEnv,
                  ENV_CONFIG, N_EVAL_EPISODES, SEED_OFFSET,
                  RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=bl.LOG_DIR, fast=FAST, env=im.ENV,
                  params=bl.params_factory(env_config=ENV_CONFIG))
    print("\nBenchmark script finished.")
