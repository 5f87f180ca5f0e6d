"""InvManagement (lost-sales) combined benchmark — SB3 + RLlib roster.

Mirrors reference benchmark_InvManagementLostSalesEnv_sb3_rllib.py (corrupted
in the reference checkout; intent recovered): config :88-97 (20 episodes,
seeds from 10000, 75k RL steps, periods=50), roster :405-437 (same heuristics
+ SB3 roster as the backlog combined script; RLlib PPO(lr=5e-5) and
SAC(gamma=0.98) only — the rest are commented out in the reference).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import benchmark_inv_management_backlog_combined as cb
from or_gym_inventory_tpu.bench.runner import run_benchmark
from or_gym_inventory_tpu.envs import adapters as ad

ENV_NAME_SHORT = "InvMgmtLSCombined"
N_EVAL_EPISODES = int(os.environ.get("OGT_EPISODES", 20))
RL_TRAINING_TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 75_000))
SEED_OFFSET = 10000
ENV_CONFIG = {"periods": 50}
FAST = os.environ.get("OGT_FAST", "0") == "1"

if __name__ == "__main__":
    cb.BACKLOG = False
    cb.ENV_NAME_SHORT = ENV_NAME_SHORT
    cb.ENV_ID = "InvManagementLostSales-v0"
    cb.MODEL_DIR = f"./models_{ENV_NAME_SHORT}"
    cb.LOG_DIR = f"./logs_{ENV_NAME_SHORT}"
    # RLlib roster: only PPO + SAC in the reference LS combined (:428-433)
    cb.RLLIB_ROSTER = [("PPO", {"lr": 5e-5}), ("SAC", {"gamma": 0.98})]
    from functools import partial

    from or_gym_inventory_tpu.envs import inv_management as im
    cb.params_factory = partial(im.default_params, backlog=False)
    run_benchmark(ENV_NAME_SHORT, cb.build_agents(),
                  ad.InvManagementLostSalesEnv, ENV_CONFIG,
                  N_EVAL_EPISODES, SEED_OFFSET, RL_TRAINING_TIMESTEPS,
                  results_dir=f"./benchmark_results_{ENV_NAME_SHORT}",
                  log_dir=cb.LOG_DIR, fast=FAST, env=im.ENV,
                  params=cb.params_factory(env_config=ENV_CONFIG))
    print("\nBenchmark script finished.")
