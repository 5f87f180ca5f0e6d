"""A2C hyperparameter sweep on the Newsvendor benchmark protocol.

Round-1 result: SB3-default A2C (rmsprop 7e-4, rollout 8, lambda=1.0)
converges to a degenerate order-nothing policy on Newsvendor (-31k vs PPO's
+97k). VERDICT asks for a profitable A2C roster *addition* (lambda/lr/ent
tweaks, keeping the SB3-default entry for comparability). This sweep finds
it: trains each candidate at the benchmark budget and evaluates with the
benchmark's own protocol (30 episodes, seeds 2000+, lead_time=5 eval env).

Run (TPU): python tools/a2c_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

import jax

from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.bench.evaluate import evaluate_agent
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import newsvendor as nv

TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 4_000_000))
EVAL_CONFIG = {
    "lead_time": 5, "step_limit": 50, "p_max": 100.0, "h_max": 5.0,
    "k_max": 10.0, "mu_max": 200.0,
}

CANDIDATES = {
    "default": A2CConfig(num_envs=256),
    "lam95_r50": A2CConfig(num_envs=256, rollout_steps=50, gae_lambda=0.95),
    "lam90_r8": A2CConfig(num_envs=256, gae_lambda=0.9),
    "lam95_r50_lr3e4": A2CConfig(num_envs=256, rollout_steps=50,
                                 gae_lambda=0.95, lr=3e-4),
    "lam95_r50_ent01": A2CConfig(num_envs=256, rollout_steps=50,
                                 gae_lambda=0.95, ent_coef=0.01),
    "lr1e4_r8": A2CConfig(num_envs=256, lr=1e-4),
}


def main():
    env_factory = partial(ad.NewsvendorEnv)
    for name, cfg in CANDIDATES.items():
        agent = A2CAgent(nv.ENV, partial(nv.default_params), name=f"A2C_{name}",
                         config=cfg, model_dir="/tmp/a2c_sweep",
                         log_dir="/tmp/a2c_sweep_logs")
        t0 = time.time()
        agent.train(EVAL_CONFIG, TIMESTEPS, save_path_prefix="sweep_")
        train_s = time.time() - t0
        res = evaluate_agent(agent, env_factory, 30, seed_offset=2000,
                             env_config=EVAL_CONFIG)
        s = res["summary"]  # per-episode rows (TotalReward etc.)
        print(json.dumps({
            "candidate": name,
            "avg_reward": float(s["TotalReward"].mean()),
            "median_reward": float(s["TotalReward"].median()),
            "service": float(s["AvgServiceLevel"].mean()),
            "train_s": round(train_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
