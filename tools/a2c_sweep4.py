"""A2C sweep round 4 — push the winning direction from round 3.

Round 3: minibatched single-pass A2C (num_minibatches=8, rmsprop@7e-4)
reached -10.2k (vs -30.8k for every other variant). More gradient steps
per batch with the SB3 optimizer is the axis that moves. Combine with
anneal/entropy/lr and try deeper minibatching.

Run (TPU): python tools/a2c_sweep4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from functools import partial

from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig
from or_gym_inventory_tpu.bench.evaluate import evaluate_agent
from or_gym_inventory_tpu.envs import adapters as ad
from or_gym_inventory_tpu.envs import newsvendor as nv

TIMESTEPS = int(os.environ.get("OGT_TIMESTEPS", 4_000_000))
EVAL_CONFIG = {
    "lead_time": 5, "step_limit": 50, "p_max": 100.0, "h_max": 5.0,
    "k_max": 10.0, "mu_max": 200.0,
}
BASE = dict(num_envs=256, rollout_steps=50, updates_per_call=16)

CANDIDATES = {
    "mb16": A2CConfig(num_minibatches=16, **BASE),
    "mb32": A2CConfig(num_minibatches=32, **BASE),
    "mb8_anneal": A2CConfig(num_minibatches=8, anneal_lr=True, **BASE),
    "mb16_anneal": A2CConfig(num_minibatches=16, anneal_lr=True, **BASE),
    "mb8_ent01": A2CConfig(num_minibatches=8, ent_coef=0.01, **BASE),
    "mb8_lr2e3": A2CConfig(num_minibatches=8, lr=2e-3, **BASE),
    "mb16_lam95": A2CConfig(num_minibatches=16, gae_lambda=0.95, **BASE),
}


def main():
    env_factory = partial(ad.NewsvendorEnv)
    for name, cfg in CANDIDATES.items():
        agent = A2CAgent(nv.ENV, partial(nv.default_params), name=f"A2C_{name}",
                         config=cfg, model_dir="/tmp/a2c_sweep4",
                         log_dir="/tmp/a2c_sweep4_logs")
        t0 = time.time()
        agent.train(EVAL_CONFIG, TIMESTEPS, save_path_prefix="sweep4_")
        train_s = time.time() - t0
        res = evaluate_agent(agent, env_factory, 30, seed_offset=2000,
                             env_config=EVAL_CONFIG)
        s = res["summary"]
        print(json.dumps({
            "candidate": name,
            "avg_reward": float(s["TotalReward"].mean()),
            "median_reward": float(s["TotalReward"].median()),
            "service": float(s["AvgServiceLevel"].mean()),
            "train_s": round(train_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
