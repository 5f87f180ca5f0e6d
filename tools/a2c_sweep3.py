"""A2C sweep round 3 — optimization-pressure variants.

Rounds 1-2: lambda/lr/ent/shape/optimizer tweaks ALL converge to the same
order-nothing corner (~-30.8k eval; training curves confirm clean
convergence there, entropy healthy). The structural difference vs PPO
(which reaches +97k on the same machinery) is gradient steps per batch:
A2C takes 1 (or 50k tiny ones), PPO takes epochs*minibatches. Test
minibatched single-pass A2C (still unclipped single-epoch = A2C semantics)
and entropy/lr-anneal variants.

Run (TPU): python tools/a2c_sweep3.py
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
    # minibatched single-pass: 8 gradient steps/batch, still no clip/1 epoch
    "mb8_rmsprop": A2CConfig(num_minibatches=8, **BASE),
    "mb8_adam_lam95": A2CConfig(num_minibatches=8, optimizer="adam",
                                lr=3e-4, gae_lambda=0.95, **BASE),
    "mb8_ent01_adam": A2CConfig(num_minibatches=8, optimizer="adam",
                                lr=3e-4, gae_lambda=0.95, ent_coef=0.01,
                                **BASE),
    "ent01": A2CConfig(ent_coef=0.01, **BASE),
    "anneal": A2CConfig(anneal_lr=True, **BASE),
    "lr2e3": A2CConfig(lr=2e-3, **BASE),
}


def main():
    env_factory = partial(ad.NewsvendorEnv)
    for name, cfg in CANDIDATES.items():
        agent = A2CAgent(nv.ENV, partial(nv.default_params), name=f"A2C_{name}",
                         config=cfg, model_dir="/tmp/a2c_sweep3",
                         log_dir="/tmp/a2c_sweep3_logs")
        t0 = time.time()
        agent.train(EVAL_CONFIG, TIMESTEPS, save_path_prefix="sweep3_")
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
